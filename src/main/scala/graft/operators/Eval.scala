package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact evaluation metrics in integer arithmetic.
  *
  * ROC-AUC is the Mann-Whitney U statistic: AUC = (R₁ − n₁(n₁+1)/2)
  * / (n₁n₀) with R₁ the positive items' rank sum under ascending
  * score, average ranks at ties. The 2×average-rank trick keeps it
  * integral: a tie group spanning ranks [a..b] has doubled average
  * rank a+b = 2·cnt_lt + cnt_eq + 1, so S = 2R₁, U = (S − n₁(n₁+1))/2
  * and AUC in micro units is one positive-operand floor division —
  * BIGINT end to end, hash-oracle-able where a float AUC is not.
  *
  * Scale shape: one hash aggregation to distinct scores, ONE window
  * over the score dictionary (bounded cardinality — integer scores
  * like char counts or milli-quality, never per-document rows), one
  * scalar fold. No document-count sort anywhere.
  */
object Eval {

  /** 1-row frame (n1, n0, auc_micro): AUC·10⁶ of `score` predicting
    * `label` (0/1), floor-rounded. Requires both classes present.
    */
  def aucMicro(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.as("score"), label.cast("long").as("label"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_lt", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(
        sum(col("pos") * (col("cum_lt") * 2 + col("cnt") + 1)).as("s2"),
        sum(col("pos")).as("n1"),
        sum(col("cnt") - col("pos")).as("n0"))
      .select(col("n1"), col("n0"),
        expr("(s2 - n1 * (n1 + 1)) * 1000000 div (2 * n1 * n0)")
          .as("auc_micro"))
  }
}
