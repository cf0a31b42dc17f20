package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact evaluation metrics in integer arithmetic.
  *
  * ROC-AUC is the Mann-Whitney U statistic: AUC = (R₁ − n₁(n₁+1)/2)
  * / (n₁n₀) with R₁ the positive items' rank sum under ascending
  * score, average ranks at ties. The 2×average-rank trick keeps it
  * integral: a tie group spanning ranks [a..b] has doubled average
  * rank a+b = 2·cnt_lt + cnt_eq + 1, so S = 2R₁, U = (S − n₁(n₁+1))/2
  * and AUC in micro units is one positive-operand floor division —
  * exact end to end, hash-oracle-able where a float AUC is not.
  *
  * Scale shape: one hash aggregation to distinct scores, then the
  * below-rank counts via [[PrefixSums.exclusiveOffsets]] — a
  * partitioned two-level prefix, NOT a global single-partition window,
  * so an arbitrary (unbounded) score domain distributes; scores must
  * be numeric (integral preferred — the rank sums are exact). No
  * document-count sort anywhere. The S = 2R₁ accumulator is
  * DECIMAL(38,0): in BIGINT it grows as ~2·n₁·n and would wrap past
  * ~3·10⁹ rows (the q_moments/q_gini envelope pattern); the final
  * division is positive-operand `div` on DECIMAL, emitting BIGINT
  * micro units.
  */
object Eval {

  /** 1-row frame (n1, n0, auc_micro): AUC·10⁶ of `score` predicting
    * `label` (0/1), floor-rounded. Requires both classes present.
    */
  def aucMicro(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.as("score"), label.cast("long").as("label"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"))
    val cumLt = PrefixSums.exclusiveOffsets(
      g.select(col("score"), col("cnt")), "score", "cnt", "cum_lt")
    g.join(cumLt, "score")
      .agg(
        sum(col("pos").cast(DecimalType(38, 0)) *
          (col("cum_lt") * 2 + col("cnt") + 1)).as("s2"),
        sum(col("pos")).as("n1"),
        sum(col("cnt") - col("pos")).as("n0"))
      .select(col("n1"), col("n0"),
        expr("""(s2 - cast(n1 as decimal(38,0)) * (n1 + 1)) * 1000000
               | div (2 * cast(n1 as decimal(38,0)) * n0)"""
          .stripMargin.replace("\n", " "))
          .cast(LongType).as("auc_micro"))
  }
}
