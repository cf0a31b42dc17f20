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

  /** Reliability-diagram calibration bins: a permille score [0,1000]
    * bucketed into `bins` equal-width cells, each reporting size,
    * positives, mean score, and the observed positive rate — all in
    * exact integer permille (floor division), so a calibration curve
    * hash-oracles. One hash aggregation; bins-row output.
    */
  def calibrationBins(df: DataFrame, scorePml: Column, label: Column,
                      bins: Int = 10): DataFrame = {
    // equal-width bins require the permille domain to divide evenly;
    // e.g. bins = 7 → w = 142 would silently fold the remainder into
    // the last bin, emitting irregular "equal-width" cells
    require(bins >= 1 && 1000 % bins == 0,
      s"bins must divide 1000 (got $bins)")
    val w = 1000 / bins
    df.select(scorePml.cast(LongType).as("s"),
        label.cast(LongType).as("y"))
      .groupBy(expr(s"least(s div $w, ${bins - 1})").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        expr("sum(s) div count(1)").as("mean_score_pml"),
        expr("sum(y) * 1000 div count(1)").as("pos_rate_pml"))
  }

  /** Threshold sweep of the confusion matrix: for each threshold t
    * (predict positive iff score ≥ t), TP/FP/FN/TN plus integer
    * permille precision/recall/F1 — `f1 = 2·tp·1000 div (2·tp+fp+fn)`
    * keeps the harmonic mean in one floor division. ONE scan builds
    * all thresholds (conditional aggregation over a broadcast-exploded
    * threshold list); zero-denominator cells emit NULL via nullif, the
    * convention both engines share.
    */
  def thresholdMetrics(df: DataFrame, scorePml: Column, label: Column,
                       thresholds: Seq[Int]): DataFrame = {
    val scored = df.select(scorePml.cast(LongType).as("s"),
      label.cast(LongType).as("y"))
    val th = explode(array(thresholds.map(t => lit(t.toLong)): _*))
    scored.select(col("s"), col("y"), th.as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("s") >= col("threshold"), col("y"))
          .otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("threshold"), lit(1L) - col("y"))
          .otherwise(0L)).as("fp"),
        sum(when(col("s") < col("threshold"), col("y"))
          .otherwise(0L)).as("fn"),
        sum(when(col("s") < col("threshold"), lit(1L) - col("y"))
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        expr("tp * 1000 div nullif(tp + fp, 0)").as("precision_pml"),
        expr("tp * 1000 div nullif(tp + fn, 0)").as("recall_pml"),
        expr("2 * tp * 1000 div nullif(2 * tp + fp + fn, 0)")
          .as("f1_pml"))
  }

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
