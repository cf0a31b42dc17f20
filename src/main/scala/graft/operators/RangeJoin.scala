package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval-containment) join without an equi-key.
  *
  * Spark has no native range-join optimization: a plain
  * `points.join(intervals, pt between lo and hi)` plans as a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) compares — and a
  * cartesian at scale. The standard scale-out shape is BINNING: bucket
  * the point into `floor(pt / binWidth)`, explode each interval into
  * every bin it overlaps, equi-join on the bin, then apply the exact
  * containment predicate. The equi-join shuffles on well-distributed
  * bin keys, so cost is O(points + Σ interval spans + matches), and
  * Catalyst is free to broadcast whichever side is small.
  *
  * Exactness: a point lies in exactly ONE bin, and an interval is
  * exploded into each overlapped bin ONCE, so every (point, interval)
  * candidate pair meets exactly once — no dedup pass needed.
  *
  * `binWidth` tuning: ≈ the typical interval length. Too small
  * explodes long intervals into many bins; too large packs many
  * points per bin (more false candidates for the filter). Both stay
  * correct — only the candidate count changes.
  */
object RangeJoin {

  /** Join each row of `points` to every `intervals` row whose
    * `[loCol, hiCol]` (inclusive both ends) contains `ptCol`. Column
    * names must not collide between the two inputs. All three bound
    * columns must be integral (epoch seconds, cents, …) and
    * non-negative: bins come from exact integer `div`, never float
    * division.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pts = points.withColumn("_bin",
      expr(s"$ptCol div ${binWidth}L").cast(LongType))
    val ivs = intervals.withColumn("_bin",
      explode(sequence(expr(s"$loCol div ${binWidth}L").cast(LongType),
        expr(s"$hiCol div ${binWidth}L").cast(LongType))))
    pts.join(ivs, Seq("_bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval×interval OVERLAP join — the two-sided generalization of
    * [[pointInInterval]]: every `left` row `[loA, hiA]` joined to
    * every `right` row `[loB, hiB]` they overlap (inclusive bounds:
    * `loA ≤ hiB AND loB ≤ hiA`). Spark OSS plans the naive form as a
    * nested loop; here BOTH sides explode into the bins they span and
    * meet in an equi-join on the bin key.
    *
    * Exactly-once without a dedup shuffle: an overlapping pair shares
    * every bin the overlap region spans, so the join would emit it
    * once per shared bin — instead the pair is kept ONLY in the bin
    * of `greatest(loA, loB)` (the overlap's start, guaranteed to be a
    * shared bin). That one filter replaces the candidate-pair
    * `distinct()` a dedup formulation would shuffle.
    *
    * Bounds must be integral and non-negative (bins come from exact
    * integer `div`); column names must not collide across the inputs.
    * `binWidth` tuning as in [[pointInInterval]] — candidates scale
    * with Σ span/binWidth per side times per-bin density.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loA: String, hiA: String,
                      loB: String, hiB: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left.withColumn("_bin",
      explode(sequence(expr(s"$loA div ${binWidth}L").cast(LongType),
        expr(s"$hiA div ${binWidth}L").cast(LongType))))
    val r = right.withColumn("_bin",
      explode(sequence(expr(s"$loB div ${binWidth}L").cast(LongType),
        expr(s"$hiB div ${binWidth}L").cast(LongType))))
    l.join(r, Seq("_bin"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("_bin") ===
        expr(s"greatest($loA, $loB) div ${binWidth}L"))
      .drop("_bin")
  }
}
