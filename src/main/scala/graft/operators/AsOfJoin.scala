package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key — the point-in-time
  * enrichment a feature/training pipeline needs (e.g. "state of the
  * account when the event happened").
  *
  * Spark has no native as-of join. The naive formulation — range join
  * then keep the max — materializes |left_key| × |right_key| pairs per
  * key before pruning, which explodes at scale. This implementation
  * uses the union trick instead: tag both sides, union, and take
  * `last_value(right cols, ignoreNulls) OVER (PARTITION BY key ORDER
  * BY time, tag)` — one shuffle on the key, one sort, O(n log n), no
  * pair blowup. Right rows sort before left rows at equal timestamps,
  * making the match inclusive (rightTime == leftTime matches).
  * Ties among right rows at the same timestamp resolve to the last by
  * `rightTieBreak` (deterministic, in that column's native ordering —
  * numeric, string, or timestamp all work).
  */
object AsOfJoin {

  /** @param left       probe side (events)
    * @param right      build side (state changes), columns disjoint
    *                   from left's except `key`
    * @param key        equi key column name on both sides
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightTieBreak right column ordering ties at equal rightTime
    * @param rightCols  right columns to attach
    * @param dropUnmatched true (default) drops left rows with no right
    *                   row at-or-before them (inner as-of, the common
    *                   feature-lookup contract); false keeps them with
    *                   null right columns (left-outer as-of)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, rightTieBreak: String,
           rightCols: Seq[String], dropUnmatched: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // _tie keeps the tie-break column's NATIVE type (a cast to long
    // would null out string/timestamp tie-breaks and silently make
    // same-timestamp ordering nondeterministic); left rows carry a
    // typed null — their relative order within a (_t, _side=1) group
    // never affects the as-of result.
    val tieType = right.schema(rightTieBreak).dataType
    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(tieType))
    val rTagged = right
      .select((key +: rightTime +: rightTieBreak +: rightCols).distinct.map(col): _*)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieBreak))
      // ONE struct per right row: the carried values are atomically
      // from the same row even if individual right columns hold nulls
      .withColumn("_rrow", struct(rightCols.map(col): _*))
      .drop(rightCols.filterNot(c => c == key): _*)

    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows first at equal _t (inclusive as-of), then by tie-break
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    (if (dropUnmatched) matched.filter(col("_asof").isNotNull) else matched)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
