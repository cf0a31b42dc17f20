package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time window aggregation operators.
  *
  * Re-expresses the reference's custom window assigners Spark-first:
  *  - tumbling per-key SUM (reference: InorderTumblingWindow/
  *    CustomTumblingWindow.java:33-77 + FraudDetectionJob.java:124-165)
  *  - sliding per-key MEAN (reference: InorderTumblingWindow/
  *    CustomSlidingWindow.java:25-127)
  *  - pane/slice-optimized sliding aggregation — the reference slices
  *    sliding windows into panes of gcd(size, slide), accumulates per
  *    pane, and combines panes per window. Here that becomes a
  *    two-level relational aggregation: pre-aggregate per tumbling
  *    pane (1x the input, full map-side partial aggregation), explode
  *    each pane to the windows that contain it, and combine the
  *    already-tiny partials. The naive plan replicates every input row
  *    size/slide times *before* the shuffle; the pane plan replicates
  *    only pane partials, which is the whole point at 100 TB.
  *  - incremental window-sum merge across firings (reference persists
  *    windowStart_accountId sums in RocksDB and re-adds; batch analog
  *    is the per-key running total over window sums)
  *  - count-or-time hybrid trigger chunks (reference: CustomTrigger
  *    .java:35-55 fires every maxCount elements or at window end;
  *    batch analog chunks each window's elements by arrival rank)
  *
  * Conventions for oracle parity: window starts are emitted as BIGINT
  * epoch seconds; double measures are summed as DECIMAL (exact and
  * summation-order independent) and only the FINAL projection casts
  * to DOUBLE (the driver stringifies decimals with their scale, so a
  * DECIMAL output column hash-mismatches the oracle's float repr on
  * any trailing-zero value); integer-cents columns are derived from
  * the DECIMAL sum *before* that cast (a double*100→bigint cast
  * truncates differently across engines).
  */
object Windows {

  val Dec: DecimalType = DecimalType(18, 2)
  val DecOut: DecimalType = DecimalType(38, 2)

  /** Epoch-aligned window start (BIGINT seconds) for a timestamp. */
  def windowStart(ts: Column, sizeSec: Long): Column =
    (floor(unix_timestamp(ts) / sizeSec) * sizeSec).cast(LongType)

  /** Keyed tumbling-window SUM + count with the exact DECIMAL sum kept
    * (column `sum_dec`) — internal building block for operators that
    * filter/re-aggregate on the sum before the final double cast.
    */
  def tumblingAggDec(events: DataFrame, key: String, tsCol: String,
                     valCol: String, sizeSec: Long): DataFrame =
    events
      .groupBy(col(key), windowStart(col(tsCol), sizeSec).as("ws"))
      .agg(
        sum(col(valCol).cast(Dec)).cast(DecOut).as("sum_dec"),
        count(lit(1)).as("cnt"))

  /** Keyed tumbling-window SUM + count; the fraud pipeline's core
    * aggregation. One shuffle on (key, window); partial aggregation
    * happens map-side before it.
    */
  def tumblingAgg(events: DataFrame, key: String, tsCol: String,
                  valCol: String, sizeSec: Long): DataFrame =
    tumblingAggDec(events, key, tsCol, valCol, sizeSec)
      .select(col(key), col("ws"),
        col("sum_dec").cast(DoubleType).as("sum_val"), col("cnt"))

  /** Keyed sliding-window aggregation via the built-in assigner.
    * Spark explodes each row into size/slide windows, then shuffles
    * on (key, window). Baseline for `paneSlidingAgg`.
    */
  def slidingAgg(events: DataFrame, key: String, tsCol: String,
                 valCol: String, sizeSec: Long, slideSec: Long): DataFrame =
    events
      .groupBy(col(key),
        window(col(tsCol), s"$sizeSec seconds", s"$slideSec seconds").as("w"))
      .agg(
        sum(col(valCol).cast(Dec)).cast(DecOut).as("sum_dec"),
        count(lit(1)).as("cnt"))
      .select(
        col(key),
        unix_timestamp(col("w.start")).as("ws"),
        col("sum_dec").cast(DoubleType).as("sum_val"), col("cnt"),
        expr("cast(sum_dec * 100 as bigint) div cnt").as("mean_cents"))

  /** Pane/slice-optimized sliding-window aggregation (same result set
    * as [[slidingAgg]]).
    *
    * Phase 1: tumbling pre-aggregation per pane of gcd(size, slide) —
    * input touched once, map-side combine applies.
    * Phase 2: explode each pane partial to the (≤ ceil(size/slide)+1)
    * windows containing it and combine partials.
    *
    * Window boundaries are slide-aligned and pane divides slide, so a
    * pane is wholly inside a window iff ws <= paneStart and
    * paneStart + pane <= ws + size — which makes pane partials
    * lossless (reference: CustomSlidingWindow.java pane slicing).
    */
  def paneSlidingAgg(events: DataFrame, key: String, tsCol: String,
                     valCol: String, sizeSec: Long, slideSec: Long): DataFrame = {
    val paneSec = gcd(sizeSec, slideSec)
    val maxJ = (sizeSec + slideSec - 1) / slideSec // ceil(size/slide)

    val panePartials = events
      .groupBy(col(key), windowStart(col(tsCol), paneSec).as("pane"))
      .agg(
        sum(col(valCol).cast(Dec)).as("psum"),
        count(lit(1)).as("pcnt"))

    // candidate ws values: slide-aligned at/below pane start, walking
    // back while the pane still fits in [ws, ws + size)
    val aligned = (floor(col("pane") / slideSec) * slideSec).cast(LongType)
    val wsCandidates = filter(
      transform(sequence(lit(0L), lit(maxJ)), j => aligned - j * slideSec),
      ws => ws + sizeSec >= col("pane") + paneSec && ws <= col("pane"))

    panePartials
      .select(col(key), explode(wsCandidates).as("ws"), col("psum"), col("pcnt"))
      .groupBy(col(key), col("ws"))
      .agg(sum(col("psum")).cast(DecOut).as("sum_dec"), sum(col("pcnt")).as("cnt"))
      .select(
        col(key), col("ws"),
        col("sum_dec").cast(DoubleType).as("sum_val"), col("cnt"),
        expr("cast(sum_dec * 100 as bigint) div cnt").as("mean_cents"))
  }

  /** STREAMING pane-sliced sliding aggregation — the reference's
    * CustomSlidingWindow pane state layout expressed natively in
    * Structured Streaming as chained time-window aggregations
    * (supported for append streams since Spark 3.4):
    *
    *   state store 1: tumbling gcd(size, slide) pane partials —
    *     each input row folds into exactly ONE pane row;
    *   state store 2: `window(window_time(pane), size, slide)`
    *     re-aggregates pane partials into sliding windows.
    *
    * Soundness: `window_time(pane)` is the pane's end−1µs instant;
    * window starts are slide-aligned and pane | slide, so the sliding
    * windows containing that instant are exactly the windows that
    * contain the whole pane (ws < paneStart+pane ⟺ ws ≤ paneStart for
    * pane-aligned ws; instant < ws+size ⟺ paneStart+pane ≤ ws+size).
    * Same result set as [[slidingAgg]]; per-element state work drops
    * from size/slide window-row updates to one pane update, pane
    * merges amortize across the pane's elements — the reference's
    * pane trick (CustomSlidingWindow.java:25-127), with watermark
    * propagation across both stateful operators handled by the
    * streaming planner. Equivalence + two-state-store plan shape are
    * spec-checked; the batch analog is [[paneSlidingAgg]] /
    * [[graft.plans.PaneSlidingAggRule]].
    */
  def streamingPaneSlidingAgg(events: DataFrame, key: String, tsCol: String,
                              valCol: String, sizeSec: Long, slideSec: Long,
                              watermarkDelay: String): DataFrame = {
    val paneSec = gcd(sizeSec, slideSec)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(key), window(col(tsCol), s"$paneSec seconds").as("pw"))
      .agg(sum(col(valCol).cast(Dec)).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy(col(key),
        window(window_time(col("pw")), s"$sizeSec seconds",
          s"$slideSec seconds").as("w"))
      .agg(sum(col("psum")).cast(DecOut).as("sum_dec"),
        sum(col("pcnt")).as("cnt"))
      .select(
        col(key),
        unix_timestamp(col("w.start")).as("ws"),
        col("sum_dec").cast(DoubleType).as("sum_val"), col("cnt"),
        expr("cast(sum_dec * 100 as bigint) div cnt").as("mean_cents"))
  }

  /** The naive counterpart of [[streamingPaneSlidingAgg]]: one
    * sliding-window groupBy, so Spark replicates every row into
    * size/slide window states. Delegates to [[slidingAgg]] so the
    * aggregate arithmetic and output columns are identical to the
    * pane variant BY CONSTRUCTION — a pane-vs-naive benchmark then
    * measures the state layout alone.
    */
  def streamingNaiveSlidingAgg(events: DataFrame, key: String, tsCol: String,
                               valCol: String, sizeSec: Long, slideSec: Long,
                               watermarkDelay: String): DataFrame =
    slidingAgg(events.withWatermark(tsCol, watermarkDelay),
      key, tsCol, valCol, sizeSec, slideSec)

  /** Gap-based session windows per key (generalizes the reference's
    * 5 s event-time timer buffer, FraudDetector.java:94-119).
    */
  def sessionAgg(events: DataFrame, key: String, tsCol: String,
                 valCol: String, gapSec: Long): DataFrame =
    events
      .groupBy(col(key), session_window(col(tsCol), s"$gapSec seconds").as("w"))
      .agg(
        sum(col(valCol).cast(Dec)).cast(DecOut).as("sum_dec"),
        count(lit(1)).as("cnt"))
      .select(
        col(key),
        unix_timestamp(col("w.start")).as("sess_start"),
        col("sum_dec").cast(DoubleType).as("sum_val"), col("cnt"))

  /** Per-key running total across tumbling windows, ordered by window
    * start — the batch analog of the reference merging each fired
    * window sum with the prior sum persisted under
    * `windowStart_accountId` in RocksDB (FraudDetectionJob.java:128-160).
    */
  def cumulativeWindowSum(events: DataFrame, key: String, tsCol: String,
                          valCol: String, sizeSec: Long): DataFrame = {
    val perWindow = tumblingAggDec(events, key, tsCol, valCol, sizeSec)
    val w = Window.partitionBy(col(key)).orderBy(col("ws"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // running total accumulates in DECIMAL (association-order exact);
    // both measures cast to DOUBLE only in the final projection
    perWindow.select(
      col(key), col("ws"),
      col("sum_dec").cast(DoubleType).as("sum_val"),
      sum(col("sum_dec")).over(w).cast(DecOut).cast(DoubleType).as("running_sum"))
  }

  /** Count-or-time hybrid trigger, batch analog: within each (key,
    * tumbling window), elements ordered by (ts, tieBreak) are emitted
    * as partial aggregates every `maxCount` elements, with a final
    * (possibly short) chunk at window end — the firing pattern of the
    * reference's CustomTrigger(maxCount) which keeps incremental
    * sum/count in ValueState and FIRE_AND_PURGEs every maxCount or at
    * window close (CustomTrigger.java:35-55).
    */
  def triggerChunks(events: DataFrame, key: String, tsCol: String,
                    tieBreak: String, valCol: String,
                    sizeSec: Long, maxCount: Int): DataFrame = {
    val ws = windowStart(col(tsCol), sizeSec).as("ws")
    val rankW = Window.partitionBy(col(key), col("ws"))
      .orderBy(col(tsCol), col(tieBreak))
    events
      .select(col(key), ws, col(tsCol), col(tieBreak), col(valCol))
      .withColumn("chunk",
        floor((row_number().over(rankW) - 1) / maxCount).cast(LongType))
      .groupBy(col(key), col("ws"), col("chunk"))
      .agg(
        sum(col(valCol).cast(Dec)).cast(DecOut).as("sum_dec"),
        count(lit(1)).as("cnt"))
      .select(
        col(key), col("ws"), col("chunk"),
        col("sum_dec").cast(DoubleType).as("sum_val"), col("cnt"),
        expr("cast(sum_dec * 100 as bigint) div cnt").as("mean_cents"))
  }

  @annotation.tailrec
  def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}
