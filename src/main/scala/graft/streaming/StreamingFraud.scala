package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the reference's streaming
  * fraud jobs ({Inorder,OutofOrder}{Tumbling,Sliding} FraudDetectionJob).
  *
  * Mapping (SURVEY.md §4):
  *  - ascending / bounded-out-of-orderness watermarks →
  *    `withWatermark(ts, 0s / 5s)`; late rows beyond the watermark are
  *    dropped by Spark exactly like Flink discards late elements.
  *  - custom tumbling/sliding window assigner + event-time trigger →
  *    `groupBy(window(...))` in append mode (emits when the watermark
  *    passes window end — the FIRE_AND_PURGE of
  *    CustomTumblingTrigger.java:33-89).
  *  - ValueState/ListState + event-time timers (FraudDetector.java) →
  *    `flatMapGroupsWithState` with `EventTimeTimeout` GroupState.
  *  - RocksDB state backend → RocksDBStateStoreProvider (see
  *    [[GraftStreams]]).
  */
object StreamingFraud {

  /** Tumbling per-account sums with threshold alerts — the
    * FraudDetectionJob pipeline (window sum → FraudDetector2
    * threshold). Append mode: a window emits once, when the watermark
    * passes its end.
    */
  def tumblingAlerts(tx: DataFrame, sizeSec: Long, threshold: Double,
                     watermarkDelay: String = "5 seconds"): DataFrame =
    tx.withWatermark("ts", watermarkDelay)
      .groupBy(col("accountId"), window(col("ts"), s"$sizeSec seconds").as("w"))
      .agg(sum(col("amount")).as("total"), count(lit(1)).as("cnt"))
      .filter(col("total") > threshold)
      .select(col("accountId"),
        unix_millis(col("w.start")).as("windowStartMs"),
        col("total"), col("cnt"))

  /** Sliding per-account mean (CustomSlidingWindow semantics): Spark's
    * sliding `window` already evaluates via per-slide panes in the
    * state store, the slicing the reference implements by hand.
    */
  def slidingMeans(tx: DataFrame, sizeSec: Long, slideSec: Long,
                   watermarkDelay: String = "5 seconds"): DataFrame =
    tx.withWatermark("ts", watermarkDelay)
      .groupBy(col("accountId"),
        window(col("ts"), s"$sizeSec seconds", s"$slideSec seconds").as("w"))
      .agg(avg(col("amount")).as("mean_amount"), count(lit(1)).as("cnt"))
      .select(col("accountId"), unix_millis(col("w.start")).as("windowStartMs"),
        col("mean_amount"), col("cnt"))

  /** Buffered records per account between timer firings — mirrors the
    * reference FraudDetector's ListState buffer + sum ValueState.
    */
  case class DetectorState(firstTsMs: Long, sum: Double, cnt: Long)

  /** Event-time timer fraud detector — the reference FraudDetector
    * (FraudDetector.java:69-119): buffer transactions per account,
    * register an event-time timer `windowSec` after the first buffered
    * element, and when the watermark passes it, alert if the buffered
    * sum exceeds the threshold, then clear all state (the reference
    * clears buffer + sum on every firing).
    */
  def timerDetector(tx: Dataset[Transaction], windowSec: Long,
                    threshold: Double,
                    watermarkDelay: String = "5 seconds"): Dataset[Alert] = {
    implicit val alertEnc: Encoder[Alert] = Encoders.product[Alert]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[DetectorState] = Encoders.product[DetectorState]

    tx.withWatermark("ts", watermarkDelay)
      .groupByKey(_.accountId)
      .flatMapGroupsWithState[DetectorState, Alert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (accountId: Long, events: Iterator[Transaction],
         state: GroupState[DetectorState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.sum > threshold)
              Iterator(Alert(accountId, st.firstTsMs, st.sum, st.cnt))
            else Iterator.empty
          } else {
            // Spark fires a key's timeout only in batches where that key
            // receives NO data (FlatMapGroupsWithStateExec processes new
            // data first, then timeouts for the remaining keys). So a key
            // whose window expired but that keeps receiving data must
            // flush the expired window HERE — otherwise the
            // setTimeoutTimestamp below would be <= the watermark and
            // throw, killing the query.
            val wm = state.getCurrentWatermarkMs()
            val pending = state.getOption
            val expired =
              pending.filter(st => st.firstTsMs + windowSec * 1000 <= wm)
            val flushed = expired match {
              case Some(st) if st.sum > threshold =>
                Iterator.single(Alert(accountId, st.firstTsMs, st.sum, st.cnt))
              case _ => Iterator.empty
            }
            var st =
              if (expired.isDefined) DetectorState(Long.MaxValue, 0d, 0L)
              else pending.getOrElse(DetectorState(Long.MaxValue, 0d, 0L))
            events.foreach { t =>
              val tms = t.ts.getTime
              st = DetectorState(math.min(st.firstTsMs, tms), st.sum + t.amount,
                st.cnt + 1)
            }
            state.update(st)
            // earliest pending timer wins, as in Flink's timer service.
            // New rows are never late (ts >= watermark) so the timer is
            // normally > wm already; the clamp is belt-and-braces.
            state.setTimeoutTimestamp(
              math.max(st.firstTsMs + windowSec * 1000, wm + 1))
            flushed
          }
      }
  }

  /** One buffered transaction (the reference ListState's Tuple2). */
  case class BufferedTx(tsMs: Long, amount: Double)

  /** Per-element timer emulation state: every element's pending fire
    * time plus the record buffer (reference FraudDetector.java keeps
    * ListState<Tuple2> + per-element registered timers).
    */
  case class PerElementState(pending: Seq[Long], buffer: Seq[BufferedTx])

  /** Faithful per-element-timer fraud detector. The reference
    * (FraudDetector.java:83) registers an event-time timer at EVERY
    * element's `ts + windowSec`; `onTimer(t)` sums buffered records in
    * `[t - windowSec, t)`, alerts over threshold, and clears the
    * buffer — but the OTHER registered timers stay armed, so a pending
    * timer from an old element can later fire over records buffered
    * after the clear. [[timerDetector]]'s single earliest-timer state
    * diverges there (it would re-anchor on the next element); this
    * variant keeps the full pending-timer list in state, arms Spark's
    * single GroupState timeout at the earliest pending fire time, and
    * drains every expired timer in event-time order on each firing or
    * data batch (expired timers after the first see the cleared
    * buffer, exactly like Flink's timer service draining a watermark
    * jump).
    */
  def perElementTimerDetector(tx: Dataset[Transaction], windowSec: Long,
                              threshold: Double,
                              watermarkDelay: String = "5 seconds"): Dataset[Alert] = {
    implicit val alertEnc: Encoder[Alert] = Encoders.product[Alert]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[PerElementState] = Encoders.product[PerElementState]
    val windowMs = windowSec * 1000

    // drain timers <= wm in event-time order: each scans the buffer
    // for [t-window, t) then clears it (reference onTimer), later
    // expired timers therefore see an empty buffer
    def drain(accountId: Long, wm: Long,
              st: PerElementState): (List[Alert], PerElementState) = {
      val (expired, remaining) = st.pending.sorted.partition(_ <= wm)
      var buffer = st.buffer
      val alerts = expired.flatMap { t =>
        val inWin = buffer.filter(r => r.tsMs >= t - windowMs && r.tsMs < t)
        val sum = inWin.map(_.amount).sum
        buffer = Nil // reference clears the whole buffer on every firing
        if (sum > threshold)
          Some(Alert(accountId, t - windowMs, sum, inWin.size.toLong))
        else None
      }.toList
      (alerts, PerElementState(remaining, buffer))
    }

    tx.withWatermark("ts", watermarkDelay)
      .groupByKey(_.accountId)
      .flatMapGroupsWithState[PerElementState, Alert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (accountId: Long, events: Iterator[Transaction],
         state: GroupState[PerElementState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(PerElementState(Nil, Nil))
          val (alerts, drained) = drain(accountId, wm, st0)
          // fold new elements BATCHED (the tws processor's discipline
          // brought back to the emulation): the r12 shape re-built
          // both state Seqs with `:+` and a linear `contains` PER
          // ELEMENT — O(n²) copying inside every (key, batch), which
          // is what held the emulated path at 234k rows/s. One
          // buffer concat and one distinct over (old ++ new) timers
          // preserve arrival order and the dedup semantics exactly.
          val newBuf = scala.collection.mutable.ArrayBuffer.empty[BufferedTx]
          val newTimers = scala.collection.mutable.ArrayBuffer.empty[Long]
          events.foreach { t =>
            val tms = t.ts.getTime
            newTimers += tms + windowMs
            newBuf += BufferedTx(tms, t.amount)
          }
          val st = PerElementState(
            (drained.pending ++ newTimers).distinct,
            drained.buffer ++ newBuf)
          if (st.pending.isEmpty) state.remove()
          else {
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.pending.min, wm + 1))
          }
          alerts.iterator
      }
  }

  /** Per-account running totals across the whole stream — the
    * reference's RocksDB merge of successive window sums under the
    * same account key (FraudDetectionJob.java:128-160) as a
    * mapGroupsWithState accumulator: state survives across
    * micro-batches, each batch folds its transactions into the total.
    */
  def runningTotals(tx: Dataset[Transaction]): Dataset[(Long, Double, Long)] = {
    implicit val outEnc: Encoder[(Long, Double, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    tx.groupByKey(_.accountId)
      .mapGroupsWithState[(Double, Long), (Long, Double, Long)](
        GroupStateTimeout.NoTimeout) {
        (accountId: Long, events: Iterator[Transaction],
         state: GroupState[(Double, Long)]) =>
          var (sum, cnt) = state.getOption.getOrElse((0d, 0L))
          events.foreach { t => sum += t.amount; cnt += 1 }
          state.update((sum, cnt))
          (accountId, sum, cnt)
      }
  }

  /** Welford accumulator: count, running mean, running Σ(x−mean)². */
  case class ZScoreState(n: Long, mean: Double, m2: Double)

  /** An adaptive anomaly: the amount sat `zMilli`/1000 sample
    * standard deviations from the account's own running mean.
    */
  case class AnomalyAlert(accountId: Long, tsMs: Long, amount: Double,
                          zMilli: Long)

  /** Adaptive per-account anomaly detector — the data-driven upgrade
    * of the reference's fixed `sum > 10000` rule (FraudDetector2.java:
    * 22-30): each account keeps its own online mean/variance (Welford's
    * algorithm — numerically stable, O(1) state per key) and a
    * transaction alerts when it deviates more than `zThreshold` sample
    * standard deviations from that account's OWN history. A fixed
    * threshold misses a compromised low-spend account and spams a
    * legitimately high-spend one; the per-key distribution does not.
    *
    * State is three doubles per account (bounded, RocksDB-friendly at
    * any key cardinality). Batch events fold in (event-time, amount)
    * order so replays are deterministic; each event is scored against
    * the history BEFORE it (an anomaly does not mask itself), after a
    * `minSamples` warm-up. The z-score is emitted in integer milli
    * units for engine-portable downstream handling.
    */
  def zScoreDetector(tx: Dataset[Transaction], zThreshold: Double = 3.0,
                     minSamples: Long = 10): Dataset[AnomalyAlert] = {
    implicit val outEnc: Encoder[AnomalyAlert] = Encoders.product[AnomalyAlert]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[ZScoreState] = Encoders.product[ZScoreState]

    tx.groupByKey(_.accountId)
      .flatMapGroupsWithState[ZScoreState, AnomalyAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (accountId: Long, events: Iterator[Transaction],
         state: GroupState[ZScoreState]) =>
          var st = state.getOption.getOrElse(ZScoreState(0L, 0d, 0d))
          val out = List.newBuilder[AnomalyAlert]
          events.toSeq.sortBy(t => (t.ts.getTime, t.amount)).foreach { t =>
            if (st.n >= minSamples) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0 && math.abs(t.amount - st.mean) > zThreshold * sd)
                out += AnomalyAlert(accountId, t.ts.getTime, t.amount,
                  math.round(1000d * (t.amount - st.mean) / sd))
            }
            val n1 = st.n + 1
            val d = t.amount - st.mean
            val mean1 = st.mean + d / n1
            st = ZScoreState(n1, mean1, st.m2 + d * (t.amount - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Incremental per-key (count, sum) partials for the hybrid trigger. */
  case class TriggerState(cnt: Long, sum: Double)

  /** Partial aggregate emitted on each early firing. */
  case class Partial(accountId: Long, cnt: Long, mean: Double, finalFire: Boolean)

  /** Count-or-time hybrid trigger — the reference CustomTrigger
    * (CustomTrigger.java:35-55): incremental sum/count in keyed state,
    * FIRE_AND_PURGE every `maxCount` elements, and a final firing on
    * the event-time timeout (window end analog).
    */
  def hybridTrigger(tx: Dataset[Transaction], maxCount: Int,
                    timeoutSec: Long,
                    watermarkDelay: String = "5 seconds"): Dataset[Partial] = {
    implicit val pEnc: Encoder[Partial] = Encoders.product[Partial]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[TriggerState] = Encoders.product[TriggerState]

    tx.withWatermark("ts", watermarkDelay)
      .groupByKey(_.accountId)
      .flatMapGroupsWithState[TriggerState, Partial](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (accountId: Long, events: Iterator[Transaction],
         state: GroupState[TriggerState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.cnt > 0)
              Iterator(Partial(accountId, st.cnt, st.sum / st.cnt, finalFire = true))
            else Iterator.empty
          } else {
            var st = state.getOption.getOrElse(TriggerState(0L, 0d))
            var maxTs = 0L
            val fired = Seq.newBuilder[Partial]
            events.foreach { t =>
              st = TriggerState(st.cnt + 1, st.sum + t.amount)
              maxTs = math.max(maxTs, t.ts.getTime)
              if (st.cnt >= maxCount) { // FIRE_AND_PURGE
                fired += Partial(accountId, st.cnt, st.sum / st.cnt, finalFire = false)
                st = TriggerState(0L, 0d)
              }
            }
            state.update(st)
            // safe for the same reason as in timerDetector: maxTs is
            // from this batch's (non-late) rows, so it is >= watermark
            state.setTimeoutTimestamp(maxTs + timeoutSec * 1000)
            fired.result().iterator
          }
      }
  }

  /** [[perElementTimerDetector]] on Spark 4's `transformWithState`.
    * `StatefulProcessor` is the 1:1 structural analog of the
    * reference's KeyedProcessFunction (FraudDetector.java): named
    * state primitives through the handle (the ListState buffer maps
    * to `getListState`) and a real per-key timer service with one
    * `handleExpiredTimer` callback, Flink's `onTimer`. The reference
    * registers a timer at EVERY element (reference :83); this
    * processor keeps that per-element expiry set in a ValueState and
    * arms the native service with only the MINIMUM — on firing it
    * drains every pending expiry the eviction watermark passed, in
    * event-time order, which is result-identical to per-expiry native
    * registration (the runtime fires exactly the expiries <= eviction
    * watermark, in order) while cutting timer-CF RocksDB writes from
    * O(elements) to O(1) per (key, batch). Requires the RocksDB
    * state store provider, matching the reference's RocksDB backend.
    */
  /** The full pending-expiry set of one key, carried in a single
    * ValueState blob (sorted ascending, distinct). Bounded: only
    * expiries in `(watermark, max buffered ts + windowSec]` survive a
    * drain, so the array tracks the key's in-flight horizon, not its
    * history.
    */
  case class PendingExpiries(exp: Array[Long])

  class PerElementTimerProcessor(windowSec: Long, threshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Transaction, Alert] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
      TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var buf: ListState[BufferedTx] = _
    @transient private var pending: ValueState[PendingExpiries] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[BufferedTx]("buffer",
        Encoders.product[BufferedTx], TTLConfig.NONE)
      pending = getHandle.getValueState[PendingExpiries]("pending",
        Encoders.product[PendingExpiries], TTLConfig.NONE)
    }

    private def pendingExp: Array[Long] =
      Option(pending.get()).map(_.exp).getOrElse(Array.empty[Long])

    override def handleInputRows(key: Long, rows: Iterator[Transaction],
                                 tv: TimerValues): Iterator[Alert] = {
      // one appendList + one pending-set write + ONE registerTimer per
      // (key, micro-batch): the full expiry set lives in our own
      // ValueState and only the MINIMUM is armed with the native timer
      // service. The r11 version registered one native timer per
      // DISTINCT expiry — at ms-grained event time that is O(rows)
      // timer-CF RocksDB writes per batch, and it capped the shape at
      // ~300k rows/s; coalescing to the min is the O(rows) -> O(1)
      // step. Result-equivalence to per-expiry registration: timers
      // fire when the eviction watermark passes them, and
      // handleExpiredTimer below drains EVERY pending expiry <= that
      // watermark in event-time order — exactly the set and order the
      // native service would have fired this batch (asserted by the
      // equivalence specs, including the randomized feed).
      val batch = rows.map(t => BufferedTx(t.ts.getTime, t.amount)).toArray
      if (batch.nonEmpty) {
        buf.appendList(batch)
        val w = windowSec * 1000
        val merged = (pendingExp ++ batch.map(_.tsMs + w)).distinct.sorted
        pending.update(PendingExpiries(merged))
        // re-arming an already-registered expiry overwrites the same
        // (key, ts) timer-CF entry — harmless; a new batch can arm an
        // EARLIER min than the currently-armed one (a non-late row
        // with ts below pending.head - windowSec), leaving the old
        // min armed as a stale timer whose firing drains as a no-op.
        getHandle.registerTimer(merged.head)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Alert] = {
      // drain EVERY pending expiry the eviction watermark passed, in
      // event-time order — the same per-firing semantics as the
      // reference onTimer (sum records in [t-window, t), alert over
      // threshold, clear the WHOLE buffer), so firings after the
      // first see an empty buffer exactly like a native per-expiry
      // drain of a watermark jump. tv.getCurrentWatermarkInMs() is
      // the eviction watermark that expired this timer; max with the
      // expiry itself is belt-and-braces.
      val wm = math.max(tv.getCurrentWatermarkInMs(), info.getExpiryTimeInMs())
      val p = pendingExp
      if (p.isEmpty || p.head > wm) Iterator.empty // stale/superseded min
      else {
        val (expired, remaining) = p.partition(_ <= wm)
        var records = buf.get().toSeq // ONE list read for the whole drain
        val alerts = List.newBuilder[Alert]
        expired.foreach { t => // already ascending (p is sorted)
          val inWin = records.filter(r =>
            r.tsMs >= t - windowSec * 1000 && r.tsMs < t)
          val sum = inWin.map(_.amount).sum
          records = Nil // reference onTimer clears the whole buffer
          if (sum > threshold)
            alerts += Alert(key, t - windowSec * 1000, sum,
              inWin.size.toLong)
        }
        buf.clear() // one store op for the N firings' clears
        if (remaining.nonEmpty) {
          pending.update(PendingExpiries(remaining))
          getHandle.registerTimer(remaining.head)
        } else pending.clear()
        alerts.result().iterator
      }
    }
  }

  /** The per-element-timer detector through `transformWithState` —
    * result-equivalent to [[perElementTimerDetector]] (asserted by
    * spec), with the timer service native instead of emulated.
    */
  def timerDetectorTws(tx: Dataset[Transaction], windowSec: Long,
                       threshold: Double,
                       watermarkDelay: String = "5 seconds"): Dataset[Alert] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val alertEnc: Encoder[Alert] = Encoders.product[Alert]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    tx.withWatermark("ts", watermarkDelay)
      .groupByKey(_.accountId)
      .transformWithState(new PerElementTimerProcessor(windowSec, threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
