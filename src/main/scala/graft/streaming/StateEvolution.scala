package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming state-schema EVOLUTION — the upgrade contract the
  * reference inherits from Flink savepoints (stop job v1, restart
  * job v2 against the same state). Spark's counterpart: a
  * `transformWithState` query whose state is Avro-encoded
  * (`spark.sql.streaming.stateStore.encodingFormat=avro`, RocksDB
  * provider) may restart from an existing checkpoint with an EVOLVED
  * state case class — appended nullable fields decode as null/None
  * for keys written by the old version, and the query resumes with
  * offsets, sink progress, and per-key state intact.
  *
  * The contract (spec-gated in StreamingSpec):
  *   - v1 writes `AcctAggV1(count)`; v2 reads the same "agg" state as
  *     `AcctAggV2(count, totalAmount: Option[Double])` — the added
  *     field MUST be nullable (Option) and appended, never inserted
  *     or renamed; removals and type changes are NOT supported.
  *   - Avro must be the encoding from the FIRST run; the default
  *     UnsafeRow encoding is positional and fails the state schema
  *     check on any change.
  *   - The state VARIABLE name ("agg") is the identity that persists
  *     across versions, exactly like Flink's state descriptor name
  *     (reference FraudDetector.java keeps its ValueStateDescriptor
  *     name fixed across job upgrades for the same reason).
  *
  * Both processors emit the same output row (accountId, count), so
  * only the state schema — not the sink schema — evolves across the
  * restart; evolving the SINK schema is a separate concern handled
  * by mergeSchema sinks (WarehouseSpec B59).
  */
object StateEvolution {

  /** v1 state: a bare running count per account. */
  case class AcctAggV1(count: Long)

  /** v2 state: count plus a field added in an upgrade. Option-typed
    * so v1-written rows decode as None under Avro evolution.
    */
  case class AcctAggV2(count: Long, totalAmount: Option[Double])

  /** Both versions emit the same row; the evolution is state-only. */
  case class AcctCount(accountId: Long, count: Long)

  class CountProcessorV1
    extends StatefulProcessor[Long, Transaction, AcctCount] {
    @transient private var st: ValueState[AcctAggV1] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AcctAggV1]("agg",
        Encoders.product[AcctAggV1], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Transaction],
                                 tv: TimerValues): Iterator[AcctCount] = {
      val prev = if (st.exists()) st.get() else AcctAggV1(0L)
      val n = prev.count + rows.size
      st.update(AcctAggV1(n))
      Iterator.single(AcctCount(key, n))
    }
  }

  class CountProcessorV2
    extends StatefulProcessor[Long, Transaction, AcctCount] {
    @transient private var st: ValueState[AcctAggV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AcctAggV2]("agg",
        Encoders.product[AcctAggV2], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Transaction],
                                 tv: TimerValues): Iterator[AcctCount] = {
      val prev = if (st.exists()) st.get() else AcctAggV2(0L, None)
      val txs = rows.toSeq
      val n = prev.count + txs.size
      // v1-written state decodes with totalAmount = None: the new
      // field starts accumulating from the upgrade batch onward
      val total = prev.totalAmount.getOrElse(0.0) + txs.map(_.amount).sum
      st.update(AcctAggV2(n, Some(total)))
      Iterator.single(AcctCount(key, n))
    }
  }

  def countsV1(tx: Dataset[Transaction]): Dataset[AcctCount] =
    run(tx, new CountProcessorV1)

  def countsV2(tx: Dataset[Transaction]): Dataset[AcctCount] =
    run(tx, new CountProcessorV2)

  private def run(tx: Dataset[Transaction],
                  p: StatefulProcessor[Long, Transaction, AcctCount])
      : Dataset[AcctCount] = {
    implicit val outEnc: Encoder[AcctCount] = Encoders.product[AcctCount]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    tx.groupByKey(_.accountId)
      .transformWithState(p, TimeMode.None(), OutputMode.Update())
  }
}
