package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key top-k: a bounded leaderboard maintained in keyed
  * state across micro-batches — the streaming analog of
  * `functions.TopKAgg`, with the same bounded-merge discipline: state
  * never exceeds k entries per key, so the RocksDB footprint is
  * O(k · keys) regardless of stream length (the reference's RocksDB
  * window accumulators grow per window; a leaderboard is the case
  * where bounding the state is the whole point).
  *
  * Update mode: each micro-batch re-emits the full current top-k of
  * every key that received data, as (accountId, rank, amount, tsMs)
  * rows. Ordering is deterministic: amount desc, then earlier ts,
  * so replays and retries emit identical leaderboards.
  */
object StreamingTopK {

  case class TopRow(accountId: Long, rank: Int, amount: Double, tsMs: Long)

  private def top(k: Int, buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (amt, ts) => (-amt, ts) }.take(k)

  def topKAmounts(tx: Dataset[Transaction], k: Int): Dataset[TopRow] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    implicit val outEnc: Encoder[TopRow] = Encoders.product[TopRow]

    tx.groupByKey(_.accountId)
      .flatMapGroupsWithState[Seq[(Double, Long)], TopRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (accountId: Long, events: Iterator[Transaction],
         state: GroupState[Seq[(Double, Long)]]) =>
          val incoming = events.map(t => (t.amount, t.ts.getTime)).toSeq
          // merge-then-truncate: identical to TopKAgg.merge, so the
          // state is bounded BEFORE it is written back
          val merged = top(k, state.getOption.getOrElse(Nil) ++ incoming)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((amt, ts), i) =>
            TopRow(accountId, i + 1, amt, ts)
          }
      }
  }
}
