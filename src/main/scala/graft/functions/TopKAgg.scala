package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a typed [[Aggregator]] — the scale
  * answer to window-rank top-k. A `row_number() OVER (PARTITION BY g
  * ORDER BY s)` plan shuffles and sorts EVERY row of every group; this
  * aggregate keeps a ≤4k-element buffer per group, participates in
  * map-side partial aggregation (ObjectHashAggregate partial → final),
  * so the shuffle carries at most O(k) rows per group per map task —
  * at 100 TB that is the difference between shuffling the fact table
  * and shuffling the answer.
  *
  * Ordering is (score desc, payload asc); with distinct payloads the
  * result is a total order, so the outcome is independent of row
  * arrival and merge order (the driver gate relies on that
  * determinism).
  */
case class TopKAgg(k: Int)
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def top(buf: Seq[(Long, Long)]): Seq[(Long, Long)] =
    buf.sortBy { case (score, payload) => (-score, payload) }.take(k)

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    val nb = a +: b
    // amortized compaction: sort only every 3k appends, never per row
    if (nb.length > 4 * k) top(nb) else nb
  }

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    top(x ++ y)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = top(r)

  override def bufferEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKAgg {
  /** `topK(k)(score, payload)` — an aggregate Column producing the
    * group's top-k `array<struct<score, payload>>`, ready for
    * `posexplode` into ranked rows.
    */
  def topK(k: Int)(score: Column, payload: Column): Column =
    udaf(TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(score, payload)
}
