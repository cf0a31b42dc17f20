package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-smallest-(hash, value) aggregate — the build step of a
  * mergeable bottom-k SAMPLE sketch (Cormode et al., "Mergeable
  * Summaries": a uniform random sample is a mergeable quantile
  * summary with error O(1/√k)). Keeping the k pairs with the
  * smallest row-unique hash retains a uniform sample of the group's
  * rows, and — because "k smallest of a union = k smallest of the k
  * smallests" — two cells over disjoint row sets merge EXACTLY, which
  * is what lets per-day quantile cells roll up to any coarser grain
  * without rescanning raw rows.
  *
  * The hash is caller-supplied (the engine-common 60-bit md5 prefix
  * of a unique row key, [[graft.operators.Sketches]]), so the sketch
  * and every order statistic read from it are DETERMINISTIC —
  * hash-oracle-able, not tolerance-gated. Map-side partial
  * aggregation keeps ≤k pairs per group per task on the shuffle.
  */
case class SampleKAgg(k: Int)
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def bot(buf: Seq[(Long, Long)]): Seq[(Long, Long)] =
    buf.sorted.take(k) // (hash asc, value asc) — a total order

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    val nb = a +: b
    // amortized compaction: sort only every ~3k appends, never per row
    if (nb.length > 4 * k) bot(nb) else nb
  }

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    bot(x ++ y)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = bot(r)

  override def bufferEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
}

object SampleKAgg {
  /** `bottomK(k)(hash, value)` — aggregate Column producing the
    * group's ascending array of its k lexicographically-smallest
    * `(hash, value)` pairs.
    */
  def bottomK(k: Int)(hash: Column, value: Column): Column =
    udaf(SampleKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(hash, value)
}
