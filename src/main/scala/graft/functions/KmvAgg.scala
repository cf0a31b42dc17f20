package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-minimum-DISTINCT-values aggregate — the build step of a
  * KMV ("theta") distinct-count sketch. Keeps the k smallest distinct
  * hash values seen; participates in map-side partial aggregation, so
  * the shuffle carries at most k longs per group per map task — the
  * raw key stream never crosses the wire (a plain
  * `distinct().groupBy().agg(k-min)` would shuffle every distinct
  * hash instead).
  *
  * The k-min-distinct set is associative, commutative, and idempotent
  * under merge, so the result is independent of row arrival, merge
  * order, and partitioning — which is what lets the driver gate hash
  * a sketch exactly rather than tolerance-gate it.
  */
case class KmvAgg(k: Int)
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  private def kmin(b: Seq[Long]): Seq[Long] = b.distinct.sorted.take(k)

  override def zero: Seq[Long] = Nil

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    val nb = a +: b
    // amortized compaction: dedup+sort every ~3k appends, never per row
    if (nb.length > 4 * k) kmin(nb) else nb
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = kmin(x ++ y)

  override def finish(r: Seq[Long]): Seq[Long] = kmin(r)

  override def bufferEncoder = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder = ExpressionEncoder[Seq[Long]]()
}

object KmvAgg {
  /** `kMinDistinct(k)(hv)` — aggregate Column producing the group's
    * ascending array of its k smallest distinct long values.
    */
  def kMinDistinct(k: Int)(hv: Column): Column =
    udaf(KmvAgg(k), Encoders.scalaLong).apply(hv)
}
