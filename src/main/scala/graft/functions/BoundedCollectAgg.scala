package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `collect_list` with a hard per-group buffer bound — the skew-safe
  * posting-list builder for inverted-index joins.
  *
  * A plain `collect_list(...)` followed by `filter(size(ids) <= cap)`
  * enforces the cap only AFTER the whole array is materialized: a hot
  * group (a boilerplate shingle occurring in millions of documents)
  * builds its entire multi-million-element array inside one
  * aggregation buffer before the filter can drop it — the exact
  * buffer blow-up the df cap is meant to prevent. This aggregator
  * stops appending at `cap + 1` elements (reduce AND merge), so a
  * group's buffer never exceeds cap+1 longs no matter how many rows
  * it receives, while any group that WOULD have exceeded the cap
  * still surfaces as an oversized (cap+1) list for the downstream
  * `size <= cap` filter to drop. For groups within the cap the result
  * is exactly `sort_array(collect_list(...))`: input order never
  * matters because the kept prefix is re-sorted, and a truncated
  * group is dropped entirely rather than partially processed, so
  * truncation can never silently change surviving results.
  *
  * Participates in map-side partial aggregation (ObjectHashAggregate
  * partial → final), so the shuffle also carries at most cap+1 longs
  * per (group, map task).
  */
case class BoundedCollectAgg(cap: Int)
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(cap > 0 && cap < Int.MaxValue, s"cap must be a finite bound, got $cap")

  override def zero: Seq[Long] = Nil

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length > cap) b else a +: b

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    val m = x ++ y
    if (m.length > cap + 1) m.take(cap + 1) else m
  }

  override def finish(r: Seq[Long]): Seq[Long] =
    if (r.length > cap) r else r.sorted

  override def bufferEncoder = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder = ExpressionEncoder[Seq[Long]]()
}

object BoundedCollectAgg {
  /** `boundedSortedList(cap)(c)` — the group's sorted element list,
    * truncated at cap+1 elements (oversized groups are marked by
    * `size > cap`, for the caller to drop).
    */
  def boundedSortedList(cap: Int)(c: Column): Column =
    udaf(BoundedCollectAgg(cap), Encoders.scalaLong).apply(c)
}
