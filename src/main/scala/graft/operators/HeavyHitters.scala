package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Frequent-item (heavy-hitter) detection with a bounded summary —
  * the vocabulary-scale alternative to `GROUP BY token`.
  *
  * Counting every distinct token exactly is a vocabulary-sized
  * shuffle: at 100 TB the (token, partial-count) pairs number in the
  * billions and the hash aggregate spills. The Misra-Gries summary
  * keeps at most `capacity` counters per aggregation buffer, combines
  * map-side like any partial aggregate, and guarantees every item
  * with true frequency > n/(capacity+1) survives to the final buffer
  * (Misra & Gries 1982; the arbitrary-merge bound is Agarwal et al.,
  * "Mergeable Summaries", PODS'12 — summing counters then subtracting
  * the (capacity+1)-th largest preserves the error envelope under any
  * merge tree, which is exactly Spark's partial → final shape).
  *
  * The summary's counts are under-estimates, so [[frequentTokens]]
  * never reports them: it re-counts ONLY the ≤`capacity` surfaced
  * candidates exactly (broadcast semi-join — non-candidates drop
  * map-side, the recount shuffles a candidate-sized key space) and
  * filters on the exact counts. With `threshold ≤ capacity` the
  * guarantee makes the result IDENTICAL to the full `GROUP BY` +
  * `HAVING cnt * threshold > n` answer — exact output from an
  * approximate summary, at a bounded-shuffle price.
  */
case class MisraGriesAgg(capacity: Int)
  extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  /** Shrink to ≤ capacity entries: subtract the (capacity+1)-th
    * largest count from every counter and drop the non-positive —
    * each subtraction removes ≥ capacity+1 units of total weight, the
    * source of the n/(capacity+1) undercount bound.
    */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      m.collect { case (k, v) if v > cut => k -> (v - cut) }
    }

  /** Amortized: let the buffer grow to 4×capacity before shrinking
    * (the sort is then per 3·capacity appends, not per row). Batching
    * keeps the bound: the cut is still the (capacity+1)-th largest,
    * so each shrink removes ≥ (capacity+1)·cut total weight and the
    * Σcut ≤ n/(capacity+1) telescope is unchanged.
    */
  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
    val nb = b.updated(tok, b.getOrElse(tok, 0L) + 1L)
    if (nb.size > 4 * capacity) shrink(nb) else nb
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val m = y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (m.size > 4 * capacity) shrink(m) else m
  }

  override def finish(m: Map[String, Long]): Seq[String] =
    shrink(m).keys.toSeq.sorted

  override def bufferEncoder = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder = ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {

  /** Aggregate Column: the ≤capacity candidate items of the group. */
  def mgCandidates(capacity: Int)(item: Column): Column =
    udaf(MisraGriesAgg(capacity), Encoders.STRING).apply(item)

  /** Exact set of tokens with count*threshold > total tokens, found
    * without ever counting the full vocabulary. `capacity` must be
    * ≥ threshold for the Misra-Gries guarantee to make the candidate
    * set complete (default 2× slack).
    */
  def frequentTokens(df: DataFrame, textCol: String, threshold: Int,
                     capacity: Int = 0): DataFrame = {
    val cap = if (capacity > 0) capacity else 2 * threshold
    require(cap >= threshold,
      s"capacity $cap < threshold $threshold voids the completeness guarantee")
    val toks = df.select(explode(split(col(textCol), " ")).as("token"))
    val cands = toks.agg(mgCandidates(cap)(col("token")).as("cands"))
      .select(explode(col("cands")).as("token"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(threshold.toLong) > col("n_total"))
      .select(col("token"), col("cnt"))
  }
}
