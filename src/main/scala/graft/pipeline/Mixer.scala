package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-mix assembly operators: deterministic stratified sampling
  * by source and token-budget truncation — the last mile between a
  * cleaned corpus and a training shard list.
  *
  * Determinism matters more than statistical niceties here: a mix
  * must be reproducible run-over-run and machine-over-machine, so
  * selection is keyed on a hash of the row id, not on RNG state
  * (`sampleBy` draws from per-partition RNG streams and changes with
  * partitioning; xxhash64(id, seed) does not).
  */
object Mixer {

  /** Keep each row iff hash(id, seed) mod 1e6 < fraction(source)·1e6 —
    * a per-source deterministic Bernoulli sample. Scale: narrow (no
    * shuffle), fully pushed into the scan stage.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame = {
    val frac = typedlit(fractions)
    val draw = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
      .cast(DoubleType) / 1000000.0
    docs.filter(draw < coalesce(frac(col(strataCol)), lit(0.0)))
  }

  /** Greedy token-budget cut: order documents deterministically
    * (quality desc, id asc), keep the prefix whose running token sum
    * stays within `budget`.
    *
    * Distributed exact prefix, deterministic by construction: the
    * corpus never passes through a single task AND no step depends on
    * physical partitioning. Rows are grouped by `bucketExpr` — any
    * expression MONOTONE in the quality order (default: the quality
    * value itself), so each bucket is a contiguous slice of the global
    * (quality desc, id) order. Per-bucket token sums (one row per
    * distinct bucket, bounded by the quality DOMAIN, not the corpus)
    * get exclusive running offsets via a window over that tiny side
    * table; the offsets join back on the bucket key (AQE broadcasts
    * the small side) and a per-bucket window adds the within-bucket
    * prefix. Selection is identical to a global-window prefix.
    *
    * Contrast with the earlier design (range-partition +
    * `spark_partition_id` + driver-side offset collect): that one's
    * OUTPUT depended on two jobs observing identical sampled range
    * bounds, a cache-coherence property rather than a plan property.
    * Here every value is a pure function of the data.
    *
    * Scale notes: the offsets window is a single task over
    * |distinct bucket| rows of 16 bytes — for an integer quality like
    * `n_chars` that is the value domain (thousands at most). For a
    * continuous quality column pass a quantized `bucketExpr` (e.g.
    * `floor(col("q") * 64)`) to keep the bucket count bounded; the
    * per-bucket corpus window then carries corpus/|buckets| rows per
    * task. `qualityCol` must be non-null.
    */
  def takeTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                      qualityCol: String, budget: Long,
                      bucketExpr: Option[Column] = None): DataFrame = {
    val withTok = docs
      .withColumn("n_tokens", TextFunctions.wordCount(col(textCol)).cast(LongType))
      .withColumn("_b", bucketExpr.getOrElse(col(qualityCol)))
    // one (bucket, token-sum) row per distinct bucket; map-side combine
    // shrinks the shuffle to |buckets| rows per input partition
    val offs = withTok.groupBy(col("_b"))
      .agg(sum(col("n_tokens")).as("_bt"))
      .withColumn("_off",
        coalesce(
          sum(col("_bt")).over(Window.orderBy(col("_b").desc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_bt")
    val w = Window.partitionBy(col("_b"))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTok.join(offs, "_b")
      .withColumn("running_tokens", sum(col("n_tokens")).over(w) + col("_off"))
      .filter(col("running_tokens") <= budget)
      .drop("_b", "_off")
  }
}
