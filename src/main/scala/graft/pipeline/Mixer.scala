package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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
    * Distributed exact prefix, no single-partition stage: range-
    * partition on the sort key (so partition p holds a contiguous rank
    * range and every row in p+1 sorts after every row in p), collect
    * ONE (partition, token-sum) row per partition, prefix-sum those on
    * the driver, and broadcast the exclusive offsets back into a
    * per-partition running-sum window. Selection is identical to a
    * global-window prefix; the only driver-side data is numPartitions
    * rows (same bounded-model pattern as IVF centroids). The explicit
    * partition count keeps AQE from coalescing between the offset job
    * and the final job, so `spark_partition_id` is stable across both.
    */
  def takeTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                      qualityCol: String, budget: Long): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    // persisted: the offset job and the final window job both read it,
    // and serving both from the same materialized blocks (rather than
    // re-running the range shuffle) is also what guarantees
    // spark_partition_id is identical across the two jobs. Cache
    // lifetime: the result is lazy, so no unpersist point exists here;
    // blocks live until session eviction (same note as ngramJaccard)
    val ranged = docs
      .withColumn("n_tokens", TextFunctions.wordCount(col(textCol)).cast(LongType))
      .repartitionByRange(parts, col(qualityCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perPart = ranged.groupBy(col("_pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = perPart
      .scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.zip(perPart)
      .map { case ((_, acc), (pid, _)) => pid -> acc }.toMap
    val w = Window.partitionBy(col("_pid"))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("running_tokens",
        sum(col("n_tokens")).over(w) +
          coalesce(element_at(typedlit(offsets), col("_pid")), lit(0L)))
      .filter(col("running_tokens") <= budget)
      .drop("_pid")
  }
}
