package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch tables — the pre-aggregation
  * pattern behind every 100 TB "how many distinct X per Y" dashboard.
  *
  * The raw corpus is scanned ONCE into a fine-grained sketch table
  * (one Datasketches-HLL binary per (dims, grain) cell, a few KB
  * each); every coarser rollup is then answered by unioning sketches
  * — kilobytes per group — instead of re-scanning terabytes of raw
  * keys. Exact distinct counts cannot be pre-aggregated this way
  * (daily exact counts don't sum: users overlap across days); the
  * sketch registers union losslessly, which is the whole point.
  *
  * Scale shape: stage 1 is one hash aggregation over the raw table
  * (map-side partial sketches combine, so the shuffle carries
  * register arrays, not raw keys); stage 2 shuffles only
  * group-count × sketch-size bytes. Register-wise max-union is
  * associative, commutative, and idempotent, so the estimate is
  * independent of partitioning and merge order — asserted by spec.
  *
  * Reference anchor: the reference keeps running per-key aggregates
  * in RocksDB state (master/src/main/java — fraud counters); this is
  * the batch analogue where the aggregate itself must be mergeable.
  */
object Sketches {

  /** Scan the corpus once into a per-(dims) HLL sketch table.
    * `lgK = 12` → 4096 registers ≈ 1.6% relative standard error at
    * ~4 KB per cell; raise lgK for tighter error, not more scans.
    */
  def distinctSketchTable(df: DataFrame, keyCol: String,
                          dims: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("hll_sketch"))

  /** Answer a coarser distinct-count rollup from sketches alone —
    * no raw-data rescan. Returns the HLL estimate plus the number of
    * fine cells merged.
    */
  def rollupDistinct(sketches: DataFrame, dims: Seq[String]): DataFrame =
    sketches.groupBy(dims.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(hll_sketch))")
             .as("distinct_est"),
           count(lit(1)).as("n_sketches"))
}
