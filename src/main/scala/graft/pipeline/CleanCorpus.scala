package graft.pipeline

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline — the composition a
  * user actually runs over a raw corpus:
  *
  *   quality filter → exact dedup (keep first) → MinHash-LSH near-dup
  *   removal (keep the lower id of each pair) → PII scrub → stats.
  *
  * The pipeline materializes two intermediates eagerly — the deduped
  * corpus (persisted + filled) and the near-dup loser set
  * (localCheckpoint) — because both have multiple downstream
  * consumers; everything else stays declarative: Catalyst pushes the
  * quality filter to the scan, and the only shuffles are the dedup
  * aggregations/joins. The near-dup removal is an anti-join against
  * the LSH pair set, so at 100 TB the pair set (tiny relative to the
  * corpus) drives a broadcast or well-partitioned anti-join rather
  * than any O(n²) work.
  */
object CleanCorpus {

  /** A cleaned corpus plus the handle that frees its cached
    * intermediate: `result` is lazy over the pipeline's persisted
    * deduped corpus, so call `release()` only AFTER consuming (or
    * re-materializing) `result` — releasing first silently recomputes
    * the scan + quality + dedup shuffle on the next consumer instead.
    * The tiny near-dup loser checkpoint is not covered: its blocks
    * are ContextCleaner-owned and vanish when the plan is GC'd.
    */
  final case class Cleaned(result: DataFrame, release: () => Unit)

  /** `exactNearDup = false` (default) removes near-dups via
    * MinHash-LSH — the approximate scale path (recall property-tested
    * in DedupSpec). `exactNearDup = true` uses the exact n-gram
    * Jaccard inverted index instead: same pipeline shape, and the
    * whole output becomes SQL-oracle-checkable because true Jaccard
    * (unlike minhash signatures) is engine-portable.
    *
    * Cache lifetime: the returned plan pins the deduped corpus until
    * session eviction (there is no safe unpersist point inside a
    * function returning a lazy plan). A long-lived library session
    * that cleans corpus after corpus should use [[cleanScoped]] and
    * release each scope after consuming it.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.3, shingleN: Int = 3,
            minEstJaccard: Double = 0.8,
            exactNearDup: Boolean = false,
            maxShingleDf: Int = Int.MaxValue): DataFrame =
    cleanScoped(docs, idCol, textCol, minQuality, shingleN,
      minEstJaccard, exactNearDup, maxShingleDf).result

  /** [[clean]] with the cached-intermediate lifetime handed to the
    * caller — see [[Cleaned]].
    */
  def cleanScoped(docs: DataFrame, idCol: String, textCol: String,
                  minQuality: Double = 0.3, shingleN: Int = 3,
                  minEstJaccard: Double = 0.8,
                  exactNearDup: Boolean = false,
                  maxShingleDf: Int = Int.MaxValue): Cleaned = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)

    // exact dedup: keep the first id per identical text. The window
    // partitions on (xxhash64, length) — 16-byte shuffle/sort keys —
    // not the raw text (same rationale as Dedup.exact: at 100 TB a
    // full-text key makes every shuffle comparator scan documents).
    // Collision semantics inherited from that choice: a same-length
    // 64-bit collision (birthday bound ~2^32 equal-length docs) would
    // DROP a distinct document here, not just merge a count — use
    // Dedup.exact(rawKeys = true) semantics instead if that residual
    // risk is unacceptable for the corpus.
    // Persisted: three downstream branches (shingle index, pair sizes,
    // final anti-join) would otherwise each recompute the scan +
    // quality + dedup shuffle — materializing the deduped corpus once
    // before candidate generation is the standard shape at scale.
    // Cache lifetime: the returned plan is lazy, so there is no safe
    // unpersist point inside this function; the Cleaned.release handle
    // transfers that decision to the caller (clean() callers get the
    // old until-session-eviction behavior).
    val exactKept = base
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(xxhash64(col("text")), length(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EAGER fill. The downstream near-dup pipeline launches several
    // concurrent jobs (broadcast-build subplans run as parallel
    // futures), and a lazily-persisted block is filled under a
    // per-block lock: concurrent first-consumers serialize behind
    // whichever task is computing a block instead of reading a cache
    // hit (measured: 30s+ of lock-park time in a 5k-doc run). One
    // up-front job fills the cache with full parallelism; every later
    // consumer — whatever thread it runs on — reads.
    exactKept.count()

    // near-dup removal: drop the HIGHER id of each near-dup pair
    val pairs =
      if (exactNearDup)
        Dedup.ngramJaccard(exactKept, "doc_id", "text", shingleN,
          minJaccard = minEstJaccard, maxShingleDf = maxShingleDf)
      else
        Dedup.minhashLsh(exactKept, "doc_id", "text", shingleN,
          minEstJaccard = minEstJaccard)
    // localCheckpoint (eager): the loser set is tiny by construction
    // (bounded by true near-dup pairs), but its LINEAGE is the whole
    // candidate-generation pipeline. Left lazy, the anti-join's
    // broadcast build re-executes that pipeline inside a broadcast
    // thread — and a retry or a second consumer runs it again. The
    // checkpoint runs it exactly once, with full cluster parallelism,
    // and the anti-join broadcasts a materialized two-column table.
    val nearDupLosers = pairs.select(col("id_b").as("doc_id")).distinct()
      .localCheckpoint(true)

    val out = exactKept
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .withColumn("text", TextFunctions.scrubPii(col("text")))
      .withColumn("n_tokens", TextFunctions.wordCount(col("text")))
      .select(col("doc_id"), col("text"), col("quality"), col("n_tokens"))
    Cleaned(out, () => { exactKept.unpersist(blocking = false): Unit })
  }
}
