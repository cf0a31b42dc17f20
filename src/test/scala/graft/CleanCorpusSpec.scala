package graft

import graft.pipeline.CleanCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleanCorpusSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("pipeline removes planted exact and near duplicates, keeps originals") {
    val ws = split(col("text"), " ")
    val planted = docs
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))) // exact
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat_ws(" ", slice(ws, lit(1), greatest(size(ws) - 2, lit(1))))
            .as("text"))) // near
    val cleaned = CleanCorpus.clean(planted, "doc_id", "text",
      minQuality = 0.0, minEstJaccard = 0.6)
    // every planted exact copy gone (original kept)
    assert(cleaned.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      .count() === 0)
    // near-dup copies mostly gone (LSH recall is probabilistic)
    val nearLeft = cleaned.filter(col("doc_id") >= 2000000L).count()
    val nearPlanted = docs.filter(pmod(col("doc_id"), lit(10)) === 5).count()
    assert(nearLeft <= nearPlanted / 5, s"$nearLeft of $nearPlanted survived")
    // originals survive except genuine natural near-dups in the corpus
    // (the 31-word synthetic vocabulary produces a few real pairs)
    val originalsLeft = cleaned.filter(col("doc_id") < 1000000L).count()
    assert(originalsLeft >= (docs.count() * 9) / 10,
      s"$originalsLeft of ${docs.count()} originals survived")
  }

  test("pipeline scrubs PII and reports token counts") {
    val withPii = docs.limit(20)
      .withColumn("text", concat(lit("mail me at a@b.com "), col("text")))
    // near-dup stage disabled (threshold > 1): this test isolates scrub
    val cleaned = CleanCorpus.clean(withPii, "doc_id", "text",
      minQuality = 0.0, minEstJaccard = 1.1)
    assert(cleaned.filter(col("text").contains("a@b.com")).count() === 0)
    assert(cleaned.filter(col("text").contains("<EMAIL>")).count() === 20)
    assert(cleaned.filter(col("n_tokens") <= 0).count() === 0)
  }

  test("quality filter drops low-quality documents") {
    import spark.implicits._
    val junk = Seq((9000001L, "zz")).toDF("doc_id", "text")
    val cleaned = CleanCorpus.clean(docs.unionByName(junk), "doc_id", "text",
      minQuality = 0.3)
    assert(cleaned.filter(col("doc_id") === 9000001L).count() === 0)
  }

  test("cleanScoped: result consumable, release frees the corpus pin") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scoped = CleanCorpus.cleanScoped(docs, "doc_id", "text",
      minQuality = 0.0, minEstJaccard = 0.6)
    val rows = scoped.result.count() // consume BEFORE releasing
    assert(rows > 0)
    // the scope added pins (deduped corpus cache + the loser
    // checkpoint); the CACHED ones must be gone after release, the
    // localCheckpoint block is ContextCleaner-owned and out of scope
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "scope should have pinned the deduped corpus")
    scoped.release()
    // unpersist is async (blocking = false): poll until the cached
    // (non-checkpointed) pins among `added` are gone
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    // the scope adds the corpus cache pin plus the loser-set
    // localCheckpoint pin; release() covers the cache pin only (the
    // checkpoint is ContextCleaner-owned, per the Cleaned contract) —
    // assert the added pin set SHRINKS and at most the checkpoint
    // remains
    def cachedLeft = spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => added(id) }
    while (cachedLeft.size >= added.size && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(cachedLeft.size < added.size && cachedLeft.size <= 1,
      s"released scope left cached pins: ${cachedLeft.keySet} of $added")
    // the result stays CORRECT after release (recompute path works)
    assert(scoped.result.count() === rows)
  }
}
