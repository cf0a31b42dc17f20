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
}
