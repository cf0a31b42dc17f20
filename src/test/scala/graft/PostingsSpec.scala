package graft

import graft.operators.Postings
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates the stored tokenized-corpus streams (`_build_postings`)
  * against inline tokenization: every stream the build writes must be
  * row-identical to the expression it replaced in the consumers —
  * that equivalence is what lets the eleven text-family queries serve
  * from the stored tables with their outputs unchanged.
  */
class PostingsSpec extends AnyFunSuite with SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "web", "the quick brown fox the quick"),
      (2L, "web", "The the THE the"),
      (3L, "book", "one"),
      (4L, "book", ""), // splits to one empty-string token
      (5L, "wiki", "alpha beta gamma delta")
    ).toDF("doc_id", "source", "text")
  }

  private def built(path: String): Unit =
    Postings.build(corpus, "doc_id", "source", "text", path)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("tokens stream matches posexplode(split) exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_post1").toString
    built(dir)
    val expected = corpus.select(col("doc_id"), col("source"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    assert(rows(Postings.tokens(spark, dir)
      .select("doc_id", "source", "pos", "term")) === rows(expected))
  }

  test("pair stream mirrors the consumers' zip_with at d=1 and d=2") {
    val dir = java.nio.file.Files.createTempDirectory("graft_post2").toString
    built(dir)
    def expectedAt(d: Int) = corpus
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), explode(expr(
        s"zip_with(slice(w, 1, greatest(size(w) - $d, 0))," +
          s" slice(w, ${1 + d}, greatest(size(w) - $d, 0))," +
          " (a, b) -> struct(a, b))")).as("p"))
      .select(col("doc_id"), col("source"),
        col("p.a").as("w_a"), col("p.b").as("w_b"))
    Seq(1, 2).foreach { d =>
      assert(rows(Postings.pairs(spark, dir, d)
        .select("doc_id", "source", "w_a", "w_b")) ===
        rows(expectedAt(d)), s"pair stream diverges at d=$d")
    }
    // the full stream is exactly the union of the two distances
    assert(Postings.pairsAll(spark, dir).count() ===
      Postings.pairs(spark, dir, 1).count() +
        Postings.pairs(spark, dir, 2).count())
  }

  test("distinct streams match the in-array distincts they replace") {
    val dir = java.nio.file.Files.createTempDirectory("graft_post3").toString
    built(dir)
    val expectedD = corpus.select(col("doc_id"), col("source"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    assert(rows(Postings.distinctTokens(spark, dir)
      .select("doc_id", "source", "term")) === rows(expectedD))
    // lowered stream: distinct AFTER lowering — doc 2's four case
    // variants of "the" collapse to ONE row; non-[a-z]+ tokens drop
    val expectedL = corpus.select(col("doc_id"), col("source"),
      explode(array_distinct(expr(
        "filter(transform(split(text, ' '), x -> lower(x))," +
          " x -> x rlike '^[a-z]+$')"))).as("term"))
    val gotL = Postings.distinctTokensLower(spark, dir)
    assert(rows(gotL.select("doc_id", "source", "term")) ===
      rows(expectedL))
    assert(gotL.filter(col("doc_id") === 2).count() === 1)
    // the empty-string token of doc 4 survives dtokens (case-
    // sensitive stream is filterless) but never dtokens_lower
    assert(Postings.distinctTokens(spark, dir)
      .filter(col("doc_id") === 4).count() === 1)
    assert(gotL.filter(col("doc_id") === 4).count() === 0)
  }

  test("an empty corpus builds readable empty streams") {
    val dir = java.nio.file.Files.createTempDirectory("graft_post4").toString
    Postings.build(corpus.filter(lit(false)), "doc_id", "source", "text", dir)
    assert(Postings.tokens(spark, dir).count() === 0)
    assert(Postings.pairsAll(spark, dir).count() === 0)
    assert(Postings.distinctTokens(spark, dir).count() === 0)
    assert(Postings.distinctTokensLower(spark, dir).count() === 0)
  }
}
