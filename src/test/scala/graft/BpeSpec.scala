package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text").withColumn("source", lit("s"))
  }

  test("induction recovers the hand-computed merges of a toy corpus") {
    // corpus: "aaab" x3, "ab" x2 → pair counts round 1:
    // (a,a)=6 (two per "aaab"), (a,b)=5. best=(a,a) → "aa".
    // round 2 over {•aa••a••b• x3, •a••b• x2}: (aa,a)=3,
    // (a,b)=3+2=5 — the "aaab" tails still carry (a,b) — →
    // best=(a,b) → "ab".
    val d = docs("aaab aaab aaab", "ab ab")
    val m = Bpe.vocab(d, "text", merges = 2)
      .orderBy("merge_round").collect()
    assert(m.map(r => (r.getAs[String]("merged"),
      r.getAs[Long]("pair_count"))).toSeq ===
      Seq(("aa", 6L), ("ab", 5L)))
  }

  test("greedy leftmost application: overlapping pairs never double-merge") {
    // "aaaa" after merging (a,a): greedy leftmost yields aa|aa — two
    // tokens, never three overlapping merges
    val d = docs("aaaa aaaa aaaa b")
    val t = Bpe.tokenize(d, "text", "source", merges = 1).collect()(0)
    // 3 x "aaaa" (2 tokens each) + 1 x "b" (1 token) = 7
    assert(t.getAs[Long]("bpe_tokens") === 7L)
    assert(t.getAs[Long]("base_symbols") === 13L)
    assert(t.getAs[Long]("n_words") === 4L)
    assert(t.getAs[Long]("n_word_forms") === 2L)
  }

  test("tokenize conserves words and never exceeds base symbols") {
    val d = Tables.documents(spark, sf)
    val t = Bpe.tokenize(d, "text", "source", merges = 3)
    val bad = t.filter(col("bpe_tokens") > col("base_symbols") ||
      col("bpe_tokens") < col("n_words") ||
      col("compression_pml") > 1000 || col("compression_pml") < 0)
    assert(bad.count() === 0)
    // merges only ever shrink the stream: 3 merges vs 1
    val t1 = Bpe.tokenize(d, "text", "source", merges = 1)
      .select(col("source"), col("bpe_tokens").as("b1"))
    val shrunk = t.select(col("source"), col("bpe_tokens").as("b3"))
      .join(t1, "source").filter(col("b3") > col("b1"))
    assert(shrunk.count() === 0)
  }
}
