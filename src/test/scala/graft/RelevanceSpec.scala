package graft

import graft.operators.Relevance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelevanceSpec extends AnyFunSuite with SparkSpec {

  test("salient terms: exact integer scores, rare terms outrank common") {
    import spark.implicits._
    val docs = Seq(1L -> "a a b", 2L -> "a c").toDF("doc_id", "text")
    val got = Relevance.salientTerms(docs, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getInt(2), r.getLong(3)))
      .toMap
    // N=2, df(a)=2 df(b)=df(c)=1; score = (1e6·tf·N) div (dl·df)
    assert(got((1L, "a")) === (1, 666666L)) // (1e6·2·2)/(3·2), term tiebreak
    assert(got((1L, "b")) === (2, 666666L)) // (1e6·1·2)/(3·1)
    assert(got((2L, "c")) === (1, 1000000L)) // rare c beats common a…
    assert(got((2L, "a")) === (2, 500000L))  // …despite equal tf
  }

  test("salient terms on the corpus: ≤k per doc, dense ranks, all docs") {
    val docs = Tables.documents(spark, sf)
    val out = Relevance.salientTerms(docs, "doc_id", "text", 3)
    assert(out.select("doc_id").distinct().count() === docs.count())
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .filter(col("n") > 3 || col("mr") =!= col("n"))
    assert(bad.count() === 0)
  }
}
