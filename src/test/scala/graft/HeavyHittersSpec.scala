package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkSpec {

  /** 5 planted heavy tokens (1000× each) in a 10k-distinct-singleton
    * tail: vocabulary 10005 ≫ capacity 40, so the shrink path runs
    * constantly and the candidate buffer stays bounded.
    */
  private lazy val skewed = {
    import spark.implicits._
    val heavy = (1 to 5).flatMap(h => Seq.fill(1000)(s"h$h"))
    val tail = (1 to 10000).map(i => s"t$i")
    spark.createDataset(scala.util.Random.shuffle(heavy ++ tail))
      .toDF("text").repartition(13)
  }

  test("exact heavy set recovered through a 40-counter summary") {
    // n = 15000, threshold 20 -> qualify iff cnt*20 > 15000, i.e.
    // cnt > 750: exactly the five planted tokens
    val got = HeavyHitters.frequentTokens(skewed, "text", threshold = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === (1 to 5).map(h => s"h$h" -> 1000L).toMap)
  }

  test("result is partitioning-invariant and empty when nothing qualifies") {
    val a = HeavyHitters.frequentTokens(skewed.repartition(3), "text", 20)
      .collect().map(_.getString(0)).toSet
    val b = HeavyHitters.frequentTokens(skewed.repartition(31), "text", 20)
      .collect().map(_.getString(0)).toSet
    assert(a === b)
    // threshold 2 demands cnt > 7500: nothing reaches it
    assert(HeavyHitters.frequentTokens(skewed, "text", 2).count() === 0)
  }

  test("capacity below threshold is rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(skewed, "text", 20, capacity = 10)
    }
  }
}
