package graft

import graft.operators.CoOccur
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CoOccurSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("pairCounts: hand-counted supports, duplicate rows count once, " +
      "over-cap baskets are dropped entirely") {
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L), // dup membership row
      (3L, 10L), (3L, 20L)) ++
      // group 4 exceeds the cap — contributes NOTHING
      (1L to 10L).map(i => (4L, 100L + i))
    val got = CoOccur.pairCounts(rows.toDF("g", "it"), "g", "it",
        maxBasket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map((10L, 20L) -> 3L, (10L, 30L) -> 1L,
      (20L, 30L) -> 1L))
  }
}
