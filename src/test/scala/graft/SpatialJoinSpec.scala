package graft

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("grid radius join equals the naive join, boundaries included") {
    // points planted ON the radius, one inside, one outside by 1, and
    // across cell boundaries (r=10: cells change at multiples of 10)
    val pts = Seq(
      (1L, 100L, 100L), (2L, 110L, 100L), (3L, 111L, 100L),
      (4L, 100L, 110L), (5L, 109L, 109L), (6L, 89L, 100L),
      (7L, 90L, 91L), (8L, 200L, 200L)).toDF("p_id", "x", "y")
    val qs = Seq((10L, 100L, 100L), (11L, 95L, 95L)).toDF("q_id", "x", "y")
    val grid = SpatialJoin.radiusJoin(pts, qs, "p_id", "q_id", r = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = qs.as("q").crossJoin(pts.as("p"))
      .filter(greatest(abs($"p.x" - $"q.x"), abs($"p.y" - $"q.y")) <= 10)
      .select($"q.q_id", $"p.p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid === naive)
    // the exact-radius point is in, the radius+1 point is out
    assert(grid.contains((10L, 2L)) && !grid.contains((10L, 3L)))
    // far point matches nothing
    assert(!grid.exists(_._2 == 8L))
  }

  test("empty sides produce empty results, not errors") {
    val pts = Seq((1L, 5L, 5L)).toDF("p_id", "x", "y")
    val none = pts.filter(lit(false))
    assert(SpatialJoin.radiusJoin(none, pts.toDF("q_id", "x", "y"),
      "p_id", "q_id", 10L).count() === 0)
    assert(SpatialJoin.radiusJoin(pts,
      none.toDF("q_id", "x", "y"), "p_id", "q_id", 10L).count() === 0)
  }
}
