package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius join via grid binning — the 2-D sibling of
  * [[RangeJoin]]'s interval binning.
  *
  * A naive radius join is a cross product with a distance predicate —
  * quadratic and unshippable at scale. Binning assigns every point to
  * an r×r grid cell; any pair within L∞ distance r lies in the same
  * or an adjacent cell, so exploding the SMALL side to its 3×3 cell
  * neighborhood turns the search into ONE equi-join on cell ids,
  * followed by an exact distance verify on the (bounded) candidates.
  * The big side is never replicated and shuffles once on cell id;
  * skew only arises from genuinely dense cells, which AQE splits.
  * Same shape as geohash/S2-cell joins in geospatial engines.
  */
object SpatialJoin {

  /** (q_id, p_id, cheb_dist) pairs with L∞ (Chebyshev) distance ≤ r.
    * `points` carries (idCol, x, y) — the big side; `queries` the
    * same — the small side, exploded ×9.
    */
  def radiusJoin(points: DataFrame, queries: DataFrame,
                 pId: String, qId: String, r: Long): DataFrame = {
    require(r > 0)
    val p = points.select(col(pId).as("p_id"),
      col("x").as("px"), col("y").as("py"),
      expr(s"x div $r").as("cx"), expr(s"y div $r").as("cy"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val q = queries.select(col(qId).as("q_id"),
        col("x").as("qx"), col("y").as("qy"))
      .withColumn("o", explode(offsets))
      .select(col("q_id"), col("qx"), col("qy"),
        (expr(s"qx div $r") + col("o.dx")).as("cx"),
        (expr(s"qy div $r") + col("o.dy")).as("cy"))
    p.join(broadcast(q), Seq("cx", "cy"))
      .withColumn("cheb_dist",
        greatest(abs(col("px") - col("qx")), abs(col("py") - col("qy"))))
      .filter(col("cheb_dist") <= r)
      .select(col("q_id"), col("p_id"), col("cheb_dist"))
  }
}
