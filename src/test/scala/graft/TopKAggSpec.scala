package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite with SparkSpec {

  private lazy val orders = Tables.orders(spark, sf)
  private def cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
    .cast("long")

  test("bounded top-k aggregate equals the window-rank formulation") {
    val agg = orders.groupBy(col("o_orderpriority"))
      .agg(TopKAgg.topK(5)(cents, col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rnk"),
        col("e._2").as("o_orderkey"), col("e._1").as("price_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(cents.desc, col("o_orderkey"))
    val ranked = orders
      .select(col("o_orderpriority"), col("o_orderkey"),
        cents.as("price_cents"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 5)
      .select("o_orderpriority", "rnk", "o_orderkey", "price_cents")
    assert(agg.count() > 0)
    assert(agg.exceptAll(ranked).isEmpty && ranked.exceptAll(agg).isEmpty)
  }

  test("the aggregate runs as partial+final ObjectHashAggregate") {
    // the scale contract: a map-side partial merge exists, so the
    // exchange moves ≤4k-element buffers per group, never raw rows
    val plan = orders.groupBy(col("o_orderpriority"))
      .agg(TopKAgg.topK(3)(cents, col("o_orderkey")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }

  test("merge and reduce respect the (score desc, payload asc) order") {
    val a = TopKAgg(2)
    val r = (1L to 10L).foldLeft(a.zero)((b, i) => a.reduce(b, (i % 3, i)))
    val out = a.finish(a.merge(r, Seq((5L, 99L), (0L, 0L))))
    assert(out === Seq((5L, 99L), (2L, 2L)))
  }
}
