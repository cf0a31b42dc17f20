package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located join strategy at 100 TB: both fact
  * tables pre-hashed into the same bucket layout on the join key, so
  * the join needs NO shuffle at read time — each task joins bucket i
  * against bucket i. This spec materializes bucketed copies of
  * orders/customer and asserts the join plan is exchange-free.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
      case _ => Nil
    }
    (p +: p.children.flatMap(collectPlan)) ++ extra
  }

  test("bucketed tables join without any shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — the
    // warehouse dir is a static conf and cannot be set per-test
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val total = joined.agg(sum("n")).head.getLong(0)
      assert(total === Tables.orders(spark, sf).count())

      val plainJoin = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      plainJoin.count()
      val nodes = collectPlan(plainJoin.queryExecution.executedPlan)
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles === 0, s"expected shuffle-free bucketed join, got $shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
