package graft

import graft.sources.MetaStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetaStatsSpec extends AnyFunSuite with SparkSpec {

  test("table stats are answered from parquet footers (PushedAggregation)") {
    val stats = MetaStats.tableStats(spark, s"$sf/orders.parquet",
      "orders", "o_orderkey")
    // the aggregate is pushed into the scan: metadata, not data pages
    // (the V2 relation's OUTPUT is the aggregate columns, and the
    // executed scan prints the PushedAggregation marker)
    val logical = stats.queryExecution.optimizedPlan.toString
    assert(logical.contains("RelationV2[count(*)"), logical.take(500))
    val physical = stats.queryExecution.executedPlan.toString
    assert(physical.contains("PushedAggregation: [COUNT(*), " +
      "MIN(o_orderkey), MAX(o_orderkey)]"), physical.take(800))
    // and the footer numbers equal a row-level recompute
    val expected = Tables.orders(spark, sf)
      .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"))
      .collect().head
    val got = stats.collect().head
    assert(got.getLong(1) === expected.getLong(0))
    assert(got.getLong(2) === expected.getLong(1))
    assert(got.getLong(3) === expected.getLong(2))
  }

  test("the V2-scan confs stay isolated in the child session") {
    MetaStats.tableStats(spark, s"$sf/part.parquet", "part", "p_partkey")
      .collect()
    // parent session keeps its planner behavior
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") === "false")
    assert(spark.conf.get("spark.sql.sources.useV1SourceList").nonEmpty)
  }
}
