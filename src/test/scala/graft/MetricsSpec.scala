package graft

import graft.streaming.Transaction
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prometheus endpoint parity with the reference's
  * GraphSolution-Prometheus variants: the driver servlet must be
  * scrapeable while a streaming query runs, and the per-query
  * streaming gauges (the engine-measured counterparts of the
  * reference's hand-registered throughput/latency gauges) must be
  * registered under the query's name.
  */
class MetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def scrape(path: String): String = {
    val base = spark.sparkContext.uiWebUrl.getOrElse(
      fail("UI disabled — SparkSpec must enable the Prometheus servlet"))
    val conn = new java.net.URI(base + path).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    try scala.io.Source.fromInputStream(conn.getInputStream).mkString
    finally conn.disconnect()
  }

  test("driver /metrics/prometheus serves streaming query gauges " +
      "while a query runs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val q = input.toDF().groupBy(col("accountId"))
      .agg(sum(col("amount")).as("total"))
      .writeStream.format("memory").queryName("pm_gauges")
      .outputMode("complete").start()
    try {
      input.addData(Transaction(1L, 10.0,
        new java.sql.Timestamp(1704067200000L)))
      q.processAllAvailable()
      val body = scrape("/metrics/prometheus")
      // servlet alive and exporting the driver registry
      assert(body.contains("metrics_"), body.take(500))
      // spark.sql.streaming.metricsEnabled publishes this query's
      // gauges into the registry the servlet exports; Prometheus
      // names normalize non-alphanumerics to '_'
      assert(body.contains("pm_gauges"),
        "no streaming gauges for query 'pm_gauges' in scrape:\n" +
          body.linesIterator.filter(_.contains("streaming"))
            .take(20).mkString("\n"))
      val gaugeLines = body.linesIterator
        .filter(l => l.contains("pm_gauges")).toSeq
      assert(gaugeLines.exists(_.contains("inputRate")) &&
        gaugeLines.exists(_.contains("processingRate")) &&
        gaugeLines.exists(_.contains("latency")),
        gaugeLines.mkString("\n"))
    } finally q.stop()
  }
}
