package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object SparkSpec {
  lazy val session: SparkSession = {
    // UI on (random port) so MetricsSpec can scrape the Prometheus
    // servlet GraftStreams.withPrometheus configures
    val builder = graft.streaming.GraftStreams.withPrometheus(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.port", "0"))
    builder.getOrCreate()
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}
