package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev scratch: find which query's EXECUTION flips the warm plan
  * metrics of ann_ivf / decontaminate (the PlanRegressionSpec
  * order-dependence). Runs each query with EntrySpec's cleanup, then
  * re-measures the probes after each.
  */
object PlanDriftHunt {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes = Seq("ann_ivf", "decontaminate")
    def measure(): Map[String, String] = probes.map { n =>
      n -> PlanAudit.warmMetrics(SparkEntry.queries(n), spark, dir).tsv
    }.toMap
    var prev = measure()
    println(s"START ${prev}")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, dir).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val cur = measure()
      if (cur != prev) {
        println(s"FLIP after $name: $prev -> $cur")
        prev = cur
      }
    }
    println(s"END $prev")
    spark.stop()
  }
}
