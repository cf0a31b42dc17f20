package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: how much of q_pagerank / q_hits is the shared
  * orders⋈lineitem edge-list front end vs the bounded-round
  * iteration (round-16 measure-first, before deciding whether a
  * stored edge table is worth a build row).
  */
object Profile13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            cpuNs.addAndGet(
              m.executorCpuTime + m.executorDeserializeCpuTime): Unit
          }
        }
      })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c = (cpuNs.get() - c0) / 1e9
      println(f"[p13] $label%-34s wall $w%6.2f s  cpu $c%7.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))

    time("E1 edge build (pagerank shape)")(noop(edges))
    time("E2 edge build + distinct (hits)")(noop(edges.distinct()))
    time("P pageRank(edges, 3)") {
      noop(graft.operators.Graph.pageRank(edges, iters = 3))
    }
    // pageRank over a pre-materialized edge table (parquet), the
    // stored-serving shape
    val tmp = java.nio.file.Files.createTempDirectory("p13_edges").toString
    edges.write.mode("overwrite").parquet(tmp)
    time("P' pageRank(stored edges, 3)") {
      noop(graft.operators.Graph.pageRank(
        spark.read.parquet(tmp), iters = 3))
    }
    spark.stop()
  }
}
