package graft.tools

import graft.Tables
import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: wall/stage/task/CPU accounting of q_pagerank at
  * sf0.1 — the round-8 loop-shape rework was driven by these numbers
  * (see Graph.pageRank's scaladoc).
  */
object Profile9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(sc.stageInfo.numTasks)
          taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
          cpuMs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime / 1000000)
        }
      })
    def t[A](label: String)(f: => A): A = {
      stages.set(0); tasks.set(0); taskMs.set(0); cpuMs.set(0)
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"[p9] $label%-24s $wall%6.2f s  stages=${stages.get}%3d tasks=${tasks.get}%4d taskTime=${taskMs.get / 1000.0}%6.2f s cpu=${cpuMs.get / 1000.0}%6.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"[p9] --- rep $rep ---")
      spark.catalog.clearCache()
      val edges = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val pr = t("pageRank")(Graph.pageRank(edges, iters = 3))
      t("top20")(pr.orderBy(col("pr").desc, col("node")).limit(20).count())
    }
    spark.stop()
  }
}
