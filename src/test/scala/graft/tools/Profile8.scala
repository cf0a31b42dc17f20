package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev scratch: best-of-2 timing of named registry queries at
  * local[32] (Bench's per-name isolation discipline).
  */
object Profile8 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pagerank")
    names.foreach { name =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[p8] $name%-24s best ${times.min}%6.2f s  runs ${times.mkString(", ")}")
    }
    spark.stop()
  }
}
