package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev scratch: time a single shipped SparkEntry query by name. */
object Profile1 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("clean_corpus")
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "orders", "lineitem").foreach { t =>
      try Tables.table(spark, dir, t).count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, dir).count() catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[profile1] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
