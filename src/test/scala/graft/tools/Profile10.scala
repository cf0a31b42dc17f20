package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev scratch: repeated-run cost of one gate query (default
  * dedup_minhash_inc — rep 2+ there is load + admitBatch only, build
  * memoized away). Pass a query name to time any entry.
  */
object Profile10 {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("dedup_minhash_inc")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(query)(spark, dir).count()
      println(f"[p10] rep $rep $query ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    spark.stop()
  }
}
