package graft.tools

import graft.Tables
import graft.operators.Postings
import org.apache.spark.sql.SparkSession

/** Dev scratch: does overlapping the independent postings stream
  * writers (guide §2.6 — concurrent jobs back-fill each other's task
  * tails) cut `_build_postings` wall? Measured r16 with both arms
  * interleaved (sequential writeStreams-based build vs the pool):
  * sf0.1 steady 4.4-4.9 s -> 2.2-2.3 s, sf1.0 22.0-26.6 -> 11.5-12.4
  * — the concurrent path became [[Postings.build]]; this profile now
  * times the production build (the sequential arm lives only in the
  * append path, which is batch-sized).
  */
object Profile14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm page cache
    def tempDir(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p14] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 3).foreach { rep =>
      time(s"build rep$rep")(
        Postings.build(docs, "doc_id", "source", "text",
          tempDir("p14_con")))
    }
    spark.stop()
  }
}
