package graft.tools

import graft.Tables
import graft.operators.Postings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: the postings-admission economics (round-15 verdict
  * task 2's "documented measured build-row comparison") — cost of
  * admitting a 10% document batch into a stored postings snapshot vs
  * rebuilding the snapshot from scratch, at a given SF dir.
  */
object Profile11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    def tempDir(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p11] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val snap = tempDir("p11_snap")
    time("build 90% base")(
      Postings.build(base, "doc_id", "source", "text", snap))
    time("admit 10% batch")(
      Postings.admitBatch(batch, "doc_id", "source", "text", snap))
    val full = tempDir("p11_full")
    time("rebuild 100% from scratch")(
      Postings.build(docs, "doc_id", "source", "text", full))
    spark.stop()
  }
}
