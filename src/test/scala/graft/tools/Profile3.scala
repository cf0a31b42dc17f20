package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: isolate why pair-aggregation after chained generators
  * is slow in the clean_corpus composition.
  */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p3] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    docs.count()
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val base = planted
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
    val exactKept = base
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(xxhash64(col("text")), length(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exactKept.count()

    val shingled = exactKept
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesOfWords(col("w"), 3)).as("shRaw"))
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))
      .persist()
    shingled.count()

    val postings = shingled.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50)

    val pairsRaw = postings
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - 1)).as("id_b"))

    // 1. agg over a MATERIALIZED pair table
    val pp = pairsRaw.persist()
    time("pairsRaw persist fill")(pp.count())
    time("agg over persisted pairs")(
      pp.groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count())
    time("agg over persisted pairs 2")(
      pp.groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count())
    pp.unpersist()

    // 2. agg fused with the generators (the shipped shape)
    time("agg fused with generators")(
      pairsRaw.groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count())

    // 3. same but drop the ids carry ASAP via a repartition barrier?
    time("agg fused run 2")(
      pairsRaw.groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count())

    println("---- fused plan ----")
    pairsRaw.groupBy(col("id_a"), col("id_b")).agg(count(lit(1)))
      .explain("formatted")
    spark.stop()
  }
}
