package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the shipped clean_corpus
  * configuration (planted exact copies, exactNearDup=true, df cap 50,
  * minJaccard 0.8).
  */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p2] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    docs.count()
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    val base = planted
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
    time("base")(base.count())

    val exactKept = base
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(xxhash64(col("text")), length(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("exactKept fill")(exactKept.count())

    val shingled = exactKept
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesOfWords(col("w"), 3)).as("shRaw"))
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))
      .persist()
    time("shingled fill")(shingled.count())
    time("sizes")(shingled.groupBy(col("doc_id")).count().count())

    val postings = shingled.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50)
    time("postings")(postings.count())

    val pairsRaw = postings
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - 1)).as("id_b"))
    time("pair volume")(println("[p2]   pairs: " + pairsRaw.count()))
    val inter = pairsRaw.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("inter agg")(inter.count())

    time("full ngramJaccard")(Dedup.ngramJaccard(exactKept, "doc_id", "text",
      3, 0.8, 50).count())

    val pairs = Dedup.ngramJaccard(exactKept, "doc_id", "text", 3, 0.8, 50)
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    time("anti-join final")(exactKept
      .join(losers, Seq("doc_id"), "left_anti")
      .withColumn("text", TextFunctions.scrubPii(col("text")))
      .withColumn("n_tokens", TextFunctions.wordCount(col("text")))
      .count())
    spark.stop()
  }
}
