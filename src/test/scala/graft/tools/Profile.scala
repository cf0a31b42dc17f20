package graft.tools

import graft.Tables
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch profiler: times sub-plans of the slow operators. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    GraftFunctions.register(spark)
    val ws = split(col("text"), " ")
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(ws, lit(1), greatest(size(ws) - 2, lit(1))))
            .as("text")))

    // --- dedup_simhash stages ---
    val sigs = planted.select(col("doc_id"),
      GraftFunctions.simhash(TextFunctions.words(col("text"))).as("sig"))
    time("simhash sigs (warm)")(sigs.count())
    time("simhash sigs")(sigs.count())
    time("simhash pairs full")(Dedup.simhash(planted, "doc_id", "text",
      chunks = 8, maxHamming = 7).count())
    time("simhash pairs again")(Dedup.simhash(planted, "doc_id", "text",
      chunks = 8, maxHamming = 7).count())

    // --- dedup_jaccard stages ---
    time("jaccard df50 0.1")(Dedup.ngramJaccard(docs, "doc_id", "text",
      3, 0.1, 50).count())
    time("jaccard df50 0.1 again")(Dedup.ngramJaccard(docs, "doc_id", "text",
      3, 0.1, 50).count())
    // warm sub-stages over an already-cached shingle table
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesOfWords(col("w"), 3)).as("shRaw"))
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))
      .persist()
    time("  shingle cache fill")(sh.count())
    time("  sizes agg")(sh.groupBy(col("doc_id")).count().count())
    val postings = sh.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50)
    time("  postings agg")(postings.count())
    time("  pair explode+count")(postings
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a"), col("p.b")).count().count())
    val pc = postings.persist()
    pc.count()
    time("  raw pair volume")(println("[profile]   pairs total: " + pc
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          y => struct(x.as("a"), y.as("b")))))).as("p")).count()))
    time("  pairs via chained generators")(pc
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - 1)).as("b"))
      .groupBy(col("a"), col("b")).count().count())
    time("  pairs via chained generators 2")(pc
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - 1)).as("b"))
      .groupBy(col("a"), col("b")).count().count())
    pc.unpersist()
    sh.unpersist()

    // --- clusters on prebuilt tiny pairs (round overhead only) ---
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.1, 50)
      .localCheckpoint(true)
    time("clusters rounds only")(Dedup.clusters(pairs, "id_a", "id_b").count())

    // --- clean_corpus stages ---
    val base = docs.select(col("doc_id"), col("text"))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
    time("cc base quality")(base.count())
    val exactKept = base
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(xxhash64(col("text")), length(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
    time("cc exactKept")(exactKept.count())
    time("clean_corpus full")(graft.pipeline.CleanCorpus.clean(
      docs, "doc_id", "text").count())
    time("clean_corpus full again")(graft.pipeline.CleanCorpus.clean(
      docs, "doc_id", "text").count())

    // --- minhash verified stages ---
    time("minhash verified")(Dedup.minhashLshVerified(planted,
      "doc_id", "text").count())
    time("minhash verified again")(Dedup.minhashLshVerified(planted,
      "doc_id", "text").count())
    spark.stop()
  }
}
