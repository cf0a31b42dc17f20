package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: clean_corpus stage breakdown (round-16 measure-first)
  * — the pipeline is the top steady-CPU query row; before touching it,
  * time each stage in isolation with the noop sink (guide §1.4) so
  * the fix targets the actual cost, not a guess. Stages:
  *   A  scan + qualityScore filter
  *   B  A + exact-dedup window (xxhash64/length partitions)
  *   C  ngramJaccard over the deduped corpus (candidate pair set)
  *   D  full pipeline (anti-join + scrubPii + wordCount)
  *   D' full pipeline minus scrubPii (isolates the regex cost)
  */
object Profile12 {
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
      // two reps, report the second (steady state — codegen cached)
      f
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c = (cpuNs.get() - c0) / 1e9
      println(f"[p12] $label%-34s wall $w%6.2f s  cpu $c%7.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def withCopies = {
      // inline mirror of SparkEntry.withPlantedExactCopies (private)
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      base.unionByName(base.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }
    def stageA = withCopies
      .select(col("doc_id"), col("text"))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
    def stageB = {
      stageA.withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(xxhash64(col("text")), length(col("text")))))
        .filter(col("doc_id") === col("keep_id"))
        .drop("keep_id")
    }

    // --- inside-ngramJaccard isolation (mirrors Dedup.hashedShingles)
    def shingleStrings = stageB
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesOfWords(col("w"), 3)).as("shRaw"))
    def hashedSh = shingleStrings
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))
    // no array_distinct variant: same explosion, skip in-array dedup
    def shingleNoDistinct = stageB
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 3,
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
        .otherwise(array().cast(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))).as("shRaw"))
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))
    time("C0 split only")(noop(stageB
      .select(col("doc_id"), split(col("text"), " ").as("w"))))
    time("C1 shingle strings (no hash)")(noop(shingleStrings))
    time("C2 hashed shingles")(noop(hashedSh))
    time("C2b hashed, no array_distinct")(noop(shingleNoDistinct))
    time("C3 sizes agg over C2") {
      noop(hashedSh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz")))
    }

    val nParts = spark.sessionState.conf.numShufflePartitions
    time("C4 postings agg (bounded list)") {
      noop(hashedSh.groupBy(col("sh"))
        .agg(graft.functions.BoundedCollectAgg.boundedSortedList(50)(
          col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50))
    }
    time("C4b postings agg (collect_list)") {
      noop(hashedSh.groupBy(col("sh"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50))
    }
    time("C5 pairs from postings") {
      noop(hashedSh.groupBy(col("sh"))
        .agg(graft.functions.BoundedCollectAgg.boundedSortedList(50)(
          col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50)
        .repartition(nParts, col("sh"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
        .select(col("id_a"),
          explode(slice(col("ids"), col("i") + lit(2),
            size(col("ids")) - col("i") - 1)).as("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter")))
    }
    time("C6 persist fill + count") {
      val sh2 = hashedSh.persist()
      sh2.count()
      sh2.unpersist(blocking = true): Unit
    }

    time("A scan+quality")(noop(stageA))
    time("B A+exact-dedup window")(noop(stageB))
    time("C ngramJaccard(B)") {
      noop(Dedup.ngramJaccard(stageB, "doc_id", "text", 3,
        minJaccard = 0.8, maxShingleDf = 50))
    }
    time("D full clean_corpus") {
      noop(graft.pipeline.CleanCorpus.clean(withCopies,
        "doc_id", "text", exactNearDup = true, maxShingleDf = 50))
    }
    time("D' full minus scrub+wordcount") {
      val c = graft.pipeline.CleanCorpus.cleanScoped(withCopies,
        "doc_id", "text", exactNearDup = true, maxShingleDf = 50)
      noop(c.result.select(col("doc_id"), col("quality")))
      c.release()
    }
    spark.stop()
  }
}
