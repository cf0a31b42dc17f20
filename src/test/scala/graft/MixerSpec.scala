package graft

import graft.pipeline.Mixer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixerSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("stratified sample hits requested per-source proportions, deterministic") {
    val fr = Map("src0" -> 0.8, "src1" -> 0.2) // others default to 0
    val s1 = Mixer.stratifiedSample(docs, "doc_id", "source", fr, seed = 7)
    val s2 = Mixer.stratifiedSample(docs, "doc_id", "source", fr, seed = 7)
    // deterministic: identical row sets across runs
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val counts = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("src0", "src1"))) // zero-rate strata dropped
    val r0 = counts.getOrElse("src0", 0L).toDouble / totals("src0")
    val r1 = counts.getOrElse("src1", 0L).toDouble / totals("src1")
    assert(math.abs(r0 - 0.8) < 0.15, s"src0 rate $r0")
    assert(math.abs(r1 - 0.2) < 0.15, s"src1 rate $r1")
    // different seed draws a different set
    val s3 = Mixer.stratifiedSample(docs, "doc_id", "source", fr, seed = 8)
    assert(s3.exceptAll(s1).count() > 0)
  }

  test("token budget keeps the best-quality prefix within the budget") {
    val scored = docs.withColumn("q",
      graft.functions.TextFunctions.qualityScore(col("text")))
    val take = Mixer.takeTokenBudget(scored, "doc_id", "text", "q", budget = 5000)
    val total = take.agg(sum("n_tokens")).head.getLong(0)
    assert(total <= 5000)
    assert(take.count() > 0)
    // nothing outside the kept set has strictly better quality than
    // the worst kept doc (greedy prefix property)
    val worstKept = take.agg(min("q")).head.getDouble(0)
    val bestDropped = scored.join(take.select("doc_id"), Seq("doc_id"), "left_anti")
      .agg(max("q")).head.getDouble(0)
    assert(bestDropped <= worstKept + 1e-9)
  }

  test("token budget: distributed prefix equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.withColumn("q",
      graft.functions.TextFunctions.qualityScore(col("text")))
    val w = Window.orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = scored
      .withColumn("n_tokens", graft.functions.TextFunctions
        .wordCount(col("text")).cast("long"))
      .withColumn("running_tokens", sum(col("n_tokens")).over(w))
      .filter(col("running_tokens") <= 5000)
    // default bucket (= the quality value) and a coarse quantized
    // bucket must BOTH reproduce the global-window selection exactly
    for (bucket <- Seq(None, Some(floor(col("q") * 8)))) {
      val take = Mixer.takeTokenBudget(scored, "doc_id", "text", "q",
        budget = 5000, bucketExpr = bucket)
      assert(take.exceptAll(naive).isEmpty && naive.exceptAll(take).isEmpty,
        s"bucket=$bucket")
      // the corpus-scale window must be hash-partitioned on the bucket;
      // the only single-task stage is the per-bucket offsets window,
      // whose input is one 16-byte row per distinct bucket value
      val plan = take.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(_b"), plan)
    }
  }
}
