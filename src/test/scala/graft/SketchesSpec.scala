package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = Tables.events(spark, sf).select(
    col("event_type"), col("user_id"),
    expr("unix_timestamp(ts) div 86400").as("day"))

  test("merging daily sketches equals one global sketch per group") {
    val daily = Sketches.distinctSketchTable(events, "user_id",
      Seq("event_type", "day"))
    val merged = Sketches.rollupDistinct(daily, Seq("event_type"))
      .select(col("event_type"), col("distinct_est"))
    val global = Sketches.distinctSketchTable(events, "user_id",
        Seq("event_type"))
      .select(col("event_type"),
        expr("hll_sketch_estimate(hll_sketch)").as("distinct_est"))
    // register-wise max-union is lossless: sketching the union and
    // unioning the sketches land on identical registers
    assert(merged.except(global).count() === 0)
    assert(global.except(merged).count() === 0)
  }

  test("estimate is partitioning-invariant and within tolerance of exact") {
    val est7 = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events.repartition(7), "user_id",
        Seq("event_type", "day")), Seq("event_type"))
    val est3 = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events.repartition(3), "user_id",
        Seq("event_type", "day")), Seq("event_type"))
    assert(est7.except(est3).count() === 0)
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    val bad = est7.join(exact, "event_type")
      .filter(abs(col("distinct_est").cast("double") -
        col("n_exact").cast("double")) >
        col("n_exact").cast("double") * 0.10)
    assert(bad.count() === 0)
  }
}
