package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("binned range join: inclusive bounds, multi-bin intervals, no dups") {
    val points = Seq((1L, 0L), (2L, 59L), (3L, 60L), (4L, 100L),
      (5L, 179L), (6L, 180L)).toDF("pt_id", "sec")
    // interval spans 3 bins at binWidth=60; bounds inclusive
    val intervals = Seq((100L, 59L, 179L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals,
      "sec", "lo", "hi", binWidth = 60)
      .select("pt_id").as[Long].collect().sorted
    assert(got === Array(2L, 3L, 4L, 5L))
  }

  test("binned join matches naive join on seeded random intervals") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
        .toDF("pt_id", "sec")
      val ivs = (1 to 40).map { i =>
        val lo = rnd.nextInt(1000).toLong
        (i.toLong + 1000, lo, lo + rnd.nextInt(200).toLong)
      }.toDF("iv_id", "lo", "hi")
      for (bw <- Seq(7L, 64L, 1000L)) {
        val binned = RangeJoin.pointInInterval(points, ivs, "sec", "lo", "hi", bw)
          .select("pt_id", "iv_id")
        val naive = points
          .join(ivs, col("sec") >= col("lo") && col("sec") <= col("hi"))
          .select("pt_id", "iv_id")
        assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
          s"seed $seed binWidth $bw")
      }
    }
  }

  test("interval overlap join: exactly-once pairs, inclusive bounds, " +
      "matches the naive overlap join on seeded random intervals") {
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val as = (1 to 120).map { i =>
        val lo = rnd.nextInt(1000).toLong
        (i.toLong, lo, lo + rnd.nextInt(300).toLong)
      }.toDF("a_id", "a_lo", "a_hi")
      val bs = (1 to 90).map { i =>
        val lo = rnd.nextInt(1000).toLong
        (i.toLong + 1000, lo, lo + rnd.nextInt(150).toLong)
      }.toDF("b_id", "b_lo", "b_hi")
      for (bw <- Seq(13L, 128L, 2000L)) {
        val binned = RangeJoin.intervalOverlap(as, bs,
          "a_lo", "a_hi", "b_lo", "b_hi", bw).select("a_id", "b_id")
        val naive = as.join(bs,
          col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
          .select("a_id", "b_id")
        // exceptAll both ways ALSO proves exactly-once: a pair
        // emitted twice by the binned side would survive the first
        // exceptAll against the naive join's single copy
        assert(binned.exceptAll(naive).isEmpty &&
          naive.exceptAll(binned).isEmpty, s"seed $seed binWidth $bw")
      }
    }
  }

  test("interval overlap join: bin-key equi-join plan, no nested loop") {
    val as = Seq((1L, 0L, 100L)).toDF("a_id", "a_lo", "a_hi")
    val bs = Seq((2L, 50L, 150L)).toDF("b_id", "b_lo", "b_hi")
    val plan = RangeJoin.intervalOverlap(as, bs,
      "a_lo", "a_hi", "b_lo", "b_hi", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("binned range join matches the naive BETWEEN join on events") {
    val e = Tables.events(spark, sf).select(col("event_id"),
      unix_timestamp(col("ts")).as("sec"))
    val hot = e.limit(40).select(col("event_id").as("hot_id"),
      (col("sec") - 90).as("lo"), (col("sec") + 90).as("hi"))
    val binned = RangeJoin.pointInInterval(e, hot, "sec", "lo", "hi", 60)
      .select("event_id", "hot_id")
    val naive = e.join(hot, col("sec") >= col("lo") && col("sec") <= col("hi"))
      .select("event_id", "hot_id")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // and the binned plan must not be a nested-loop/cartesian join
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"expected equi-join plan:\n$plan")
  }
}
