package graft

import graft.operators.{Fraud, Windows}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowsSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = Tables.events(spark, sf)

  test("pane-sliced sliding agg equals the direct sliding agg") {
    val direct = Windows.slidingAgg(events, "event_type", "ts", "value", 3600, 900)
    val pane = Windows.paneSlidingAgg(events, "event_type", "ts", "value", 3600, 900)
    assert(direct.count() > 0)
    assert(direct.exceptAll(pane).isEmpty && pane.exceptAll(direct).isEmpty)
  }

  test("pane-sliced sliding agg equals direct for non-divisible shapes") {
    // gcd-pane generality: slide does not divide size (pane < slide)
    for ((size, slide) <- Seq((3600L, 1000L), (3000L, 900L), (5400L, 2400L))) {
      val direct = Windows.slidingAgg(events, "event_type", "ts", "value", size, slide)
      val pane = Windows.paneSlidingAgg(events, "event_type", "ts", "value", size, slide)
      assert(direct.exceptAll(pane).isEmpty && pane.exceptAll(direct).isEmpty,
        s"mismatch for size=$size slide=$slide")
    }
  }

  test("streaming naive sliding agg equals the pane variant (batch run)") {
    // the StreamBench "sliding" baseline must be result-identical to
    // "panes" — the benchmark's delta is then state layout alone
    val naive = Windows.streamingNaiveSlidingAgg(
      events, "event_type", "ts", "value", 3600, 900, "0 seconds")
    val pane = Windows.streamingPaneSlidingAgg(
      events, "event_type", "ts", "value", 3600, 900, "0 seconds")
    assert(naive.count() > 0)
    assert(naive.exceptAll(pane).isEmpty && pane.exceptAll(naive).isEmpty)
  }

  test("tumbling agg partitions every row into exactly one window") {
    val agg = Windows.tumblingAgg(events, "user_id", "ts", "value", 21600)
    assert(agg.agg(sum("cnt")).head.getLong(0) === events.count())
  }

  test("session agg covers all rows and respects the gap") {
    val sess = Windows.sessionAgg(events, "user_id", "ts", "value", 1800)
    assert(sess.agg(sum("cnt")).head.getLong(0) === events.count())
    // two sessions of one user never start within the gap of each other
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_start")
    val gaps = sess
      .withColumn("prev", lag(col("sess_start"), 1).over(w))
      .filter(col("prev").isNotNull && col("sess_start") - col("prev") < 1800)
    assert(gaps.count() === 0)
  }

  test("cumulative window sum is the prefix sum of window sums") {
    val cum = Windows.cumulativeWindowSum(events, "user_id", "ts", "value", 86400)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ws")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // running_sum is the exact DECIMAL prefix cast to double; re-summing the
    // DOUBLE sum_val column here can differ in the last ulp, so accumulate
    // the expected prefix in DECIMAL too and compare exactly after the cast.
    val bad = cum
      .withColumn("expect",
        sum(col("sum_val").cast(org.apache.spark.sql.types.DecimalType(38, 2)))
          .over(w).cast("double"))
      .filter(col("running_sum") =!= col("expect"))
    assert(bad.count() === 0)
  }

  test("trigger chunks: every chunk but the last has exactly maxCount rows") {
    val chunks = Windows.triggerChunks(events, "event_type", "ts", "event_id",
      "value", 86400, 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "ws")
    val bad = chunks
      .withColumn("maxChunk", max(col("chunk")).over(w))
      .filter(col("chunk") < col("maxChunk") && col("cnt") =!= 5)
    assert(bad.count() === 0)
    assert(chunks.agg(sum("cnt")).head.getLong(0) === events.count())
  }

  test("fraud alerts are exactly the windows above threshold") {
    val all = Windows.tumblingAgg(events, "user_id", "ts", "value", 86400)
    val alerts = Fraud.windowAlerts(events, "user_id", "ts", "value", 86400, 300.0)
    assert(alerts.count() ===
      all.filter(col("sum_val") > 300.0).count())
    assert(alerts.count() > 0)
  }
}
