package graft

import graft.streaming._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics of the reference jobs, driven synchronously
  * through MemoryStream batches (each addData + processAllAvailable
  * is one microbatch; the event-time watermark advances between
  * batches, which is what fires append-mode windows and event-time
  * timeouts).
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Base = 1704067200000L // 2024-01-01T00:00:00Z
  private def tx(acct: Long, amount: Double, offsetSec: Long) =
    Transaction(acct, amount, new java.sql.Timestamp(Base + offsetSec * 1000))

  private def runToSink(df: DataFrame, name: String, mode: String)(
      feed: (Int => Unit) => Unit): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try feed(_ => q.processAllAvailable())
    finally { q.processAllAvailable(); q.stop() }
    spark.table(name)
  }

  test("tumbling window alerts fire when the watermark passes window end") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
      threshold = 100.0, watermarkDelay = "5 seconds")
    val sink = runToSink(alerts, "t_alerts", "append") { step =>
      input.addData(tx(1, 60, 1), tx(1, 70, 3), tx(2, 30, 2))
      step(0)
      input.addData(tx(9, 1, 30)) // watermark → 25s, closes [0,10)
      step(0)
      input.addData(tx(9, 1, 31))
      step(0)
    }
    val rows = sink.collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L)) // only acct 1 crossed
    val r = rows.head
    assert(r.getLong(1) === Base)
    assert(math.abs(r.getDouble(2) - 130.0) < 1e-9)
  }

  test("late data beyond the watermark is dropped (out-of-order handling)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val agg = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
      threshold = 0.0, watermarkDelay = "5 seconds")
    val sink = runToSink(agg, "t_late", "append") { step =>
      input.addData(tx(1, 50, 1))
      step(0)
      input.addData(tx(2, 50, 100)) // watermark → 95s
      step(0)
      input.addData(tx(7, 999, 50)) // 45s late: dropped
      step(0)
      input.addData(tx(9, 1, 200), tx(9, 1, 201)) // close everything
      step(0)
    }
    assert(sink.filter(col("accountId") === 7).count() === 0)
    assert(sink.filter(col("accountId") === 1).count() === 1)
  }

  test("perturbed out-of-order source: end-to-end pipeline drops the " +
      "late batch, keeps the perturbed windows (reference " +
      "OutofOrderTumblingWindow semantics)") {
    implicit val sqlCtx = spark.sqlContext
    // the full reference pipeline: source → ±500 s hash perturbation →
    // 5 s watermark → tumbling sum. Because perturb() is a pure
    // projection, the EXPECTED output computes in batch mode over the
    // same rows — the stream must agree exactly.
    val phase1 = Seq(tx(1, 60, 10), tx(1, 70, 400), tx(2, 30, 200))
    val phase3 = Seq(tx(7, 999, 20), tx(7, 5, 300))
    val sizeSec = 10L

    val input = MemoryStream[Transaction]
    val piped = StreamingFraud.tumblingAlerts(
      TransactionGen.perturb(input.toDF()), sizeSec = sizeSec,
      threshold = 0.0, watermarkDelay = "5 seconds")
    val sink = runToSink(piped, "t_ooo", "append") { step =>
      input.addData(phase1: _*)
      step(0)
      // closer: perturbed ts ≥ Base+1500 s pushes the watermark past
      // every phase-1/phase-3 window end (their perturbed ts ≤
      // Base+900 s), exactly like the reference's bounded strategy
      input.addData(tx(9, 1, 2000))
      step(0)
      input.addData(phase3: _*) // every row now beyond the watermark
      step(0)
      input.addData(tx(9, 1, 4000)) // close anything still open
      step(0)
    }

    val expected = TransactionGen.perturb(phase1.toDF())
      .groupBy(col("accountId"),
        window(col("ts"), s"$sizeSec seconds").as("w"))
      .agg(sum(col("amount")).as("total"), count(lit(1)).as("cnt"))
      .select(col("accountId"), unix_millis(col("w.start")).as("windowStartMs"),
        col("total"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val got = sink.filter(col("accountId").isin(1L, 2L, 7L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got === expected)
    // the late batch died at the watermark: account 7 never emits
    assert(!got.exists(_._1 == 7L))
    // and the perturbation actually moved event time off the source
    // second marks (offsets are not multiples of 1000 ms)
    val moved = TransactionGen.perturb(phase1.toDF())
      .filter(unix_millis(col("ts")) % 1000 =!= 0).count()
    assert(moved > 0)
  }

  test("timer detector buffers per account and alerts on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.timerDetector(input.toDS(), windowSec = 5,
      threshold = 100.0, watermarkDelay = "2 seconds")
    val sink = runToSink(alerts.toDF(), "t_timer", "append") { step =>
      input.addData(tx(1, 60, 1), tx(1, 70, 2)) // timer at t=6s
      input.addData(tx(2, 10, 1)) // below threshold, timer at 6s
      step(0)
      input.addData(tx(9, 1, 60)) // watermark → 58s, fires timers
      step(0)
      input.addData(tx(9, 1, 61))
      step(0)
    }
    val rows = sink.collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L))
    assert(math.abs(rows.head.getDouble(2) - 130.0) < 1e-9)
    assert(rows.head.getLong(3) === 2L)
  }

  test("hybrid trigger fires every maxCount and a final firing on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val partials = StreamingFraud.hybridTrigger(input.toDS(), maxCount = 5,
      timeoutSec = 10, watermarkDelay = "2 seconds")
    val sink = runToSink(partials.toDF(), "t_hybrid", "append") { step =>
      input.addData((1 to 12).map(i => tx(1, i.toDouble, i)): _*)
      step(0)
      input.addData(tx(9, 1, 100)) // watermark → 98s: final fire of the rest
      step(0)
      input.addData(tx(9, 1, 101))
      step(0)
    }
    val acct1 = sink.filter(col("accountId") === 1).collect()
      .map(r => (r.getLong(1), r.getBoolean(3))).sortBy(_.toString)
    // 12 elements, maxCount 5 → two early FIRE_AND_PURGE of 5, final 2
    assert(acct1.count(!_._2) === 2)
    assert(acct1.filter(!_._2).forall(_._1 === 5L))
    assert(acct1.filter(_._2).map(_._1).sum === 2L)
  }

  test("windowed aggregation runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Transaction]
      val alerts = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
        threshold = 100.0, watermarkDelay = "5 seconds")
      val sink = runToSink(alerts, "t_rocks", "append") { step =>
        input.addData(tx(1, 200, 1))
        step(0)
        input.addData(tx(9, 1, 30))
        step(0)
        input.addData(tx(9, 1, 31))
        step(0)
      }
      assert(sink.filter(col("accountId") === 1).count() === 1)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transaction generator produces bounded deterministic fields") {
    val df = TransactionGen.stream(spark, rowsPerSecond = 100)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq === Seq("accountId", "amount", "ts"))
  }

  test("alert sink appends batches to parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
      threshold = 100.0, watermarkDelay = "5 seconds")
    val q = GraftStreams.parquetAlertSink(alerts, s"$dir/out", s"$dir/ckpt")
    try {
      input.addData(tx(1, 200, 1))
      q.processAllAvailable()
      input.addData(tx(9, 1, 30))
      q.processAllAvailable()
      input.addData(tx(9, 1, 31))
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.parquet(s"$dir/out")
    assert(written.filter(col("accountId") === 1).count() === 1)
  }

  test("alert sink is replay-idempotent: a retried batch does not duplicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_retry").toString
    val batch = spark.range(5).select(col("id").as("accountId"),
      (col("id") * 10.0).as("total"))
    GraftStreams.writeAlertBatch(batch, 0L, s"$dir/out")
    GraftStreams.writeAlertBatch(batch, 0L, s"$dir/out") // simulated retry
    GraftStreams.writeAlertBatch(batch, 1L, s"$dir/out") // a distinct batch
    val written = spark.read.parquet(s"$dir/out")
    assert(written.count() === 10) // 5 per batch, retry replaced batch 0
    assert(written.filter(col("batch_id") === 0).count() === 5)
  }

  test("streaming CDC apply maintains a snapshot across batches, " +
      "retries idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val input = MemoryStream[(Long, String, String)]
    val q = GraftStreams.cdcSnapshotSink(
      input.toDF().toDF("doc_id", "text", "op"),
      s"$dir/snap", s"$dir/ckpt", "doc_id", "op")
    try {
      input.addData((1L, "one", "I"), (2L, "two", "I"), (3L, "three", "I"))
      q.processAllAvailable()
      input.addData((2L, "two v2", "U"), (3L, null, "D"), (4L, "four", "I"))
      q.processAllAvailable()
    } finally q.stop()
    // v=0 holds the first batch, v=1 the folded state
    val v0 = spark.read.parquet(s"$dir/snap/v=0")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v0 === Map(1L -> "one", 2L -> "two", 3L -> "three"))
    val v1 = spark.read.parquet(s"$dir/snap/v=1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 === Map(1L -> "one", 2L -> "two v2", 4L -> "four"))
    // a RETRY of batch 1 folds from v=0 again — byte-stable result
    val retry = Seq((2L, "two v2", "U"), (3L, null.asInstanceOf[String], "D"),
      (4L, "four", "I")).toDF("doc_id", "text", "op")
    GraftStreams.applyCdcBatch(retry, 1L, s"$dir/snap", "doc_id", "op")
    val v1b = spark.read.parquet(s"$dir/snap/v=1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1b === v1)
  }

  test("windowed distinct users via HLL state stays within tolerance " +
      "and exact counts stay exact") {
    // the sketch-table pattern under streaming state: per-window
    // approx_count_distinct keeps HLL registers in the state store
    // (constant bytes per window however many users), beside an exact
    // count for the spec to gate against. Append mode: windows emit
    // once the watermark passes.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val agg = input.toDF()
      .withWatermark("ts", "2 seconds")
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(approx_count_distinct(col("accountId"), 0.02).as("n_est"),
        count(lit(1)).as("n_rows"))
      .select(unix_millis(col("w.start")).as("ws"), col("n_est"),
        col("n_rows"))
    val sink = runToSink(agg, "t_hll_win", "append") { step =>
      // window [0,10): accounts 1..40, two events each
      input.addData((1 to 40).flatMap(a =>
        Seq(tx(a, 1.0, a % 5), tx(a, 2.0, (a % 5) + 4))): _*)
      step(0)
      input.addData(tx(9, 1, 30)) // watermark -> 28s: close [0,10)
      step(0)
      input.addData(tx(9, 1, 31))
      step(0)
    }
    val w0 = sink.filter(col("ws") === Base).head
    assert(w0.getLong(2) === 80L, "exact row count must be exact")
    // 2%-rsd sketch, 5-sigma tolerance: 40 ± 4
    assert(math.abs(w0.getLong(1) - 40L) <= 4,
      s"distinct estimate out of tolerance: ${w0.getLong(1)}")
  }

  test("vacuum keeps the newest snapshot versions and reports the rest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toString
    (0L to 4L).foreach { v =>
      Seq((v, s"text$v")).toDF("doc_id", "text")
        .write.parquet(s"$dir/snap/v=$v")
    }
    val deleted = graft.pipeline.Snapshots.vacuumVersions(
      spark, s"$dir/snap", keepLast = 2)
    assert(deleted === Seq(0L, 1L, 2L))
    val left = new java.io.File(s"$dir/snap").listFiles()
      .map(_.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(left === Seq("v=3", "v=4"))
    // latest version still reads cleanly after retention
    assert(spark.read.parquet(s"$dir/snap/v=4").count() === 1)
    // vacuum of a missing table is a no-op, not an error
    assert(graft.pipeline.Snapshots.vacuumVersions(
      spark, s"$dir/absent", 1) === Nil)
  }

  test("sliding window means emit per-slide panes (reference pane slicing)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val means = StreamingFraud.slidingMeans(input.toDF(), sizeSec = 10,
      slideSec = 5, watermarkDelay = "5 seconds")
    val sink = runToSink(means, "t_slide", "append") { step =>
      input.addData(tx(1, 10, 6), tx(1, 30, 8)) // windows [0,10) [5,15)
      step(0)
      input.addData(tx(9, 1, 60))
      step(0)
      input.addData(tx(9, 1, 61))
      step(0)
    }
    val acct1 = sink.filter(col("accountId") === 1).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(acct1.keySet === Set(Base, Base + 5000))
    assert(math.abs(acct1(Base) - 20.0) < 1e-9) // (10+30)/2
    assert(math.abs(acct1(Base + 5000) - 20.0) < 1e-9)
  }

  test("stream-static enrichment join attaches dimension attributes") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("accountId"), col("c_mktsegment"))
    val input = MemoryStream[Transaction]
    val enriched = input.toDF().join(broadcast(dim), Seq("accountId"))
      .groupBy(col("c_mktsegment")).agg(sum(col("amount")).as("total"))
    val q = enriched.writeStream.format("memory").queryName("t_enrich")
      .outputMode("complete").start()
    try {
      input.addData(tx(1, 100, 1), tx(2, 50, 2))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_enrich").collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(1)).sum - 150.0) < 1e-9)
  }

  test("metrics listener records throughput and latency per query") {
    implicit val sqlCtx = spark.sqlContext
    val metrics = Metrics.attach(spark)
    try {
      val input = MemoryStream[Transaction]
      val agg = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
        threshold = 0.0, watermarkDelay = "5 seconds")
      val q = agg.writeStream.format("memory").queryName("t_metrics")
        .outputMode("append").start()
      try {
        input.addData(tx(1, 10, 1), tx(2, 20, 2))
        q.processAllAvailable()
        input.addData(tx(9, 1, 30))
        q.processAllAvailable()
      } finally q.stop()
      // listener events are delivered asynchronously
      var waited = 0
      while (!metrics.gauges.containsKey("t_metrics") && waited < 50) {
        Thread.sleep(100); waited += 1
      }
      val (_, processed, duration) = metrics.gauges.get("t_metrics")
      assert(processed >= 0.0)
      assert(duration >= 0L)
    } finally spark.streams.removeListener(metrics)
  }

  test("stream-stream interval join matches events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val inA = MemoryStream[Transaction]
    val inB = MemoryStream[Transaction]
    val a = inA.toDF().select(col("accountId").as("a_acct"),
      col("amount").as("a_amount"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "5 seconds")
    val b = inB.toDF().select(col("accountId").as("b_acct"),
      col("amount").as("b_amount"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "5 seconds")
    val joined = a.join(b,
      col("a_acct") === col("b_acct") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 seconds"))
    val q = joined.writeStream.format("memory").queryName("t_ssj")
      .outputMode("append").start()
    try {
      inA.addData(tx(1, 100, 0), tx(2, 5, 0))
      inB.addData(tx(1, 7, 4))   // within 10s of a(1) -> match
      inB.addData(tx(2, 9, 30))  // 30s after a(2) -> no match
      q.processAllAvailable()
      inA.addData(tx(9, 1, 100)); inB.addData(tx(9, 1, 100))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_ssj").collect()
    assert(rows.exists(r => r.getLong(0) === 1L && r.getDouble(4) === 7.0))
    assert(!rows.exists(r => r.getLong(0) === 2L))
  }

  test("timer detector runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Transaction]
      val alerts = StreamingFraud.timerDetector(input.toDS(), windowSec = 5,
        threshold = 100.0, watermarkDelay = "2 seconds")
      val sink = runToSink(alerts.toDF(), "t_timer_rocks", "append") { step =>
        input.addData(tx(1, 200, 1))
        step(0)
        input.addData(tx(9, 1, 60))
        step(0)
        input.addData(tx(9, 1, 61))
        step(0)
      }
      assert(sink.filter(col("accountId") === 1).count() === 1)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state schema evolution: a v2 processor with an added state " +
      "field restarts from a v1 checkpoint (Avro encoding)") {
    // the Flink-savepoint upgrade story (stop v1, restart v2 on the
    // same state): requires RocksDB provider + Avro state encoding
    // from the FIRST run; v2's appended Option field decodes as None
    // for v1-written keys. See streaming/StateEvolution.scala.
    val prevProv =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevEnc =
      spark.conf.getOption("spark.sql.streaming.stateStore.encodingFormat")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Transaction]
      val dir =
        java.nio.file.Files.createTempDirectory("graft_evolve").toString
      val buf =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def start(counts: org.apache.spark.sql.Dataset[
          StateEvolution.AcctCount]) =
        counts.writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[StateEvolution.AcctCount],
             _: Long) =>
              df.collect().foreach(c => buf.add((c.accountId, c.count)))
          }
          .start()
      val q1 = start(StateEvolution.countsV1(input.toDS()))
      try {
        input.addData(tx(1, 10, 1), tx(1, 20, 2), tx(2, 5, 3))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(buf.contains((1L, 2L)) && buf.contains((2L, 1L)),
        s"v1 must count before the upgrade; got $buf")

      // restart the SAME checkpoint under the evolved state schema
      val q2 = start(StateEvolution.countsV2(input.toDS()))
      try {
        input.addData(tx(1, 30, 4))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(buf.contains((1L, 3L)),
        s"v2 must continue v1's recovered count (2 -> 3); got $buf")
    } finally {
      prevProv match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
      prevEnc match {
        case Some(e) => spark.conf
          .set("spark.sql.streaming.stateStore.encodingFormat", e)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.encodingFormat")
      }
    }
  }

  test("streaming dedup within watermark drops duplicate event ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    // accountId doubles as the event id for dedup purposes here
    val deduped = input.toDF()
      .withWatermark("ts", "5 seconds")
      .dropDuplicatesWithinWatermark("accountId")
    val q = deduped.writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try {
      input.addData(tx(1, 10, 1), tx(1, 99, 2), tx(2, 20, 1))
      q.processAllAvailable()
      input.addData(tx(1, 77, 3)) // still within watermark -> dropped
      q.processAllAvailable()
      input.addData(tx(9, 1, 60))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_dedup").collect()
    assert(rows.count(_.getLong(0) == 1L) === 1)
    assert(rows.count(_.getLong(0) == 2L) === 1)
  }

  test("running totals accumulate across micro-batches (state merge)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val totals = StreamingFraud.runningTotals(input.toDS()).toDF()
      .select(col("_1").as("acct"), col("_2").as("total"), col("_3").as("cnt"))
    val q = totals.writeStream.format("memory").queryName("t_running")
      .outputMode("update").start()
    try {
      input.addData(tx(1, 100, 1), tx(1, 50, 2))
      q.processAllAvailable()
      input.addData(tx(1, 25, 3)) // next batch: state must carry 150
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("t_running").filter(col("acct") === 1)
      .orderBy(col("cnt").desc).head
    assert(math.abs(last.getDouble(1) - 175.0) < 1e-9)
    assert(last.getLong(2) === 3L)
  }

  test("z-score detector alerts on per-account deviation, not absolute size") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.zScoreDetector(input.toDS(),
      zThreshold = 3.0, minSamples = 10).toDF()
    val q = alerts.writeStream.format("memory").queryName("t_zscore")
      .outputMode("append").start()
    try {
      // acct 1: tight distribution around 100 (sd ~ 1.7); acct 2:
      // consistently HUGE amounts — absolute size must not alert
      input.addData((1 to 12).map(i =>
        tx(1, 100 + (i % 3), i.toLong)): _*)
      q.processAllAvailable()
      // second batch: state carried across batches — a 120 on acct 1
      // is >3 sd from ITS history; 50200 on acct 2 is within ITS noise
      input.addData((1 to 12).map(i =>
        tx(2, 50000 + 100 * (i % 3), i.toLong)): _*)
      q.processAllAvailable()
      input.addData(tx(1, 120, 20), tx(2, 50200, 20))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_zscore").collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L), rows.mkString(","))
    val r = rows.head
    assert(math.abs(r.getDouble(2) - 120.0) < 1e-9)
    assert(r.getLong(3) > 3000L) // z in milli units, > 3.000 sd
    // warm-up respected: 12 in-distribution rows produced no alerts
    assert(rows.length === 1)
  }

  test("in-order streams work with a zero-delay (ascending) watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val agg = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
      threshold = 0.0, watermarkDelay = "0 seconds")
    val sink = runToSink(agg, "t_inorder", "append") { step =>
      input.addData(tx(1, 5, 1), tx(1, 5, 9))
      step(0)
      input.addData(tx(2, 1, 10)) // watermark reaches 10s exactly
      step(0)
      input.addData(tx(2, 1, 11))
      step(0)
    }
    assert(sink.filter(col("accountId") === 1).count() === 1)
  }

  test("pending timer fires before same-batch data, clearing the buffer") {
    // mirrors the reference: onTimer clears ALL state (FraudDetector
    // .java:114-118); a later transaction starts a fresh buffer. The
    // expired window is flushed either by the timeout path (key got no
    // data that batch) or by the data-path flush in timerDetector.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.timerDetector(input.toDS(), windowSec = 5,
      threshold = 100.0, watermarkDelay = "2 seconds")
    val sink = runToSink(alerts.toDF(), "t_timerclear", "append") { step =>
      input.addData(tx(1, 60, 1), tx(1, 70, 2)) // sum 130, timer at 6s
      step(0)
      input.addData(tx(9, 1, 100)) // watermark -> 98s (past the timer)
      step(0)
      // same key, same batch as the expired timer: the old buffer must
      // alert (130) and THEN this event starts a fresh buffer (50)
      input.addData(tx(1, 50, 99))
      step(0)
      input.addData(tx(9, 1, 200))
      step(0)
      input.addData(tx(9, 1, 201))
      step(0)
    }
    val acct1 = sink.filter(col("accountId") === 1).collect()
    assert(acct1.length === 1) // fresh 50-buffer stays below threshold
    assert(math.abs(acct1.head.getDouble(2) - 130.0) < 1e-9)
    assert(acct1.head.getLong(1) === Base + 1000)
  }

  test("per-element timers: a pending timer fires over records buffered after a clear") {
    // reference FraudDetector.java:83 arms a timer at EVERY element's
    // ts+5s and onTimer clears the buffer but not the other timers.
    // Distinguishing scenario: acct 1 tx at t=0(60) and t=3(70) arm
    // timers {5s, 8s}. Timer@5 fires window [0,5) → alert(ws=0, 130).
    // A tx at t=7(120) lands in the cleared buffer; the STILL-ARMED
    // timer@8 (from the t=3 element) fires window [3,8) → alert(ws=3,
    // 120). An earliest-only emulation would instead re-anchor at
    // 7+5=12 and emit ws=7 — this spec pins the reference behavior.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.perElementTimerDetector(input.toDS(),
      windowSec = 5, threshold = 100.0, watermarkDelay = "2 seconds")
    val sink = runToSink(alerts.toDF(), "t_perelem", "append") { step =>
      input.addData(tx(1, 60, 0), tx(1, 70, 3)) // timers {5, 8}
      step(0)
      input.addData(tx(9, 1, 8)) // wm → 6 > 5: timer@5 fires [0,5) = 130
      step(0)
      input.addData(tx(1, 120, 7)) // buffered after the clear; timers {8, 12}
      step(0)
      input.addData(tx(9, 1, 11)) // wm → 9 > 8: timer@8 fires [3,8) = {7:120}
      step(0)
      input.addData(tx(9, 1, 20)) // wm → 18: timer@12 fires empty buffer
      step(0)
    }
    val acct1 = sink.filter(col("accountId") === 1).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._1)
    assert(acct1.toSeq === Seq((Base, 130.0, 2L), (Base + 3000, 120.0, 1L)))
  }

  test("transformWithState detector reproduces the per-element-timer " +
      "semantics through the native timer service") {
    // identical feed and expectations as the flatMapGroupsWithState
    // emulation above: the native multi-timer service must drain
    // expired timers in event-time order, later firings seeing the
    // buffer cleared by earlier ones. transformWithState requires the
    // RocksDB provider (as the reference requires its RocksDB backend).
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Transaction]
      val alerts = StreamingFraud.timerDetectorTws(input.toDS(),
        windowSec = 5, threshold = 100.0, watermarkDelay = "2 seconds")
      val sink = runToSink(alerts.toDF(), "t_tws", "append") { step =>
        input.addData(tx(1, 60, 0), tx(1, 70, 3)) // timers {5, 8}
        step(0)
        input.addData(tx(9, 1, 8)) // wm → 6 > 5: timer@5 fires [0,5) = 130
        step(0)
        input.addData(tx(1, 120, 7)) // buffered after the clear; timers {8, 12}
        step(0)
        input.addData(tx(9, 1, 11)) // wm → 9 > 8: timer@8 fires [3,8) = {7:120}
        step(0)
        input.addData(tx(9, 1, 20)) // wm → 18: timer@12 fires empty buffer
        step(0)
      }
      val acct1 = sink.filter(col("accountId") === 1).collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._1)
      assert(acct1.toSeq === Seq((Base, 130.0, 2L), (Base + 3000, 120.0, 1L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("tws min-timer coalescing is alert-equivalent to the GroupState " +
      "emulation on a randomized multi-batch feed") {
    // the coalesced pending-set design (one armed native timer per
    // key) must reproduce the per-element-timer semantics on feeds it
    // was never hand-traced on: seeded pseudo-random amounts/offsets
    // across 6 keys and 8 micro-batches, including out-of-order rows
    // inside the 2 s lateness allowance, watermark jumps that expire
    // SEVERAL timers at once, and post-clear arrivals under
    // still-armed timers. Both detectors consume the identical feed;
    // the full alert multisets must match.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val rng = new scala.util.Random(20260815L)
      // batches of (acct, amount, offsetSec); offsets drift forward so
      // watermarks advance, with +-2s jitter for out-of-orderness
      val batches = (0 until 8).map { b =>
        (0 until 25).map { _ =>
          val base = b * 7
          tx(rng.nextInt(6).toLong, (rng.nextInt(12) * 10).toDouble,
            math.max(0, base + rng.nextInt(7) - 2).toLong)
        }
      }
      def run(name: String,
              mk: org.apache.spark.sql.Dataset[Transaction] =>
                org.apache.spark.sql.Dataset[graft.streaming.Alert]) = {
        val input = MemoryStream[Transaction]
        val sink = runToSink(mk(input.toDS()).toDF(), name, "append") { step =>
          batches.foreach { rows => input.addData(rows: _*); step(0) }
          input.addData(tx(99, 1, 200)) // close every window
          step(0)
        }
        sink.collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 100), r.getLong(3)))
          .toSeq.sorted
      }
      val emulated = run("t_eq_emul",
        StreamingFraud.perElementTimerDetector(_, windowSec = 5,
          threshold = 150.0, watermarkDelay = "2 seconds"))
      val native = run("t_eq_tws",
        StreamingFraud.timerDetectorTws(_, windowSec = 5,
          threshold = 150.0, watermarkDelay = "2 seconds"))
      assert(emulated.nonEmpty, "feed should produce alerts")
      assert(native === emulated)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming pane-sliced sliding agg matches batch sliding agg (2 state stores)") {
    // the reference's pane state layout (CustomSlidingWindow.java:
    // 25-127) run natively in Structured Streaming: tumbling pane
    // partials in state store 1, window re-agg of panes in store 2
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val data = Seq(tx(1, 10, 6), tx(1, 30, 8), tx(1, 5, 12), tx(2, 7, 3))
    val paned = graft.operators.Windows.streamingPaneSlidingAgg(
      input.toDF(), "accountId", "ts", "amount",
      sizeSec = 10, slideSec = 5, watermarkDelay = "5 seconds")
    var planStr = ""
    val q = paned.writeStream.format("memory").queryName("t_panes")
      .outputMode("append").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData(tx(9, 1, 60)) // watermark → 55s closes all windows
      q.processAllAvailable()
      input.addData(tx(9, 1, 61))
      q.processAllAvailable()
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { q.explain() }
      planStr = out.toString
    } finally q.stop()
    // pane layout evidence: exactly two stateful aggregations
    assert(planStr.linesIterator.count(_.contains("StateStoreSave")) === 2,
      planStr)

    val got = spark.table("t_panes")
      .filter(col("accountId") === 1)
      .select("accountId", "ws", "sum_val", "cnt", "mean_cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSet
    val expected = graft.operators.Windows.slidingAgg(
      data.toDF(), "accountId", "ts", "amount", sizeSec = 10, slideSec = 5)
      .filter(col("accountId") === 1)
      .select("accountId", "ws", "sum_val", "cnt", "mean_cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("key receiving data every batch still flushes its expired window") {
    // Spark fires a key's event-time timeout only in batches where that
    // key receives no data, so a hot key that never goes quiet must have
    // its expired window flushed in the DATA path — otherwise the old
    // code re-armed a timer below the watermark and the query died with
    // IllegalArgumentException (reference FraudDetector.java:83 fires
    // per-element timers regardless of further traffic).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.timerDetector(input.toDS(), windowSec = 5,
      threshold = 100.0, watermarkDelay = "2 seconds")
    val sink = runToSink(alerts.toDF(), "t_timerhot", "append") { step =>
      input.addData(tx(1, 60, 1), tx(1, 70, 2)) // buffer 130, timer at 6s
      step(0)
      input.addData(tx(1, 5, 50), tx(9, 1, 100)) // key 1 keeps receiving;
      step(0)                                    // wm → 98s after this batch
      // wm now 98s > timer 6s, and key 1 gets data in the SAME batch:
      // the 135-buffer must flush as an alert and a fresh buffer start
      input.addData(tx(1, 150, 99))
      step(0)
      input.addData(tx(9, 1, 200))
      step(0)
      input.addData(tx(9, 1, 201)) // wm → 198s fires the fresh buffer
      step(0)
    }
    val acct1 = sink.filter(col("accountId") === 1).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(acct1.length === 2, s"got ${acct1.mkString(",")}")
    assert(acct1(0) === ((Base + 1000, 135.0)))
    assert(acct1(1) === ((Base + 99000, 150.0)))
  }

  test("alert sink recovers from its checkpoint: stop/restart is exactly-once") {
    // the RocksDB/HDFS state + offset log in the checkpoint dir must
    // carry a stopped query across a restart with no re-emitted and no
    // lost alerts (reference: RocksDB-backed state surviving restarts)
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_recover").toString
    val input = MemoryStream[Transaction]
    val alerts = StreamingFraud.tumblingAlerts(input.toDF(), sizeSec = 10,
      threshold = 100.0, watermarkDelay = "5 seconds")
    val q1 = GraftStreams.parquetAlertSink(alerts, s"$dir/out", s"$dir/ckpt")
    try {
      input.addData(tx(1, 200, 1)) // acct 1 in window [0,10)
      q1.processAllAvailable()
      input.addData(tx(9, 1, 30)) // watermark 25s closes it → alert
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$dir/out")
      .filter(col("accountId") === 1).count() === 1)

    // restart from the same checkpoint, stream continues
    input.addData(tx(2, 300, 41), tx(9, 1, 70)) // acct 2 in [40,50), closed
    val q2 = GraftStreams.parquetAlertSink(alerts, s"$dir/out", s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()

    val written = spark.read.parquet(s"$dir/out")
    assert(written.filter(col("accountId") === 1).count() === 1,
      "restart must not re-emit the pre-stop alert")
    assert(written.filter(col("accountId") === 2).count() === 1,
      "post-restart data must flow through recovered state")
  }

  test("streaming top-k keeps a bounded per-key leaderboard across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val board = StreamingTopK.topKAmounts(input.toDS(), k = 3)
    val sink = runToSink(board.toDF(), "t_topk", "update") { step =>
      input.addData(tx(1, 10, 1), tx(1, 50, 2), tx(1, 30, 3), tx(1, 20, 4))
      step(0)
      // 40 enters, evicting 20; 5 must not displace anything
      input.addData(tx(1, 40, 5), tx(1, 5, 6))
      step(0)
    }
    // update-mode memory sink keeps every batch's emission:
    // batch 1 board = 50,30,20; batch 2 board = 50,40,30
    val rows = sink.collect()
    assert(rows.forall(_.getInt(1) <= 3), "state must stay bounded at k")
    val forty = rows.filter(_.getDouble(2) == 40.0)
    assert(forty.length === 1 && forty.head.getInt(1) === 2,
      "40 must enter the merged board at rank 2")
    assert(rows.count(_.getDouble(2) == 20.0) === 1,
      "evicted entry must not be re-emitted after batch 1")
    assert(!rows.exists(_.getDouble(2) == 5.0),
      "a sub-board amount must never appear")
    assert(rows.filter(_.getInt(1) == 1).forall(_.getDouble(2) == 50.0))
  }

  test("streaming session windows close on gap timeout and merge " +
      "overlapping activity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Transaction]
    // same session_window aggregation as the batch sessionAgg
    // (Windows.scala), run as a stream: a session emits when the
    // watermark passes its (last event + gap) end
    val sessions = input.toDF()
      .withWatermark("ts", "2 seconds")
      .groupBy(col("accountId"),
        session_window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("n_tx"), sum(col("amount")).as("total"))
      .select(col("accountId"), col("n_tx"), col("total"))
    val sink = runToSink(sessions, "t_sess", "append") { step =>
      // events 1s,5s,12s chain into ONE session (gaps < 10s) even
      // though 1→12 exceeds the gap; account 2 is a separate session
      input.addData(tx(1, 10, 1), tx(1, 20, 5), tx(1, 30, 12), tx(2, 7, 3))
      step(0)
      // watermark far past 12s+10s → both sessions close
      input.addData(tx(9, 1, 60))
      step(0)
      input.addData(tx(9, 1, 90)) // close account 9's session too
      step(0)
    }
    val rows = sink.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 3L, 60.0)),
      s"chained events must merge into one session: $rows")
    assert(rows.contains((2L, 1L, 7.0)))
  }

  test("stream-stream LEFT OUTER interval join emits unmatched rows " +
      "once state can expire") {
    implicit val sqlCtx = spark.sqlContext
    val inA = MemoryStream[Transaction]
    val inB = MemoryStream[Transaction]
    val a = inA.toDF().select(col("accountId").as("a_acct"),
      col("amount").as("a_amount"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "5 seconds")
    val b = inB.toDF().select(col("accountId").as("b_acct"),
      col("amount").as("b_amount"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "5 seconds")
    val joined = a.join(b,
      col("a_acct") === col("b_acct") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 seconds"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("t_ssj_lo")
      .outputMode("append").start()
    try {
      inA.addData(tx(1, 100, 0), tx(2, 5, 0))
      inB.addData(tx(1, 7, 4)) // matches a(1); a(2) never matches
      q.processAllAvailable()
      // watermark must pass a_ts + 10s + delay before the unmatched
      // left row can be emitted with nulls
      inA.addData(tx(9, 1, 60)); inB.addData(tx(9, 1, 60))
      q.processAllAvailable()
      inA.addData(tx(9, 1, 90)); inB.addData(tx(9, 1, 90))
      q.processAllAvailable()
    } finally { q.processAllAvailable(); q.stop() }
    val rows = spark.table("t_ssj_lo").collect()
    val matched = rows.filter(r => !r.isNullAt(4))
    assert(matched.exists(r => r.getLong(0) == 1 && r.getDouble(4) == 7.0),
      "in-interval pair must join")
    val unmatchedAccts = rows.filter(_.isNullAt(4)).map(_.getLong(0)).toSet
    assert(unmatchedAccts.contains(2L),
      s"expired unmatched left row must emit with nulls, got " +
        rows.mkString("; "))
  }

  test("streaming exact dedup drops in-horizon duplicates, evicts " +
      "state past the watermark, re-admits after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val ts = (sec: Long) => new java.sql.Timestamp(Base + sec * 1000)
    val docs = StreamingDedup.exactDedupStream(
      input.toDF().toDF("ts", "text"), "ts", "text",
      watermarkDelay = "10 seconds")
    val sink = runToSink(docs, "t_dedup", "append") { step =>
      // same text twice in one batch + again in the next, in-horizon
      input.addData(ts(1) -> "alpha doc", ts(2) -> "alpha doc",
        ts(3) -> "beta doc")
      step(0)
      input.addData(ts(5) -> "alpha doc")
      step(0)
      // advance the watermark far past 1s+10s → alpha's state evicts
      input.addData(ts(100) -> "gamma doc")
      step(0)
      // re-arrival AFTER eviction is emitted again (bounded-horizon
      // contract), and is itself dedup state for what follows
      input.addData(ts(101) -> "alpha doc", ts(102) -> "alpha doc")
      step(0)
    }
    val texts = sink.collect().map(r => (r.getTimestamp(0).getTime -
      Base) / 1000 -> r.getString(1))
    assert(texts.count(_._2 == "alpha doc") === 2,
      s"one pre-eviction + one post-eviction emission, got $texts")
    assert(texts.contains(1L -> "alpha doc") &&
      texts.contains(101L -> "alpha doc"))
    assert(texts.count(_._2 == "beta doc") === 1)
    assert(texts.count(_._2 == "gamma doc") === 1)
  }
}
