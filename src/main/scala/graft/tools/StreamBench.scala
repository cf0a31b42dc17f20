package graft.tools

import graft.GraftSession
import graft.streaming.{Metrics, StreamingDedup, StreamingFraud, TransactionGen}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput benchmark: rate-source transactions through
  * the full fraud pipeline (watermark → tumbling window sum →
  * threshold alerts) for a fixed wall-clock budget, reporting
  * processed rows/sec from the engine's own progress metrics.
  *
  * Context: the reference's TransactionStreamSource emits one
  * transaction per 100 ms sleep (~10 tx/s single-node,
  * TransactionStreamSource.java:34); this pipeline sustains 6-7
  * orders of magnitude more on one node.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerSec = args.headOption.map(_.toInt).getOrElse(2000000)
    val seconds = args.lift(1).map(_.toInt).getOrElse(20)
    // pipeline under test: "tumbling" (default, the fraud pipeline),
    // "sliding" (naive size/slide window explode), or "panes"
    // (streamingPaneSlidingAgg) — sliding vs panes on the same
    // size/slide measures the pane state layout's win directly.
    val pipeline = args.lift(2).getOrElse("tumbling")
    val b0 = GraftSession.builder(appName = "graft-streambench")
    // transformWithState requires the RocksDB provider (and "timer"
    // runs on it too so the tws comparison isolates the API, not the
    // state store)
    val spark = (if (pipeline == "tws" || pipeline == "timer" ||
        pipeline == "ooo")
      graft.streaming.GraftStreams.withRocksDBState(b0) else b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val metrics = Metrics.attach(spark)
    val tx = TransactionGen.stream(spark, rowsPerSecond = rowsPerSec, accounts = 1000)
    val alerts = pipeline match {
      case "sliding" =>
        // same decimal arithmetic as "panes" — the delta isolates the
        // per-row window-state replication, not the aggregate cost
        graft.operators.Windows.streamingNaiveSlidingAgg(tx, "accountId",
          "ts", "amount", sizeSec = 60, slideSec = 5,
          watermarkDelay = "2 seconds")
      case "panes" =>
        graft.operators.Windows.streamingPaneSlidingAgg(tx, "accountId",
          "ts", "amount", sizeSec = 60, slideSec = 5,
          watermarkDelay = "2 seconds")
      case "timer" =>
        // per-element timer detector, GroupState emulation: pending
        // fire-time list managed in user state
        StreamingFraud.perElementTimerDetector(
          tx.as[graft.streaming.Transaction](
            org.apache.spark.sql.Encoders.product),
          windowSec = 5, threshold = 1e12, watermarkDelay = "2 seconds")
          .toDF()
      case "tws" =>
        // same detector on transformWithState's native timer service
        // (requires the RocksDB provider GraftSession already sets)
        StreamingFraud.timerDetectorTws(
          tx.as[graft.streaming.Transaction](
            org.apache.spark.sql.Encoders.product),
          windowSec = 5, threshold = 1e12, watermarkDelay = "2 seconds")
          .toDF()
      case "dedup" =>
        // ingest-time dedup throughput: keys collide by design
        // (amount bucketed to 10 units per account), so the state
        // store sees both inserts and hits
        StreamingDedup.exactDedupStream(
          tx.select(col("ts"), concat_ws(" ", lit("tx"), col("accountId"),
            floor(col("amount") / 10).cast("long")).as("text")),
          "ts", "text", watermarkDelay = "2 seconds")
      case "ooo" =>
        // the reference's out-of-order variant at rate: ±500 s
        // hash-perturbed event time (OutofOrderTumblingWindow/
        // FraudDetectionJob.java:62-70) into a 5 s bounded-out-of-
        // orderness watermark on RocksDB state — rows later than the
        // watermark drop, and the engine's numRowsDroppedByWatermark
        // counts them (reported below as lateDropped)
        StreamingFraud.tumblingAlerts(TransactionGen.perturb(tx),
          sizeSec = 5, threshold = 100000.0, watermarkDelay = "5 seconds")
      case _ =>
        StreamingFraud.tumblingAlerts(tx, sizeSec = 5,
          threshold = 100000.0, watermarkDelay = "2 seconds")
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sb").toString
    val q = alerts.writeStream.format("noop")
      .queryName("streambench")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    q.stop()
    val steady = progress.drop(math.min(3, progress.length - 1)) // skip warmup
    val rps = steady.map(_.processedRowsPerSecond).filter(!_.isNaN)
    val rows = steady.map(_.numInputRows).sum
    val dropped = steady.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    val mean = if (rps.nonEmpty) rps.sum / rps.length else 0.0
    println(s"""{"metric":"stream_rows_per_sec","value":$mean,"unit":"rows/sec","rows":$rows,"lateDropped":$dropped,"batches":${steady.length},"configuredRate":$rowsPerSec,"pipeline":"$pipeline"}""")
    spark.stop()
  }
}
