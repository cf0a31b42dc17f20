package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's transaction entity
  * (org.apache.flink.walkthrough.common.entity.Transaction as used in
  * master/src/main/java/InorderTumblingWindow/TransactionStreamSource.java:26-31):
  * accountId in [0, accounts), amount in [0, 1000), an event-time
  * timestamp.
  */
case class Transaction(accountId: Long, amount: Double, ts: java.sql.Timestamp)

/** Fraud alert emitted when a windowed per-account sum crosses the
  * threshold (reference Alert entity + FraudDetector2.java:22-30).
  */
case class Alert(accountId: Long, windowStartMs: Long, total: Double, cnt: Long)

/** Synthetic transaction stream — Spark-first replacement for the
  * reference's SourceFunction: the built-in `rate` source provides
  * backpressured (value, timestamp) rows; deterministic hashes of
  * `value` derive account and amount, so the stream is reproducible
  * (unlike the reference's java.util.Random) and scales by just
  * raising rowsPerSecond / numPartitions.
  */
object TransactionGen {

  def stream(spark: SparkSession, rowsPerSecond: Int = 100,
             accounts: Int = 10): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        pmod(xxhash64(col("value")), lit(accounts.toLong)).as("accountId"),
        (pmod(xxhash64(col("value"), lit(1)), lit(100000L)).cast(DoubleType) / 100.0)
          .as("amount"),
        col("timestamp").as("ts"))
}
