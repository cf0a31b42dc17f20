package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Footer-only table statistics: COUNT/MIN/MAX answered from parquet
  * METADATA via DataSource-V2 aggregate pushdown — the scan emits
  * one row per row-group from the footer statistics and reads no
  * data pages, so a 100 TB corpus answers in file-listing time. The
  * audit/monitoring primitive behind "how big is this snapshot and
  * what id range does it span" dashboards.
  *
  * Pushdown requires the V2 parquet path (`useV1SourceList` without
  * "parquet") and `spark.sql.parquet.aggregatePushdown`; both are
  * set on a child session (`newSession` shares the context but not
  * the SQLConf), so the rest of the library keeps its planner
  * behavior untouched. The returned DataFrame stays bound to the
  * child session and keeps its plan when actioned later.
  *
  * The contract holds only for the aggregates footers can answer:
  * no filters, no grouping, MIN/MAX on non-nested orderable columns
  * (never floating NaN envelopes), COUNT(*)/COUNT(col). Anything
  * else silently plans a normal scan — the spec pins the
  * `PushedAggregation` marker so a regression is visible.
  */
object MetaStats {

  private[graft] def v2Session(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    s
  }

  /** `(table, n_rows, min_key, max_key)` for one parquet table. */
  def tableStats(spark: SparkSession, path: String, table: String,
                 keyCol: String): DataFrame =
    v2Session(spark).read.parquet(path)
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).cast("long").as("min_key"),
        max(col(keyCol)).cast("long").as("max_key"))
      .select(lit(table).as("table"), col("n_rows"),
        col("min_key"), col("max_key"))
}
