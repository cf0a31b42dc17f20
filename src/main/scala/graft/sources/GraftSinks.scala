package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch output layout helpers — the write side of a 100 TB pipeline.
  *
  * At scale the output LAYOUT is a first-class concern: downstream
  * readers prune on partition directories, and file count/size
  * decides both write parallelism and read task sizing. These helpers
  * encode the two standard layouts:
  *
  *  - [[writePartitioned]]: hive-style `col=value` directories for
  *    low-cardinality keys (date, source, language) — readers prune
  *    partitions before touching any file.
  *  - [[writeSortedBuckets]]: fixed file count per partition with
  *    range-clustered rows — keeps file sizes uniform (AQE-style
  *    balancing at write time) and gives readers min/max-stats
  *    pruning inside files.
  */
object GraftSinks {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       filesPerPartition: Int = 1): DataFrame = {
    df.repartition(filesPerPartition, partitionCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }

  def writeSortedBuckets(df: DataFrame, path: String, files: Int,
                         sortCols: Seq[String]): DataFrame = {
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Small-files compaction — the maintenance pass every long-lived
    * table needs: streaming sinks and per-batch appends accumulate
    * files far below the efficient task size, and a 100 TB table read
    * through millions of kilobyte files is scheduler-bound, not
    * IO-bound. Rewrites `path` into `ceil(bytes / targetFileBytes)`
    * files (at least one), sized from the CURRENT on-disk footprint.
    *
    * The rewrite goes through a temp directory and a three-step swap —
    * write compacted to `path._compacting`, rename the original aside
    * to `path._old`, rename the compacted copy into place, delete the
    * old copy — so a FULL copy of the data is readable at every
    * instant: a crash between any two steps leaves the table at
    * `path`, `path._old`, or `path._compacting`, never half-deleted.
    * Every filesystem mutation's boolean result is checked and a
    * failure throws (leaving the on-disk state recoverable by hand)
    * instead of returning as if compaction succeeded. Row content is
    * preserved exactly; file-level ordering is not guaranteed (parquet
    * readers must not rely on it).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L << 20): Long = {
    import org.apache.hadoop.fs.Path
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(path + "._compacting")
    val old = new Path(path + "._old")
    if (fs.exists(old))
      throw new IllegalStateException(
        s"$old exists — a previous compaction crashed mid-swap; recover " +
          "(keep one of the copies at the table path) before compacting")
    spark.read.parquet(path).repartition(files)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"compact: rename $hPath -> $old failed")
    if (!fs.rename(tmp, hPath)) {
      // roll the original back so the table path stays populated
      fs.rename(old, hPath)
      throw new java.io.IOException(s"compact: rename $tmp -> $hPath failed")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(
        s"compact: delete of superseded copy $old failed (table at $hPath is complete)")
    files.toLong
  }
}
