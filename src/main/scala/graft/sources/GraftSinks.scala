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
}
