package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for graft workloads.
  *
  * local[32] testing mirrors the multi-executor layout: shuffle
  * partitions sized to cores (not the 200 default), AQE on for
  * runtime coalescing/skew splitting, 128 MB scan partitions so a
  * 100 TB input splits into ~800k well-sized tasks on a 1000-executor
  * cluster rather than millions of tiny ones.
  */
object GraftSession {

  def builder(cores: Int = 32, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
