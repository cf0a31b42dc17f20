package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev scratch: wall-clock timeline of jobs + stages for one query —
  * finds driver stalls and serialized subplan execution.
  */
object Profile5 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("clean_corpus")
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var t0 = System.currentTimeMillis()
    @volatile var evs = Vector.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = (e.time - t0) / 1000.0
        evs = evs :+ f"[p5] +$d%7.2f JOB ${e.jobId}%4d start stages=${e.stageIds.mkString(",")}"
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val d = (e.time - t0) / 1000.0
        evs = evs :+ f"[p5] +$d%7.2f JOB ${e.jobId}%4d end"
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val d = (si.completionTime.getOrElse(0L) - t0) / 1000.0
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val rt = si.taskMetrics.executorRunTime / 1000.0
        evs = evs :+ f"[p5] +$d%7.2f   stage ${si.stageId}%4d done wall=$dur%6.2f taskTime=$rt%7.1f tasks=${si.numTasks}%3d"
      }
    })

    Tables.documents(spark, dir).count()
    (1 to reps).foreach { i =>
      Thread.sleep(300); evs = Vector.empty; t0 = System.currentTimeMillis()
      val w0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(500)
      println(f"[p5] ======== run $i: $wall%.2f s rows=$n ========")
      evs.foreach(println)
    }
    spark.stop()
  }
}
