package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev scratch: run one shipped query with a stage-time listener —
  * prints per-stage task time, GC time, and spill so the slow stage
  * is identifiable instead of guessed.
  */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("clean_corpus")
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var rows = Seq.empty[(Int, String, Long, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows = rows :+ ((si.stageId,
          si.name.split(" ").headOption.getOrElse(""),
          m.executorRunTime, m.jvmGCTime,
          m.memoryBytesSpilled, m.diskBytesSpilled, si.numTasks))
      }
    })

    Tables.documents(spark, dir).count()
    (1 to reps).foreach { i =>
      rows = Seq.empty
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(f"[p4] === run $i: $wall%.2f s rows=$n ===")
      rows.sortBy(-_._3).take(12).foreach { case (id, nm, rt, gc, ms, ds, nt) =>
        println(f"[p4] stage $id%4d $nm%-22s runTime=${rt / 1000.0}%8.1f s gc=${gc / 1000.0}%6.1f s spillMem=${ms / 1e6}%8.1f MB spillDisk=${ds / 1e6}%8.1f MB tasks=$nt%3d")
      }
    }
    spark.stop()
  }
}
