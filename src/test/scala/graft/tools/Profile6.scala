package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev scratch: stack-sampling profiler over one shipped query run —
  * prints the hottest executor stack frames so the burn is named.
  */
object Profile6 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("clean_corpus")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, dir).count()

    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val traces = Thread.getAllStackTraces
        traces.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            // leaf-most interesting frame: skip pure JDK frames
            val frame = st.find { f =>
              val c = f.getClassName
              !c.startsWith("java.") && !c.startsWith("jdk.") &&
                !c.startsWith("sun.") && !c.startsWith("scala.collection")
            }.getOrElse(st.head)
            val key = frame.getClassName + "." + frame.getMethodName
            counts.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true); sampler.start()

    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    sampling = false
    println(f"[p6] wall ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"[p6] $v%6d  $k")
    }
    spark.stop()
  }
}
