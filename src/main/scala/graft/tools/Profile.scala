package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch profiler: times sub-plans of the slow operators. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    val shingled = docs
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(col("text"), 3)).as("shRaw"))
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))

    time("explode+hash count")(shingled.count())
    time("explode+hash count again")(shingled.count())
    val sizes = shingled.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    time("sizes")(sizes.count())
    val inter = shingled.alias("a")
      .join(shingled.alias("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("inter pairs")(inter.count())
    val joined = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
    time("full")(joined.count())
    inter.explain("formatted")

    val emb = Tables.embeddings(spark, dir)
    time("ivf total")(graft.operators.Similarity.ivfTopK(
      emb, "vec_id", "embedding", 9, 5).count())
    val e2 = graft.operators.Similarity.withNorm(emb, "embedding")
      .select(col("vec_id").as("id"), col("vecd"), col("nrm"))
    time("withNorm count")(e2.count())
    time("withNorm count2")(e2.count())

    // pane rule effect: stock vs extensions session on sliding agg
    val ev = Tables.events(spark, dir)
    val stock = graft.operators.Windows.slidingAgg(ev, "event_type", "ts", "value", 3600, 900)
    time("sliding stock warm")(stock.count())
    time("sliding stock")(stock.count())
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions).getOrCreate()
    val ev2 = Tables.events(ext, dir)
    val pane = graft.operators.Windows.slidingAgg(ev2, "event_type", "ts", "value", 3600, 900)
    time("sliding pane-rule warm")(pane.count())
    time("sliding pane-rule")(pane.count())
    spark.stop()
  }
}
