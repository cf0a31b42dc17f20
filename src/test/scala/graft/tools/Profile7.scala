package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: measured kNN-graph recall vs brute force at the gate
  * parameters, for threshold-margin documentation.
  */
object Profile7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val model = Similarity.ivfTrain(emb, "vec_id", "embedding",
        nlist = 16, iters = 3, trainFraction = 0.25)
      val graph = Similarity.knnGraph(emb, "vec_id", "embedding",
        k = 5, model, nprobe = 6)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 9, 5)
        .select("q_id", "neighbor_id")
      val approx = graph.filter(col("id") <= 9)
        .select(col("id").as("q_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("q_id", "neighbor_id")).count()
      val total = exact.count()
      println(s"[p7] $dir knn-graph recall: $hit/$total = ${1000 * hit / total} permille")
    }
    spark.stop()
  }
}
