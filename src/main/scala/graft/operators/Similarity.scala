package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search over an `array<float>` column.
  *
  * Scale design: the brute-force paths broadcast the (small) query
  * side and stream the corpus once — embarrassingly parallel, no
  * shuffle of the big side; norms are precomputed per vector so each
  * pair costs one dot product. The LSH path buckets vectors by a
  * random-hyperplane signature so a probe touches ~corpus/2^bits
  * rows — the 100 TB path where even one full scan per query batch is
  * too much.
  */
object Similarity {

  /** Adds `vecd` (double widened) and `nrm` columns. */
  def withNorm(embeddings: DataFrame, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    embeddings
      .withColumn("vecd", toDouble(col(vecCol)))
      .withColumn("nrm", norm2(col("vecd")))
  }

  /** All pairs with cosine >= minSim — the exact near-dup baseline.
    * Deliberately a (broadcast) nested-loop pair join: correct at test
    * scale, superseded by [[Dedup.minhashLsh]]/[[lshTopK]] bucketing
    * at corpus scale.
    */
  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
                  minSim: Double): DataFrame = {
    val e = withNorm(embeddings, vecCol)
      .select(col(idCol).as("id"), col("vecd"), col("nrm"))
    e.alias("a").join(e.alias("b"), col("a.id") < col("b.id"))
      .withColumn("sim",
        cosinePrenormed(col("a.vecd"), col("b.vecd"), col("a.nrm"), col("b.nrm")))
      .filter(col("sim") >= minSim)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 3).as("cosine"))
  }

  /** Exact top-k cosine neighbors for each query id: broadcast the
    * query vectors against one pass over the corpus, per-query top-k
    * via rank. Ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryMaxId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings, vecCol)
      .select(col(idCol).as("id"), col("vecd"), col("nrm"))
    val queries = e.filter(col("id") <= queryMaxId)
      .select(col("id").as("q_id"), col("vecd").as("q_vec"), col("nrm").as("q_nrm"))
    val scored = e.join(broadcast(queries), col("id") =!= col("q_id"))
      .withColumn("sim",
        cosinePrenormed(col("vecd"), col("q_vec"), col("nrm"), col("q_nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("sim"), 3).as("cosine"))
  }

  /** Approximate top-k via random-hyperplane LSH with the standard
    * AND-OR construction: `tables` independent signatures of `bits`
    * hyperplanes each (AND within a table, OR across tables). A pair
    * with angular similarity p collides in ≥1 table w.p.
    * 1-(1-p^bits)^tables — tables trades recall against candidate
    * volume. Candidates come from equi-joins on (table, bucket), so a
    * probe touches ~tables/2^bits of the corpus instead of scanning
    * it; recall vs [[bruteForceTopK]] is checked in the spec.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryMaxId: Long, k: Int, bits: Int = 8, tables: Int = 8,
              seed: Long = 42L): DataFrame = {
    val e = withNorm(embeddings, vecCol)
      .select(col(idCol).as("id"), col("vecd"), col("nrm"))
      .withColumn("tb", explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          hyperplaneSignature(col("vecd"), dim = 64, bits = bits,
            seed = seed + t * 7919).as("bucket"))
      }: _*)))
      .select(col("id"), col("vecd"), col("nrm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val queries = e.filter(col("id") <= queryMaxId)
      .select(col("id").as("q_id"), col("vecd").as("q_vec"),
        col("nrm").as("q_nrm"), col("t").as("q_t"), col("bucket").as("q_bucket"))
    val candidates = e.join(broadcast(queries),
        col("t") === col("q_t") && col("bucket") === col("q_bucket") &&
          col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), col("vecd"), col("nrm"),
        col("q_vec"), col("q_nrm"))
      .dropDuplicates("q_id", "id") // OR across tables
    val scored = candidates.withColumn("sim",
      cosinePrenormed(col("vecd"), col("q_vec"), col("nrm"), col("q_nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("sim"), 3).as("cosine"))
  }
}
