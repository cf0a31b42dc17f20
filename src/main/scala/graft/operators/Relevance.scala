package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide term salience (TF-IDF family) — the keyword/topic
  * signal a training-data pipeline uses for domain tagging, query
  * mining, and topical mixing.
  *
  * Deliberately the rational-idf variant (N/df instead of log(N/df)):
  * the score is a pure integer expression — `(1e6·tf·N) div (dl·df)`
  * in micro units — so it is bit-identical across engines, where a
  * float log would wobble in the last ulp between libm
  * implementations. Rankings agree with log-idf whenever df ordering
  * agrees, which is what the top-k is for.
  *
  * Scale shape: the explode is the unavoidable token pass; `tf` and
  * `dl` are map-side-combinable hash aggregations; `df` aggregates the
  * already-distinct (term, doc) pairs of `tf`, so it never re-reads
  * text; the vocabulary-sized `df` table enters the scoring join
  * broadcast. The final per-document top-k partitions by doc — each
  * partition is one document's vocabulary, never the corpus.
  *
  * BIGINT envelope: `1e6·tf·N` must stay under 2^63, i.e. tf·N ≤
  * 9.2·10^12 (at a billion docs, per-doc term frequency ≤ 9200). Past
  * it, swap the literals for DECIMAL(38,0) like `q_moments`.
  */
object Relevance {

  /** Top-`k` salient terms per document: `(doc_id, term, rank,
    * score_micro)`, rank dense 1..k by (score desc, term asc).
    */
  def salientTerms(docs: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    // Measured at sf0.1 (warm, cache cleared per run): this direct
    // formulation 1.6s; deriving dl from tf (one fewer logical
    // explode) 1.9s; persisting tf with an eager fill 2.9s. The
    // independent aggregations pipeline in parallel from the scan,
    // which beats both the reuse chain and the cache-fill barrier —
    // so the "optimization" stays un-applied on purpose.
    val tf = tok.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dl, "doc_id")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        expr("(1000000L * tf * n_docs) div (dl * df)"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"), col("score_micro"))
  }
}
