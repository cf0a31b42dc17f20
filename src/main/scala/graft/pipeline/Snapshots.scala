package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot versioning: what changed between two dataset
  * versions — the audit step a training-data pipeline runs before
  * promoting a refreshed corpus (how much churn, what got re-crawled,
  * what disappeared).
  */
object Snapshots {

  /** Per-document diff of two snapshots keyed by `idCol`: classify
    * every id as `added` (new only), `removed` (old only), `changed`
    * (both, different text) or `unchanged`.
    *
    * The full-outer join carries only `(id, xxhash64(text), length)` —
    * 24 bytes per doc — so diffing two 100 TB snapshots shuffles key
    * tables, never corpus bytes. Same residual-collision tradeoff as
    * `Dedup.exact` hashed mode (a same-length collision reports
    * `unchanged` for a changed doc); the driver oracle compares raw
    * text, so the gate proves hashed ≡ raw on its corpus.
    */
  def corpusDelta(oldDocs: DataFrame, newDocs: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("doc_id"),
      xxhash64(col(textCol)).as("_ho"), length(col(textCol)).as("_lo"))
    val n = newDocs.select(col(idCol).as("doc_id"),
      xxhash64(col(textCol)).as("_hn"), length(col(textCol)).as("_ln"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_ho").isNull, lit("added"))
          .when(col("_hn").isNull, lit("removed"))
          .when(col("_ho") === col("_hn") && col("_lo") === col("_ln"),
            lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
