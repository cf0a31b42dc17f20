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

  /** Apply a keyed changeset to a snapshot — the MERGE / CDC-apply
    * primitive behind incremental corpus refresh (upsert the
    * re-crawls, drop the takedowns, keep the rest).
    *
    * `changes` carries the base's columns plus `opCol` ∈
    * {"I","U","D"}: I/U rows replace (or introduce) the base row with
    * their key; D rows delete it; base rows with no change pass
    * through. Deletes of absent keys are no-ops. At most one change
    * row per key (last-writer-wins conflation is the upstream CDC
    * reader's job, as in any lakehouse MERGE).
    *
    * Scale shape: ONE full-outer join on the key column — data
    * columns ride the join but only the key shuffles wide tables
    * against each other; a typical changeset is a small fraction of
    * the snapshot, so AQE broadcasts it and the snapshot side never
    * shuffles at all.
    */
  def applyChangeset(base: DataFrame, changes: DataFrame,
                     keyCol: String, opCol: String): DataFrame = {
    val dataCols = base.columns.filterNot(_ == keyCol).toSeq
    val b = base.select(col(keyCol) +:
      dataCols.map(c => col(c).as(s"_b_$c")): _*)
    val c = changes.select(col(keyCol) +: col(opCol).as("_op") +:
      dataCols.map(c2 => col(c2).as(s"_c_$c2")): _*)
    b.join(c, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol) +: dataCols.map(c2 =>
        when(col("_op").isNotNull, col(s"_c_$c2"))
          .otherwise(col(s"_b_$c2")).as(c2)): _*)
  }
}
