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
                   k: Int): DataFrame =
    salientTermsTok(docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term")),
      docs.agg(count(lit(1)).as("n_docs")), k)

  /** Token-stream variant: `tok0` is the raw `(doc_id, term)`
    * whitespace-token stream (e.g. [[Postings.tokens]]) and `nDocs`
    * a 1-row `n_docs` count of ALL documents (tokenless docs
    * included — they still belong in the idf denominator). Same
    * output as [[salientTerms]]; the stored-postings serving path
    * skips the per-query split + explode of the corpus text.
    */
  def salientTermsTok(tok0: DataFrame, nDocs: DataFrame,
                      k: Int): DataFrame = {
    // Aggregations and joins run on 16-byte (xxhash64, len) term keys
    // — the exact-dedup key discipline — so the corpus-sized tf
    // exchange moves fixed-width keys, never term strings; strings
    // re-attach through a vocabulary-sized dictionary at the end.
    // Measured at sf0.5 (warm, cache cleared per run): string-keyed
    // 2.50 s / 21.2 MB shuffled vs hash-keyed 1.92 s / 16.3 MB,
    // identical output. (The r10-measured rejections still hold:
    // deriving dl from tf and eager-persisting tf both lose to
    // independent aggregations pipelining from the scan.)
    val tok = tok0
      .select(col("doc_id"), xxhash64(col("term")).as("th"),
        length(col("term")).as("tl"), col("term"))
    val tf = tok.groupBy("doc_id", "th", "tl")
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val dict = tok.select(col("th"), col("tl"), col("term")).distinct()
    val df = tf.groupBy("th", "tl").agg(count(lit(1)).as("df"))
    val n = nDocs
    val scored = tf
      .join(dl, "doc_id")
      .join(broadcast(df), Seq("th", "tl"))
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        expr("(1000000L * tf * n_docs) div (dl * df)"))
      .join(broadcast(dict), Seq("th", "tl"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"), col("score_micro"))
  }

  /** Integer-exact BM25 ranked retrieval: top-`k` documents for a
    * term-set query, scored with the real BM25 shape — saturating tf
    * with length normalization (k1, b = 3/4) times a rational
    * RSJ-monotone idf — but in pure integer arithmetic so both
    * engines land on identical scores (salientTerms' argument; a
    * float log/division would wobble in the last ulp):
    *
    *   idf_micro = (10⁶·(N − df)) div (N + df)
    *   tf_pml    = (10³·tf·(k1+1)·4·avgdl)
    *                 div (4·avgdl·tf + k1·(avgdl + 3·dl))
    *
    * (the b = 3/4 normalizer multiplied through by 4·avgdl, with
    * avgdl = total_tokens div N floored by convention).
    *
    * Scale shape: postings are FILTERED to the query's terms before
    * any join — the classic inverted-index discipline; dl joins on
    * doc over the posting-sized side only, df/stats enter broadcast,
    * and the result is a TakeOrdered(k), never a global sort. Ranks
    * attach on the driver to the ≤k collected rows (the bounded-model
    * pattern) — no window at all, so the engine keeps its
    * no-unpartitioned-window property; the result is a lineage-free
    * k-row local relation, which downstream fusions join for free.
    */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int, k1: Int = 2): DataFrame =
    bm25RankTok(docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term")),
      docs.agg(count(lit(1)).as("n_docs")), queryTerms, k, k1)

  /** Token-stream variant: `tok0` is the raw `(doc_id, term)`
    * whitespace-token stream (e.g. [[Postings.tokens]]); the
    * lowercasing + `[a-z]+` filter happen HERE so both overloads
    * share one tokenization contract (lowercasing never produces or
    * consumes a space, so lower-then-split ≡ split-then-lower).
    * `nDocs` is a 1-row `n_docs` count of all documents.
    */
  def bm25RankTok(tok0: DataFrame, nDocs: DataFrame,
                  queryTerms: Seq[String], k: Int,
                  k1: Int = 2): DataFrame = {
    val tok = tok0.select(col("doc_id"), lower(col("term")).as("term"))
      .filter(col("term").rlike("^[a-z]+$"))
    // ONE token-scale pass: dl, df, and the corpus token total all
    // derive from the (doc, term) tf table (Σtf per doc ≡ the doc's
    // filtered token count; the old shape re-tokenized the corpus for
    // dl and again for n_tokens — three explodes for one). tf pins
    // across its three consumers and releases before return.
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    try { // release-on-failure: same rationale as pqTrain
    tf.count() // eager fill — broadcast-side consumers run as
               // concurrent futures (see ngramJaccard's lock finding)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = nDocs
      .crossJoin(tf.agg(sum(col("tf")).as("n_tokens")))
      .select(col("n_docs"), expr("n_tokens div n_docs").as("avgdl"))
    bm25ScoreTail(tf.filter(col("term").isin(queryTerms: _*)), dl,
      df.filter(col("term").isin(queryTerms: _*)), stats, k, k1)
    // the k collected rows are the whole result; the finally drops
    // the tf pin even when a consumer job fails mid-flight
    } finally tf.unpersist(blocking = false)
  }

  /** [[bm25RankTok]] served from a STORED postings snapshot
    * ([[Postings.build]]) — the inverted-index serving shape: the
    * per-run plan reads the query terms' posting lists out of the
    * stored tf table (the term filter reaches the parquet scan as a
    * pushed predicate), the per-term df out of the vocabulary-sized
    * dictionary, and document lengths from the stored dl column;
    * nothing token-scale is aggregated per query. Identical output by
    * construction: the stored tables are built by the same
    * expressions the inline path aggregates ([[Postings]] shares the
    * tokenization contract) and the scoring tail below is the SAME
    * definition the inline path calls (the jaccardFromStored
    * discipline; spec: stored ≡ inline).
    *
    * `n_tokens` (for avgdl) sums the stored dl column — a doc-count
    * scan of one long column, not a token-scale pass.
    */
  def bm25RankStored(spark: org.apache.spark.sql.SparkSession,
                     path: String, nDocs: DataFrame,
                     queryTerms: Seq[String], k: Int,
                     k1: Int = 2): DataFrame = {
    val dl = Postings.dlLower(spark, path)
    val stats = nDocs
      .crossJoin(dl.agg(sum(col("dl")).as("n_tokens")))
      .select(col("n_docs"), expr("n_tokens div n_docs").as("avgdl"))
    bm25ScoreTail(
      Postings.tfLower(spark, path)
        .filter(col("term").isin(queryTerms: _*)),
      dl,
      Postings.dfLower(spark, path)
        .filter(col("term").isin(queryTerms: _*)),
      stats, k, k1)
  }

  /** The ONE BM25 scoring tail — posting-filtered tf ⋈ dl ⋈
    * broadcast df/stats → integer score → TakeOrdered(k) → driver
    * rank attach — shared by the inline ([[bm25RankTok]]) and stored
    * ([[bm25RankStored]]) paths so the two are identical by
    * construction. `tfq`/`dfq` are already filtered to the query's
    * terms.
    */
  private def bm25ScoreTail(tfq: DataFrame, dl: DataFrame, dfq: DataFrame,
                            stats: DataFrame, k: Int, k1: Int): DataFrame = {
    val topk = tfq
      .join(dl, "doc_id")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        expr("(1000000L * (n_docs - df)) div (n_docs + df)"))
      .withColumn("tf_pml",
        expr(s"(1000L * tf * ${k1 + 1} * 4 * avgdl)" +
          s" div (4 * avgdl * tf + $k1 * (avgdl + 3 * dl))"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("tf_pml * idf_micro")).as("score_nano"),
        count(lit(1)).as("n_hit_terms"))
      .orderBy(col("score_nano").desc, col("doc_id"))
      .limit(k)
    // TakeOrderedAndProject returns the ≤k rows already in (score
    // desc, doc_id) order; zip the rank on the driver instead of
    // planning a WindowExec with no partition key (round-8 finding:
    // Catalyst folds partitionBy(lit(0)) to an unpartitioned window).
    val rows = topk.collect()
    val schema = org.apache.spark.sql.types.StructType(
      topk.schema.fields :+ org.apache.spark.sql.types.StructField(
        "rank", org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = rows.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1).toLong) }
    tfq.sparkSession
      .createDataFrame(java.util.Arrays.asList(ranked: _*), schema)
      .select(col("doc_id"), col("rank"), col("score_nano"),
        col("n_hit_terms"))
  }

  /** Reciprocal-rank fusion of two ranked candidate lists (e.g. a
    * lexical BM25 list and a vector-similarity list — hybrid
    * retrieval's standard merge): score = Σ 1/(k0 + rank) over the
    * systems that ranked the id, in exact integer micro units
    * (10⁶ div (k0 + rank)), so fusion never touches a float. Inputs
    * are already-top-k frames (bounded); the full-outer join keeps
    * ids surfaced by only one system, which is the point of RRF.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankCol: String, k: Int, k0: Int = 60): DataFrame =
    a.select(col(idCol).as("id"), col(rankCol).cast("long").as("rank_a"))
      .join(b.select(col(idCol).as("id"),
        col(rankCol).cast("long").as("rank_b")), Seq("id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000L div ($k0 + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($k0 + rank_b)"), lit(0L)))
      .orderBy(col("rrf_micro").desc, col("id"))
      .limit(k)
}
