package graft.operators

import graft.functions.{GraftFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication operators for a training-data pipeline.
  *
  * Scale design: every near-dup variant generates candidate pairs
  * through an equi-join on a bucket key (LSH band / signature chunk /
  * shared shingle) — never an O(n²) cross join — so the shuffle is
  * proportional to candidates, not pairs. The exact-Jaccard verify
  * runs only on candidates. At 100 TB the bucket joins shuffle on
  * well-distributed hash keys; hot-shingle skew in [[ngramJaccard]]
  * is bounded by a document-frequency cap on join shingles.
  */
object Dedup {

  /** Exact dedup: one hash aggregation, keep the smallest id per
    * group. By default the group key is `(xxhash64(text), length)` —
    * 16 bytes — so the shuffle carries keys, not documents; at 100 TB
    * grouping on the raw text would shuffle every corpus byte. A
    * same-length 64-bit collision needs ~2^32 equal-length docs
    * (birthday bound) to become likely; pass `rawKeys = true` for the
    * bit-exact full-text grouping where that residual risk is
    * unacceptable. Both modes emit identical columns.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String,
            rawKeys: Boolean = false): DataFrame =
    if (rawKeys)
      docs.groupBy(col(textCol))
        .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"),
          length(col(textCol)).as("text_len"))
    else
      docs.groupBy(xxhash64(col(textCol)).as("h"),
          length(col(textCol)).as("text_len"))
        .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), col("text_len"))

  /** Incremental exact dedup — the daily-batch-vs-corpus step: keep
    * only the `newDocs` whose text does not already exist in
    * `corpus`. Anti-join on (xxhash64(text), length): the corpus — the
    * BIG side — enters the shuffle as a distinct key-only projection
    * (16 bytes/doc, no text), so ingesting a day's crawl against a
    * 100 TB corpus moves corpus keys, not corpus bytes. Same residual
    * collision tradeoff as [[exact]] hashed mode (and the driver
    * oracle's raw-text NOT EXISTS proves hashed ≡ raw on the gate
    * corpus).
    */
  def incremental(newDocs: DataFrame, corpus: DataFrame,
                  idCol: String, textCol: String): DataFrame =
    newDocs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        xxhash64(col(textCol)).as("h"),
        length(col(textCol)).as("text_len"))
      .join(corpus.select(xxhash64(col(textCol)).as("h"),
          length(col(textCol)).as("text_len")).distinct(),
        Seq("h", "text_len"), "left_anti")
      .select(col("doc_id"), col("text"), col("text_len"))

  /** MinHash signatures: k minima of per-seed hashes over each
    * document's distinct word n-gram shingles (Broder 1997).
    *
    * Formulated as explode(shingles) → groupBy(doc) with k `min`
    * aggregates rather than k `array_min(transform(...))` expressions:
    * lambda HOFs are excluded from Spark's subexpression elimination,
    * so the array form recomputes the shingle array k times (measured
    * 30x slower). The aggregate form builds shingles once, computes
    * the k hashes per shingle, and partial-aggregates map-side — the
    * shuffle carries one k-wide row per (doc, partition).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    val exploded = docs
      .filter(TextFunctions.wordCount(col(textCol)) >= shingleN)
      .select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesOfWords(col("w"), shingleN)).as("sh"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"m$i"))
    exploded.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * signature (k hashes) → `bands` bands of k/bands rows → band-hash
    * bucket join → estimated Jaccard (matching signature fraction)
    * filter. Collision probability per band for Jaccard j is
    * j^(k/bands); with k=32, bands=8 a j=0.8 pair collides in ≥1 band
    * w.p. ~0.97 while j=0.3 pairs almost never do.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                 minEstJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val withSig = minhashSignatures(docs, idCol, textCol, shingleN, k)

    val banded = withSig.select(
      col("doc_id"), col("sig"),
      bandStructs(k, bands, i => element_at(col("sig"), i + 1)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))

    val a = banded.alias("a")
    val b = banded.alias("b")
    // verify (cheap signature compare) BEFORE the pair dedup: the
    // filter drops almost all candidates, so the dropDuplicates
    // shuffle only carries true near-dups
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), m => m)).cast(DoubleType) / k, 3))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash-LSH candidates, exactly verified: band-bucket candidate
    * generation (as [[minhashLsh]]) followed by a true word-n-gram
    * Jaccard computation restricted to the candidates, emitting only
    * pairs with exact jaccard >= `minJaccard`.
    *
    * This is the production dedup shape at corpus scale — LSH prunes
    * the pair space from O(n²) to near-linear, then the exact verify
    * (a join bounded by candidates × shingles-per-doc, NOT by the
    * corpus) removes LSH's false positives. The output is therefore a
    * deterministic, engine-independent pair set: identical to
    * [[ngramJaccard]] at the same threshold whenever LSH recall at
    * `minJaccard` is ~1, which the default parameters guarantee — with
    * k=64, bands=32 (2 rows/band) a pair at jaccard j shares ≥1 band
    * w.p. 1-(1-j²)^32: miss probability 1e-4 at j=0.5, 4e-10 at
    * j=0.7. That determinism is what lets the driver gate this query
    * against the exact-pair SQL oracle.
    *
    * One shingle table feeds signatures, sizes and the verify join
    * (persisted; rows are two longs — cache lifetime note as in
    * [[ngramJaccard]]).
    */
  /** (doc_id, sh): hashed 8-byte word-n-gram shingles. */
  private def hashedShingles(docs: DataFrame, idCol: String,
                             textCol: String, shingleN: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesOfWords(col("w"), shingleN)).as("shRaw"))
      .select(col("doc_id"), xxhash64(col("shRaw")).as("sh"))

  /** (doc_id, band, bucket): the LSH band-bucket index rows of a
    * hashed-shingle table — the thing an incremental pipeline stores.
    */
  /** One exploded column of (band, bucket) structs over k minhash
    * values; `minVal(i)` supplies the i-th (0-based) value. The ONE
    * banding arithmetic — shared by the signature-array path
    * ([[minhashLsh]]) and the column path ([[bandTable]]): the
    * cross-operator LSH guarantees (and the stored index's
    * compatibility with fresh signatures) hold only while the bucket
    * hash and row slicing agree bit-for-bit, so there is exactly one
    * definition.
    */
  private def bandStructs(k: Int, bands: Int,
                          minVal: Int => Column): Column = {
    val rows = k / bands
    explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(((b * rows) until ((b + 1) * rows))
          .map(minVal): _*).as("bucket"))
    }: _*))
  }

  private def bandTable(shingled: DataFrame, k: Int, bands: Int): DataFrame = {
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"m$i"))
    shingled.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        bandStructs(k, bands, i => col(s"m$i")).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Band-bucket self-join candidates over any band table (inline or
    * stored). A pair sharing several bands would double-count in the
    * verify aggregation: dedup candidates first (cheap — candidate
    * volume, not corpus volume).
    */
  private def bandCandidates(banded: DataFrame): DataFrame =
    banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

  /** The ONE exact-verify scoring tail — shingle-intersection count →
    * jaccard → threshold — shared by the inline path
    * ([[minhashLshVerified]]) and the stored-index path
    * ([[minhashPairsFromStored]]), so the two are identical by
    * construction (the jaccardFromStored discipline).
    */
  private def verifyCandidates(cand: DataFrame, shingled: DataFrame,
                               sizes: DataFrame,
                               minJaccard: Double): DataFrame = {
    val inter = cand
      .join(shingled.select(col("doc_id").as("id_a"), col("sh")), "id_a")
      .join(shingled.select(col("doc_id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")), 3))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def minhashLshVerified(docs: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, k: Int = 64, bands: Int = 32,
                         minJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val shingled = hashedShingles(docs, idCol, textCol, shingleN).persist()
    // eager fill — see ngramJaccard: concurrent consumer jobs would
    // otherwise serialize on per-block cache-fill locks
    shingled.count()
    val sizes = shingled.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))

    val banded = bandTable(shingled, k, bands)

    val pairs = verifyCandidates(bandCandidates(banded), shingled, sizes,
      minJaccard)
      // EAGER (localCheckpoint) so the corpus-scale shingle pin can be
      // released before returning, instead of living until session
      // eviction like the lazy ngramJaccard shape: at 10x the bench SF
      // the retained shingle blocks alone drove rep-2 GC pressure
      // inside a fixed 32g heap (r11 scale sweep, "Third point") while
      // the pair output stays bounded by TRUE near-dup structure —
      // materializing it costs one small write, freeing the pin wins
      // the whole shingle footprint back.
      .localCheckpoint(true)
    shingled.unpersist(blocking = false)
    pairs
  }

  /** Corpus SELF-dedup served entirely from a stored [[MinhashIndex]]
    * — the [[minhashLshVerified]] pair set without re-running the
    * corpus front end: candidate generation is a band-bucket
    * self-join over the STORED band table (nBands 20-byte rows per
    * doc, read columnar) and the exact verify reads the STORED
    * hashed-shingle/size tables, so the per-run cost drops the
    * shingle explode + k-hash signature aggregation — the dominant
    * term — and tracks candidate volume plus a corpus-columnar scan.
    * Output is identical to the inline path by construction: the
    * band table was built by the same [[bandTable]] arithmetic at
    * index build, and [[bandCandidates]]/[[verifyCandidates]] are the
    * very operators the inline path runs (spec: stored ≡ inline).
    * At 100 TB this is the snapshot-serving shape: the index is built
    * (or [[extendIndex]]-maintained) once per corpus snapshot and
    * every self-dedup pass is a read.
    *
    * The exact-verify inputs are PRUNED to candidate documents with a
    * semi-join before the shingle join (the [[admitBatch]]
    * discipline): the verify's (doc, sh) exchange is then bounded by
    * true near-dup structure, not the corpus — measured at 10× the
    * bench SF the unpruned verify re-shuffled the full stored shingle
    * table (188 MB) where candidates covered a fifth of the docs.
    * The candidate-id broadcast gets the same row-count guard as
    * admitBatch (a boilerplate-heavy corpus can make candidates
    * corpus-scale; past the threshold fall back to a shuffle
    * semi-join — slower, never a driver OOM). The candidate pair set
    * is persisted for its two consumers and the result is
    * materialized (localCheckpoint) so the pin frees at return, as
    * the inline path does.
    */
  def minhashPairsFromStored(index: MinhashIndex,
                             minJaccard: Double = 0.5,
                             maxBroadcastIdRows: Long =
                               50L * 1000 * 1000): DataFrame = {
    val cand = bandCandidates(index.bands).persist()
    val candRows = cand.count() // eager fill — and the broadcast guard
    val ids0 = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    // 2·candRows bounds |ids| from above, so the already-materialized
    // count decides without an extra job
    val ids = if (2 * candRows <= maxBroadcastIdRows) broadcast(ids0) else ids0
    val sh = index.shingles.join(ids, Seq("doc_id"), "left_semi")
    val sz = index.sizes.join(ids, Seq("doc_id"), "left_semi")
    val out = verifyCandidates(cand, sh, sz, minJaccard)
      .localCheckpoint(true)
    cand.unpersist(blocking = false)
    out
  }

  /** The stored half of incremental near-dup admission: everything
    * the corpus contributes to [[admitBatch]], precomputed once and
    * persistable as three plain tables —
    *
    *  - `bands`    (doc_id, band, bucket): LSH band-bucket rows,
    *  - `shingles` (doc_id, sh): hashed 8-byte shingles (the exact
    *    verify side),
    *  - `sizes`    (doc_id, sz): distinct-shingle counts.
    *
    * Build with [[buildBandIndex]], write/read with
    * [[saveBandIndex]]/[[loadBandIndex]]. Admission against a LOADED
    * index never touches corpus text: the corpus cost is paid once at
    * build (or amortized by appending each admitted batch's own rows
    * — the same tables [[admitBatch]] computes for the batch).
    */
  final case class MinhashIndex(bands: DataFrame, shingles: DataFrame,
                                sizes: DataFrame, shingleN: Int, k: Int,
                                nBands: Int)

  /** One corpus scan → [[MinhashIndex]]. The hashed-shingle table is
    * persisted and eagerly filled (three consumers: band signatures,
    * sizes, and — if the caller admits in-memory — the verify join).
    */
  def buildBandIndex(corpus: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, k: Int = 64,
                     bands: Int = 32): MinhashIndex = {
    require(k % bands == 0, "bands must divide k")
    val sh = hashedShingles(corpus, idCol, textCol, shingleN).persist()
    sh.count() // eager fill — see ngramJaccard
    MinhashIndex(bandTable(sh, k, bands), sh,
      sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz")),
      shingleN, k, bands)
  }

  /** Persist an index as three parquet tables + a one-row params
    * table; [[loadBandIndex]] restores it. Overwrites `path`.
    */
  def saveBandIndex(index: MinhashIndex, path: String): Unit = {
    // the three tables are independent jobs over the one (pre-filled)
    // shingle cache — overlap them so the small writers back-fill the
    // band aggregation's task tail (guide §2.6, the Postings.build
    // pattern; the callers' shingle table is persisted + counted
    // before this, so no per-block fill-lock contention)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    try {
      Await.result(Future.sequence(Seq(
        Future(index.bands.write.mode("overwrite")
          .parquet(s"$path/bands")),
        Future(index.shingles.write.mode("overwrite")
          .parquet(s"$path/shingles")),
        Future(index.sizes.write.mode("overwrite")
          .parquet(s"$path/sizes")))),
        scala.concurrent.duration.Duration.Inf): Unit
    } finally pool.shutdown()
    val spark = index.bands.sparkSession
    import spark.implicits._
    Seq((index.shingleN, index.k, index.nBands))
      .toDF("shingle_n", "k", "n_bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  def loadBandIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): MinhashIndex = {
    val p = spark.read.parquet(s"$path/params").head
    MinhashIndex(
      spark.read.parquet(s"$path/bands"),
      spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/sizes"),
      p.getAs[Int]("shingle_n"), p.getAs[Int]("k"), p.getAs[Int]("n_bands"))
  }

  /** Incremental near-dup admission against a prebuilt
    * [[MinhashIndex]]: exact-verified pairs where the FIRST side is
    * always a new-batch document — against the indexed corpus and
    * within the batch — without ever forming corpus×corpus
    * candidates, and without ever touching corpus TEXT: the corpus
    * participates only as its stored band/shingle/size rows. A daily
    * batch pays batch-signature cost + a (batch-bands ⋈ index.bands)
    * bucket join with the BATCH side broadcast — the corpus band
    * table is probed map-side, never shuffled or sorted (measured at
    * 5× the bench SF: the pre-broadcast plan re-exchanged + re-sorted
    * all corpus band rows on every admission, which is exactly the
    * corpus-scaling cost an incremental index exists to avoid); the
    * index-side exact verify is pruned to candidate documents with a
    * broadcast semi-join BEFORE the shingle join, so the per-admission
    * shuffle of the (corpus-sized) shingle table is candidate-bounded,
    * not corpus-bounded. The batch-broadcast assumes the operating
    * point of incremental admission — batch ≪ corpus (band rows are
    * 20 bytes × nBands per batch doc); a batch too large to broadcast
    * should be split, or rebuilt into the index wholesale.
    * Verification and the
    * recall argument are [[minhashLshVerified]]'s: at the default
    * k=64/bands=32 the output equals the exact jaccard pair set
    * restricted to pairs touching the batch.
    */
  def admitBatch(index: MinhashIndex, newBatch: DataFrame,
                 idCol: String, textCol: String,
                 minJaccard: Double = 0.5,
                 maxBroadcastBandRows: Long = 50L * 1000 * 1000): DataFrame = {
    // loop-scoped, restored on exit: lets AQE right-size stages that
    // read the shN/cand pins — without it the cached 32-way layout is
    // frozen into the verify join and the final materialization
    // re-runs wide stages (the Graph.pageRank finding; measured here
    // ~2.7 s → ~2.0 s steady-state admission at sf0.1)
    ConfScope.withCachedPlanRepartitioning(newBatch.sparkSession) {
      admitBatchImpl(index, newBatch, idCol, textCol, minJaccard,
        maxBroadcastBandRows)
    }
  }

  private def admitBatchImpl(index: MinhashIndex, newBatch: DataFrame,
                             idCol: String, textCol: String,
                             minJaccard: Double,
                             maxBroadcastBandRows: Long): DataFrame = {
    val shN = hashedShingles(newBatch, idCol, textCol, index.shingleN)
      .persist()
    shN.count() // eager fill — see ngramJaccard
    val bandN = bandTable(shN, index.k, index.nBands).persist()
    // eager fill (probed twice: corpus + batch-batch) — and the row
    // count doubles as the broadcast guard below, so the graceful
    // fallback costs no extra job
    val bandNRows = bandN.count()

    // candidates: new on the left. Two joins instead of one union
    // join — unioning the corpus bands with the batch bands forced a
    // single corpus-sized join input that the planner shuffled AND
    // sorted on (band, bucket) every admission. Split, the
    // batch-vs-corpus probe broadcasts the (batch-bounded) batch
    // bands and STREAMS the stored corpus band table map-side — no
    // corpus shuffle, no corpus sort, admission cost tracks the
    // batch. Batch-batch pairs are oriented id_a < id_b so nothing
    // doubles. Persisted: consumed by the pair verify AND the
    // candidate-id broadcast below.
    //
    // Broadcast GUARD: band rows are ~20 bytes (id, band, bucket);
    // past ~50M rows (~1 GB hashed relation, the default threshold) a
    // forced broadcast stops being a hint and becomes a driver-OOM/
    // 8 GB-cap hazard — a batch that large is outside the batch ≪
    // corpus operating point, so degrade gracefully to the planner's
    // shuffle join (the pre-split behavior: slower, never a crash)
    // instead of enforcing the docstring's assumption with a runtime
    // failure. The threshold is a parameter so the fallback path is
    // spec-exercisable (DedupSpec pins it to 0 and asserts identical
    // pairs).
    val probeN =
      if (bandNRows <= maxBroadcastBandRows) broadcast(bandN) else bandN
    val candCorpus = probeN.alias("a")
      .join(index.bands.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val candBatch = bandN.alias("a")
      .join(bandN.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val cand = candCorpus.unionByName(candBatch)
      .dropDuplicates("id_a", "id_b")
      .persist()
    val candRows = cand.count() // eager fill — and the guard input below

    // prune the (corpus-sized) index shingle/size reads to candidate
    // docs. The candidate id set is CANDIDATE-bounded, not strictly
    // batch-bounded: a boilerplate batch doc whose band buckets are
    // shared by a large slice of the corpus makes candIds corpus-
    // scale, so the broadcast gets the same guard as the band probe —
    // past the threshold, fall back to a shuffle semi-join (slower,
    // never a driver OOM). candRows bounds |candIds| from above, so
    // the already-materialized count decides without an extra job.
    val candIds0 = cand.select(col("id_b").as("doc_id")).distinct()
    val candIds =
      if (candRows <= maxBroadcastBandRows) broadcast(candIds0) else candIds0
    val shAll = index.shingles.unionByName(shN)
      .join(candIds, Seq("doc_id"), "left_semi")
    val sizesN = shN.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val sizesAll = index.sizes.unionByName(sizesN)
      .join(candIds, Seq("doc_id"), "left_semi")

    val inter = cand
      .join(shN.select(col("doc_id").as("id_a"), col("sh")), "id_a")
      .join(shAll.select(col("doc_id").as("id_b"), col("sh")),
        Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val verified = inter
      .join(sizesN.select(col("doc_id").as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(sizesAll.select(col("doc_id").as("id_b"), col("sz").as("sz_b")),
        "id_b")
      .withColumn("jaccard",
        round(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")), 3))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // materialize (pair-set-sized) so the per-call pins can be freed
    // HERE: a daily admission loop must not accumulate cached blocks
    // in the caller's session (the pageRank discipline)
    val result = verified.localCheckpoint(true)
    shN.unpersist(blocking = false)
    bandN.unpersist(blocking = false)
    cand.unpersist(blocking = false)
    result
  }

  /** Fold an admitted batch into an index: the batch's own
    * band/shingle/size tables (one batch scan — [[buildBandIndex]]
    * on the batch) unioned onto the corpus tables, so a daily
    * pipeline maintains its index at batch cost and never rebuilds
    * from corpus text.
    *
    * Compaction cadence: each extend deepens the in-memory union
    * lineage by one level (and pins one more batch-shingle cache), so
    * a long-lived admission loop should re-[[saveBandIndex]] every
    * ~10 extends and [[loadBandIndex]] back — the save compacts the
    * union tree into three flat parquet tables and the reload's plan
    * depth is constant again. Save-after-extends is exact: the
    * re-saved index equals a fresh [[buildBandIndex]] of the grown
    * corpus (spec: "re-save discipline"), because the three tables
    * are row-wise unions with no ordering dependence.
    */
  def extendIndex(index: MinhashIndex, batch: DataFrame,
                  idCol: String, textCol: String): MinhashIndex =
    extendIndex(index, buildBandIndex(batch, idCol, textCol,
      index.shingleN, index.k, index.nBands))

  /** Union an existing index with a PREBUILT batch sub-index — the
    * overload for callers that need to release the batch's shingle
    * pin after saving the extension (the DataFrame variant above
    * builds the sub-index internally, where its pin is unreachable).
    * Parameters must match; the base is typically
    * [[loadBandIndex]]-ed, so extension never re-shingles the corpus.
    */
  def extendIndex(index: MinhashIndex, batch: MinhashIndex): MinhashIndex = {
    require(batch.shingleN == index.shingleN && batch.k == index.k &&
      batch.nBands == index.nBands, "index parameters must match")
    MinhashIndex(
      index.bands.unionByName(batch.bands),
      index.shingles.unionByName(batch.shingles),
      index.sizes.unionByName(batch.sizes),
      index.shingleN, index.k, index.nBands)
  }

  /** One-shot convenience wrapper: [[buildBandIndex]] on `corpus`
    * (in-memory, not written to storage) + [[admitBatch]]. A real
    * pipeline builds the index once with [[buildBandIndex]] /
    * [[saveBandIndex]] and calls [[admitBatch]] per batch against the
    * [[loadBandIndex]]-ed tables — admission cost then tracks the
    * BATCH size (spec-proven: admission succeeds with the corpus
    * files deleted).
    */
  def minhashIncrementalVerified(corpus: DataFrame, newBatch: DataFrame,
                                 idCol: String, textCol: String,
                                 shingleN: Int = 3, k: Int = 64,
                                 bands: Int = 32,
                                 minJaccard: Double = 0.5): DataFrame = {
    val index = buildBandIndex(corpus, idCol, textCol, shingleN, k, bands)
    // admitBatch materializes its result, so the one-shot index's
    // corpus-shingle pin can be freed here rather than leak
    val out = admitBatch(index, newBatch, idCol, textCol, minJaccard)
    index.shingles.unpersist(blocking = false)
    out
  }

  /** SimHash near-duplicate pairs: 64-bit signature per document
    * (custom codegen'd kernel), candidate generation by pigeonhole on
    * `chunks` signature chunks (pairs within Hamming distance
    * `chunks-1` share ≥1 exact chunk), Hamming verify.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              chunks: Int = 8, maxHamming: Int = 7): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    // self-register the kernel (the withNorm/decontaminate pattern):
    // GraftFunctions.simhash resolves by registry name, and a fresh
    // session calling this operator directly would otherwise fail
    // analysis with "Undefined function graft_simhash64"
    GraftFunctions.register(docs.sparkSession)
    val chunkBits = 64 / chunks
    val mask = (1L << chunkBits) - 1
    // persisted: the pigeonhole self-join reads the signature table on
    // BOTH sides — without it the doc scan + simhash kernel run twice
    // (measured ~2× the signature cost at sf0.1). Rows are two longs;
    // cache lifetime note as in ngramJaccard.
    val withSig = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.simhash(TextFunctions.words(col(textCol))).as("sig"))
      .persist()
    // eager fill — see ngramJaccard: both self-join sides consume this
    withSig.count()

    val chunked = withSig.select(
      col("doc_id"), col("sig"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), c * chunkBits)
            .bitwiseAND(lit(mask)).as("piece"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("sig"), col("cc.chunk"), col("cc.piece"))

    val a = chunked.alias("a")
    val b = chunked.alias("b")
    // hamming-verify before the pair dedup (same reasoning as in
    // minhashLsh: the verify is a cheap bit op, the dedup a shuffle)
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.piece") === col("b.piece") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        GraftFunctions.hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Connected components over a near-duplicate pair list: collapses
    * transitive duplicate chains (A~B, B~C ⇒ {A,B,C}) into clusters so
    * a pipeline can keep exactly one representative per group — the
    * step that turns pairwise candidates (from [[minhashLsh]] /
    * [[simhash]] / [[ngramJaccard]]) into an actual dedup decision.
    *
    * Algorithm: iterative min-label propagation with pointer jumping.
    * Each round every node takes the minimum label among itself and
    * its neighbours, then additionally adopts its label's label (the
    * jump), so the minimum id travels 2^k hops after k rounds and
    * convergence is O(log diameter) — `maxIter` = 25 covers any
    * component a real corpus can produce, and the function throws
    * rather than return inconsistent labels if it is ever exceeded.
    * The total Σlabel is strictly decreasing until fixpoint, so
    * convergence is detected with one cheap aggregate per round (no
    * expensive except/distinct diff). Each round is two joins + an agg
    * over the (id,label) table — nothing wider than two longs
    * shuffles — and lineage is cut every round with localCheckpoint so
    * round k's plan does not re-embed rounds 1..k-1.
    *
    * Output: `(doc_id, cluster_id)` with `cluster_id` = the minimum
    * doc id in the component, for every doc that appears in a pair.
    */
  /** @param driverEdgeThreshold edge lists at or below this size take
    * a driver union-find instead of distributed rounds: one collect of
    * two-long rows (≤1 MB at the default) replaces O(log diameter)
    * join+checkpoint jobs — the same bounded-model tradeoff as the IVF
    * centroid pull or Mixer's per-partition offsets, and near-dup pair
    * lists are almost always tiny relative to their corpus. Identical
    * output (spec-checked); pass 0 to force the distributed path.
    */
  def clusters(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 25,
               driverEdgeThreshold: Long = 65536): DataFrame = {
    // materialize the (possibly expensive) pair plan ONCE — the
    // union below reads it twice, and without the persist each
    // orientation would re-run the whole candidate-generation job
    val p = pairs
      .select(col(aCol).cast(LongType).as("src"),
        col(bCol).cast(LongType).as("dst"))
      .persist()

    val nEdges = p.count()
    if (nEdges <= driverEdgeThreshold) {
      val spark = pairs.sparkSession
      val es = p.collect().map(r => (r.getLong(0), r.getLong(1)))
      p.unpersist(blocking = false)
      // path-compressed union-find keeping the MINIMUM id as root —
      // same representative choice as min-label propagation. find is
      // ITERATIVE (walk to root, then compress the walked path): a
      // path-shaped component collected in unlucky edge order builds
      // a parent chain as deep as the component, and a recursive find
      // would overflow the driver stack right at the edge threshold.
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val ids = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct
      import spark.implicits._
      return ids.map(id => (id, find(id))).toDF("doc_id", "cluster_id")
    }
    // undirected: keep both orientations so one join propagates both
    // ways. localCheckpoint — not persist — because every round's plan
    // re-embeds its inputs' LOGICAL plans: with persist, round k
    // re-analyzes the whole candidate-generation tree k times over
    // (measured 3× slowdown at 6 rounds); the checkpoint truncates the
    // plan to the materialized partitions, so each round analyzes a
    // three-node plan regardless of what produced the edges.
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    p.unpersist()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    if (labels.isEmpty) return labels
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))

    var prevSum = sumLabels(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      // pointer jump against the ROUND-ENTRY labels (not the
      // neighbor-min output): l'(v) = min(l(v), min_{u∈N(v)} l(u),
      // l(l(v))). Jumping on the stale table shortcuts one fewer hop
      // per round than jumping on the updated one, but both are
      // O(log diameter), and this formulation needs only ONE
      // materialization per round instead of two — the jump side
      // reads `labels`, which round entry already checkpointed, so
      // nothing here is computed twice. maxIter=25 covers any
      // component a real corpus can produce.
      val jump = labels.select(col("id").as("label"),
        col("label").as("jump"))
      val next = labels.as("l")
        .join(nbrMin.as("n"), Seq("id"), "left")
        .join(jump.as("j"), Seq("label"), "left")
        .select(col("id"),
          least(col("label"),
            least(coalesce(col("nbr_label"), col("label")),
              coalesce(col("jump"), col("label")))).as("label"))
        .localCheckpoint(true)
      val s = sumLabels(next)
      labels = next
      done = s == prevSum
      prevSum = s
      iter += 1
    }
    if (!done) throw new IllegalStateException(
      s"Dedup.clusters did not converge in $maxIter rounds — " +
        "component diameter exceeds 2^maxIter?")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Σlabel of a label table — the monotone convergence metric for
    * [[clusters]] (labels only ever decrease).
    */
  private def sumLabels(labels: DataFrame): Long =
    labels.agg(sum(col("label"))).head.getLong(0)

  /** Span-level duplication signals — the position-aware counterpart
    * of document-level dedup (the "dedup the substring, not the doc"
    * idea from suffix-array training-data dedup): for every document,
    * how many of its word `spanN`-gram positions also occur in some
    * OTHER document, and the longest consecutive run of such
    * positions. A long max run means a big verbatim block is shared
    * even when the documents as wholes are distinct — the signal a
    * pipeline uses to cut spans rather than drop docs.
    *
    * Shape at scale: positional span hashes (8-byte `xxhash64`, never
    * the span text) → the shared-span set via one aggregation (`min ≠
    * max` doc id — no distinct count needed) → semi-join back →
    * gaps-and-islands (`pos - row_number`) for runs. Everything
    * shuffles hashes and positions; the corpus text stays in the scan
    * stage. The span table feeds two consumers (shared-set build and
    * the semi-join), hence the persist (cache-lifetime note as in
    * [[ngramJaccard]]).
    *
    * Output per doc: `(doc_id, n_spans, n_dup_spans, max_dup_run)`,
    * zeros for docs shorter than `spanN` words.
    */
  /** (doc_id, pos, sh): positional spanN-gram hash rows — THE span
    * definition, shared by [[duplicateSpans]] (detection) and
    * [[exciseSubstrings]] (rewrite). The rewrite is documented as "on
    * top of" the detection, so the two must agree on span hashing and
    * the 1-based position origin exactly; one builder makes
    * divergence impossible. Returned PERSISTED (both callers feed
    * multiple consumers); callers eager-fill it, and — because both
    * return LAZY plans over it — there is no safe unpersist point
    * inside this module: the blocks live until session eviction or a
    * caller-side `clearCache between corpora`, the same cache-lifetime
    * contract as [[ngramJaccard]].
    */
  private def positionalSpans(docs: DataFrame, idCol: String,
                              textCol: String, spanN: Int): DataFrame = {
    val w = split(col(textCol), " ")
    docs
      .select(col(idCol).as("doc_id"), w.as("w"))
      .filter(size(col("w")) >= spanN)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("w")) - (spanN - 1)),
          i => xxhash64(concat_ws(" ", slice(col("w"), i, lit(spanN))))))
        .as(Seq("p0", "sh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("sh"))
      .persist()
  }

  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     spanN: Int = 5): DataFrame = {
    val w = split(col(textCol), " ")
    val spans = positionalSpans(docs, idCol, textCol, spanN)
    // eager fill — see ngramJaccard: two consumers race otherwise
    spans.count()
    val shared = spans.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("sh"))
    val marked = spans.join(shared, Seq("sh"), "left_semi")
    val runs = marked
      .withColumn("_g", col("pos") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("_g")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run")).as("n_dup_spans"), max(col("run")).as("max_dup_run"))
    docs.select(col(idCol).as("doc_id"),
        greatest(size(w) - (spanN - 1), lit(0)).cast(LongType).as("n_spans"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  /** Cross-document verbatim substring EXCISION — the rewrite pass on
    * top of [[duplicateSpans]]'s detection (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr idea, re-expressed relationally): every word
    * `spanN`-gram occurring more than once corpus-wide keeps its FIRST
    * occurrence (min `(doc_id, pos)` — deterministic) and every other
    * occurrence is excised token-wise from the rewritten text. Tokens
    * covered by ANY non-canonical duplicated span are removed;
    * overlapping and adjacent duplicated runs merge naturally because
    * excision is by covered token position, not by span. A document
    * equal to an earlier one rewrites to the empty string; the
    * earliest copy always survives verbatim.
    *
    * Scale shape: candidate discovery shuffles positional 8-byte span
    * hashes exactly like [[duplicateSpans]] (corpus text stays in the
    * scan); the canonical-occurrence table is one aggregation (`min`
    * over a `(doc_id, pos)` struct — no window over the span
    * multiset); covered positions explode marked spans ×spanN into
    * `(doc_id, pos)` ints; and the rebuild shuffles only SURVIVING
    * tokens once, grouped per document (per-doc sort of a
    * document-bounded array — never a corpus-scale order-by). The one
    * persisted intermediate is the span table (two consumers,
    * eager-filled — cache-lifetime note as in [[ngramJaccard]]).
    *
    * Output per input doc: `(doc_id, n_tokens, n_removed, text_out)` —
    * the rewritten text itself is emitted, so the correctness gate
    * verifies CONTENT, not just counts.
    *
    * `minRunTokens` is the Lee et al. minimum MATCH length (their
    * ExactSubstr uses ≥50 tokens): a maximal run of consecutive
    * covered positions shorter than `minRunTokens` is NOT excised —
    * short incidental 5-gram repeats (idioms, boilerplate fragments)
    * survive, only long verbatim blocks are cut. Values ≤ `spanN` are
    * a no-op (every covered run is at least `spanN` long by
    * construction). Run lengths come from the same gaps-and-islands
    * shape [[duplicateSpans]] uses, per-document windows only.
    */
  def exciseSubstrings(docs: DataFrame, idCol: String, textCol: String,
                       spanN: Int = 5, minRunTokens: Int = 0): DataFrame = {
    val w = split(col(textCol), " ")
    val spans = positionalSpans(docs, idCol, textCol, spanN)
    spans.count() // eager fill — canonical build + mark join race otherwise
    val firsts = spans.groupBy(col("sh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("cnt") > 1)
      .select(col("sh"), col("keep.doc_id").as("keep_doc"),
        col("keep.pos").as("keep_pos"))
    val covered0 = spans.join(firsts, Seq("sh"))
      .filter(!(col("doc_id") === col("keep_doc") &&
        col("pos") === col("keep_pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (spanN - 1))).as("pos"))
      .distinct()
    val covered =
      if (minRunTokens <= spanN) covered0
      else {
        // gaps-and-islands: pos − row_number is constant within a
        // maximal consecutive run; keep runs ≥ minRunTokens. Both
        // windows partition by document — never corpus-scale.
        val byDoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        covered0
          .withColumn("_g", col("pos") - row_number().over(byDoc))
          .withColumn("_len", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id"), col("_g"))))
          .filter(col("_len") >= minRunTokens)
          .select(col("doc_id"), col("pos"))
      }
    val tok = docs
      .select(col(idCol).as("doc_id"), posexplode(w).as(Seq("p0", "wt")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("wt"))
    val rebuilt = tok.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("wt")))),
          x => x.getField("wt")), " ").as("text_out"))
    docs.select(col(idCol).as("doc_id"),
        size(w).cast(LongType).as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("text_out"), lit("")).as("text_out"))
  }

  /** Benchmark decontamination: for each corpus document, the share of
    * its distinct word n-grams that occur anywhere in an evaluation /
    * benchmark document set ("containment"). This is the standard
    * pre-training hygiene pass that keeps eval answers out of the
    * training mix; a document with high containment is a leaked copy
    * of benchmark material, not merely similar prose.
    *
    * Scale shape: eval suites are megabytes while the corpus is
    * terabytes, so the benchmark's distinct shingle-hash set is
    * deduplicated and BROADCAST; the corpus side is one scan —
    * explode → per-doc-distinct shingle hashes → broadcast LEFT SEMI
    * join → count. No corpus self-join, and nothing wider than
    * (doc_id, 8-byte hash) ever shuffles. Joining on `xxhash64` of the
    * shingle rather than the string keeps the broadcast table and the
    * probe keys fixed-width (collision odds ~n²/2⁶⁵ — negligible
    * against the containment threshold).
    *
    * Output per corpus doc: distinct-shingle count, benchmark-hit
    * count, and integer-permille containment (exact integer division —
    * no float rounding to disagree across engines).
    *
    * @param bloomPrefilter the VERY-large-eval-set path: when the
    * benchmark shingle set is too big to broadcast as an exact set, a
    * bloom sketch (built by Spark's native `BloomFilterAggregate`, ~10
    * bits/item at fpp=0.01 — an order of magnitude under the exact
    * set) prefilters the corpus scan, and only the surviving ~1%+hits
    * reach a SHUFFLE semi-join that removes the bloom's false
    * positives. Output is bit-identical to the broadcast path: blooms
    * have no false negatives, and every false positive dies in the
    * residual exact join. The sketch is pulled to the driver once
    * (bounded model, same pattern as IVF centroids).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    shingleN: Int = 5,
                    bloomPrefilter: Boolean = false,
                    bloomFpp: Double = 0.01): DataFrame = {
    // distinct per doc (shinglesOfWords); ONE definition of the
    // dedup unit — hashedShingles — shared with the minhash family
    val corpusSh = hashedShingles(corpus, idCol, textCol, shingleN)
    val benchShLazy = hashedShingles(benchmark, idCol, textCol, shingleN)
      .select(col("sh")).distinct()
    val totals = corpusSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits =
      if (!bloomPrefilter)
        corpusSh
          .join(broadcast(benchShLazy), Seq("sh"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      else {
        // three consumers of the bench shingle set (count, sketch,
        // residual join): materialize once (cache lifetime note as in
        // ngramJaccard)
        val benchSh = benchShLazy.persist()
        GraftFunctions.register(corpus.sparkSession)
        val n = math.max(benchSh.count(), 1L)
        // optimal sizing: -n·ln(fpp)/ln²2 bits
        val numBits = math.ceil(
          -n * math.log(bloomFpp) / (math.log(2) * math.log(2))).toLong
        val bf = benchSh
          .agg(GraftFunctions.bloomAgg(col("sh"), lit(n), lit(numBits))
            .as("bf"))
          .head.getAs[Array[Byte]]("bf")
        corpusSh
          .filter(GraftFunctions.bloomContains(lit(bf), col("sh")))
          .join(benchSh, Seq("sh"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      }

    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contain_pml",
        expr("(1000 * n_hit) div n_shingles"))
  }

  /** Sub-document exact dedup at a delimiter-defined unit (sentence /
    * paragraph) granularity — the "dedup the boilerplate, keep the
    * doc" pass: navigation chrome, license footers and repeated
    * sentences occur in millions of otherwise-distinct pages, and
    * document-level dedup never touches them.
    *
    * A unit is KEPT iff its first occurrence — minimum `(doc_id,
    * position)` over every occurrence of the identical unit text in
    * the corpus — is this one; all later occurrences are marked
    * duplicates. Output per document: `(doc_id, n_units, n_kept)`.
    *
    * Scale shape: units enter the first-occurrence aggregation keyed
    * by `(xxhash64(unit), length(unit))` — 16-byte keys, the unit
    * text never shuffles (same residual-collision tradeoff as
    * [[exact]] hashed mode); one groupBy + one co-partitioned join
    * back, then a per-doc count. No windows, no sorts.
    */
  def unitDedup(docs: DataFrame, idCol: String, textCol: String,
                sep: String = ". "): DataFrame = {
    val units = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("idx", "u")))
      .filter(length(trim(col("u"))) > 0)
      .select(col("doc_id"), col("idx"),
        xxhash64(col("u")).as("h"), length(col("u")).as("l"))
    val firsts = units.groupBy(col("h"), col("l"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
    units.join(firsts, Seq("h", "l"))
      .select(col("doc_id"),
        (col("f.doc_id") === col("doc_id") && col("f.idx") === col("idx"))
          .cast(IntegerType).as("kept"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("kept")).cast(LongType).as("n_kept"))
  }

  /** Exact word-n-gram Jaccard similarity pairs via an inverted-index
    * join on shingles: |A∩B| from the shingle join, |A∪B| from per-doc
    * shingle counts. `maxShingleDf` drops shingles appearing in more
    * than that many documents before the pair join — the standard
    * prefix/frequency filter that bounds bucket skew at scale (a
    * shingle in d docs contributes d² join rows). Pass Int.MaxValue
    * to disable (oracle parity mode).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, minJaccard: Double = 0.5,
                   maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val (inter, sizes) =
      shingleIntersections(docs, idCol, textCol, shingleN, maxShingleDf)
    jaccardScore(inter, sizes, minJaccard)
  }

  /** The Jaccard scoring tail shared by the inline and STORED paths —
    * one definition, so the stored-table variant is result-identical
    * by construction.
    */
  private def jaccardScore(inter: DataFrame, sizes: DataFrame,
                           minJaccard: Double): DataFrame =
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")), 3))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Build-once STORE of [[shingleIntersections]]' two outputs — the
    * df-capped candidate-pair intersection counts and the per-doc
    * shingle-set sizes — for a fixed (shingleN, maxShingleDf). Both
    * are corpus-constant per snapshot and bounded by true near-dup
    * structure (pairs) / document count (sizes), so every similarity
    * READ over them — Jaccard at any threshold, containment at any
    * permille, cluster formation — is a candidate-volume join instead
    * of a corpus-scale shingle pipeline. This is the pair-list
    * artifact a production near-dup pipeline persists; at 100 TB the
    * shingle explosion is the dominant dedup cost and it is paid
    * exactly once per snapshot here. The corpus-scale shingle pin is
    * released before returning (everything is materialized to
    * parquet, unlike the lazy inline path which must keep it).
    */
  def buildShinglePairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, maxShingleDf: Int,
                        path: String): Unit = {
    val (inter, sizes, pinned) =
      shingleIntersectionsPinned(docs, idCol, textCol, shingleN, maxShingleDf)
    try {
      // NOT overlapped: the Postings.build §2.6 pattern was tried r16
      // and measured indistinguishable from sequential (concurrent
      // 10.5-16.4 s vs sequential 11.9-13.3 at 10× data, same floor
      // window — the pair-generator stage already saturates every
      // core, so there is no idle tail for the tiny sizes job to
      // back-fill); kept sequential as the simpler shape
      inter.write.mode("overwrite").parquet(s"$path/inter")
      sizes.write.mode("overwrite").parquet(s"$path/sizes")
    } finally pinned.unpersist(blocking = false)
  }

  /** Jaccard pairs served from a [[buildShinglePairs]] dir. */
  def jaccardFromStored(spark: org.apache.spark.sql.SparkSession,
                        path: String, minJaccard: Double): DataFrame =
    jaccardScore(spark.read.parquet(s"$path/inter"),
      spark.read.parquet(s"$path/sizes"), minJaccard)

  /** Containment pairs served from a [[buildShinglePairs]] dir. */
  def containmentFromStored(spark: org.apache.spark.sql.SparkSession,
                            path: String, minPermille: Long): DataFrame =
    containmentScore(spark.read.parquet(s"$path/inter"),
      spark.read.parquet(s"$path/sizes"), minPermille)

  /** Directional shingle CONTAINMENT pairs: C(sub ⊆ sup) =
    * |S(sub) ∩ S(sup)| / |S(sub)| in exact permille, emitted for the
    * smaller-shingle-set document of each candidate pair. Jaccard
    * misses subset duplication by construction — an excerpt fully
    * contained in a 10×-longer document scores J = |A|/|B| ≈ 0.1 but
    * C = 1000‰ — and excerpt/syndication containment is what a
    * crawl-scale LLM corpus actually contains (Lee et al. 2022 §5
    * discusses exactly this asymmetry). Same inverted-index candidate
    * generation as [[ngramJaccard]] (df-capped posting lists, never an
    * all-pairs join); the only new arithmetic is the integer permille
    * ratio against the SMALLER set size, which keeps the gate
    * hash-exact.
    */
  def containment(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, minPermille: Long = 800,
                  maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val (inter, sizes) =
      shingleIntersections(docs, idCol, textCol, shingleN, maxShingleDf)
    containmentScore(inter, sizes, minPermille)
  }

  /** The containment scoring tail shared by the inline and STORED
    * paths — one definition, as [[jaccardScore]].
    */
  private def containmentScore(inter: DataFrame, sizes: DataFrame,
                               minPermille: Long): DataFrame =
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      // sub = the smaller shingle set (ties break to id_a, which is
      // the smaller id by pair construction)
      .select(
        when(col("sz_a") <= col("sz_b"), col("id_a")).otherwise(col("id_b"))
          .as("sub_id"),
        when(col("sz_a") <= col("sz_b"), col("id_b")).otherwise(col("id_a"))
          .as("sup_id"),
        expr("(1000 * inter) div least(sz_a, sz_b)").as("cont_permille"))
      .filter(col("cont_permille") >= minPermille)

  /** Shared candidate machinery for [[ngramJaccard]] and
    * [[containment]]: returns (per-pair shingle intersection counts,
    * per-doc shingle-set sizes).
    */
  private def shingleIntersections(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxShingleDf: Int): (DataFrame, DataFrame) = {
    val (inter, sizes, _) =
      shingleIntersectionsPinned(docs, idCol, textCol, shingleN, maxShingleDf)
    (inter, sizes)
  }

  /** [[shingleIntersections]] plus the PINNED shingle table, for
    * callers that materialize both outputs and can release the
    * corpus-scale pin themselves ([[buildShinglePairs]]); the
    * two-tuple variant keeps the lazy inline contract (the pin lives
    * until session eviction because the result is lazy).
    */
  private def shingleIntersectionsPinned(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxShingleDf: Int): (DataFrame, DataFrame, DataFrame) = {
    // join on the 64-bit shingle hash, not the string: same
    // intersection counts (collisions ~n²/2^65) with far smaller
    // shuffle keys
    // persisted: two consumers (per-doc sizes, the posting-list
    // aggregation) would each re-run the scan + shingle explosion +
    // hash otherwise. The cached rows are two
    // longs each — smaller than the text they derive from — and
    // MEMORY_AND_DISK spills rather than OOMs at scale; the
    // re-compute-4× alternative costs more in every regime. The cache
    // lives until session eviction (the result is lazy, so this
    // function has no point at which unpersist would be safe); a
    // long-lived session interleaving many corpora should
    // `spark.catalog.clearCache()` between runs.
    val shingled = hashedShingles(docs, idCol, textCol, shingleN)
      .persist()
    // eager fill: the consumers launch as concurrent jobs (the sizes
    // joins are broadcast builds running in parallel futures), and a
    // lazily-persisted block is computed under a per-block lock —
    // concurrent first-readers park on the lock instead of hitting
    // cache. One up-front job fills with full parallelism.
    shingled.count()
    val sizes = shingled.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))

    // ONE aggregation replaces the old df-histogram + equi-self-join
    // pipeline (three shuffles of the shingle table → one): group each
    // shingle's postings into a sorted id list, drop singletons (a
    // shingle in one doc yields no a<b pair — result-identical — and
    // most shingles in a natural corpus are unique) and hot shingles
    // past `maxShingleDf` (the d² skew guard), then explode the
    // ordered pairs with array HOFs. With a finite cap the list is
    // built by [[graft.functions.BoundedCollectAgg]], which stops
    // appending at cap+1 elements in BOTH reduce and merge — so a hot
    // shingle's aggregation buffer is bounded at cap+1 longs (a plain
    // collect_list would materialize the full multi-million-element
    // array before the size filter could drop it); the oversized
    // (cap+1) marker lists die in the same `size <= cap` filter.
    // ordered pairs via CHAINED generators (posexplode the list, then
    // explode each element's tail slice): no nested array-of-struct
    // materialization, and the pair-count aggregation keys on plain
    // long columns — measured 2-3× faster than the equivalent
    // flatten(transform(...struct)) HOF at sf0.1 (struct-field group
    // keys were the cost, not the explosion itself)
    // explicit repartition between the posting aggregation and the
    // pair generators: the posting lists are COMPACT (a few bytes per
    // doc id), so AQE's shuffle-size heuristic coalesces the exchange
    // to ~1 partition — and then the generator amplification (up to
    // df²/2 pairs per list) plus the pair aggregation run serially in
    // that one task (measured 20s+ single-task stages inside
    // clean_corpus). A user-specified partition count is exempt from
    // AQE coalescing, so the explosion keeps the session's full
    // shuffle parallelism; the extra exchange moves only the compact
    // lists. Same principle at 100 TB: never let a size-based
    // optimizer decision gate a compute-amplifying operator.
    val nParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val idList =
      if (maxShingleDf < Int.MaxValue)
        graft.functions.BoundedCollectAgg
          .boundedSortedList(maxShingleDf)(col("doc_id"))
      else sort_array(collect_list(col("doc_id")))
    val inter = shingled.groupBy(col("sh"))
      .agg(idList.as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxShingleDf)
      .repartition(nParts, col("sh"))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - 1)).as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))

    (inter, sizes, shingled)
  }
}
