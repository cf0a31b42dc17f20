package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch tables — the pre-aggregation
  * pattern behind every 100 TB "how many distinct X per Y" dashboard.
  *
  * The raw corpus is scanned ONCE into a fine-grained sketch table
  * (one Datasketches-HLL binary per (dims, grain) cell, a few KB
  * each); every coarser rollup is then answered by unioning sketches
  * — kilobytes per group — instead of re-scanning terabytes of raw
  * keys. Exact distinct counts cannot be pre-aggregated this way
  * (daily exact counts don't sum: users overlap across days); the
  * sketch registers union losslessly, which is the whole point.
  *
  * Scale shape: stage 1 is one hash aggregation over the raw table
  * (map-side partial sketches combine, so the shuffle carries
  * register arrays, not raw keys); stage 2 shuffles only
  * group-count × sketch-size bytes. Register-wise max-union is
  * associative, commutative, and idempotent, so the estimate is
  * independent of partitioning and merge order — asserted by spec.
  *
  * Reference anchor: the reference keeps running per-key aggregates
  * in RocksDB state (master/src/main/java — fraud counters); this is
  * the batch analogue where the aggregate itself must be mergeable.
  */
object Sketches {

  /** Scan the corpus once into a per-(dims) HLL sketch table.
    * `lgK = 12` → 4096 registers ≈ 1.6% relative standard error at
    * ~4 KB per cell; raise lgK for tighter error, not more scans.
    */
  def distinctSketchTable(df: DataFrame, keyCol: String,
                          dims: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("hll_sketch"))

  /** Answer a coarser distinct-count rollup from sketches alone —
    * no raw-data rescan. Returns the HLL estimate plus the number of
    * fine cells merged.
    */
  def rollupDistinct(sketches: DataFrame, dims: Seq[String]): DataFrame =
    sketches.groupBy(dims.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(hll_sketch))")
             .as("distinct_est"),
           count(lit(1)).as("n_sketches"))

  // ---- Count-Min: mergeable FREQUENCY sketch tables ----------------
  //
  // HLL answers "how many distinct"; Count-Min answers "how often is
  // key k" from the same pre-aggregated-table playbook. A CMS is held
  // as a sparse TABLE of (depth-row, bucket, count) cells rather than
  // a binary blob: building it is one hash aggregation (map-side
  // partial combine — the shuffle carries ≤ depth×width counter
  // cells per partition, never raw keys), merging sketches is a
  // groupBy-SUM over cells (counter addition is the CMS merge, made
  // associative/commutative/idempotent-free by construction), and
  // estimation is an equi-join on (row, bucket) + MIN over rows.
  // Every step is a plain relational operator, so Catalyst/AQE plan
  // it like any aggregate — no opaque UDAF buffers on the shuffle.
  //
  // Guarantee (standard CMS): est ≥ true always; est ≤ true + ε·N
  // with probability ≥ 1 − (1/2)^depth per probe for width = 2/ε.
  // The per-row hash is xxhash64(key, row) — Spark's seeded hash
  // chain — so cells are deterministic for fixed data.

  // (row, bucket) probe structs, UNROLLED as an array() of plain
  // expressions rather than transform(sequence(...), i -> ...): HOF
  // lambdas evaluate interpreted (the bloomProbeBits lesson), while
  // the unrolled form codegens — and the VALUES are identical, since
  // the lambda's i and lit(i) are both int inputs to xxhash64.
  private def cmsRowBuckets(keyName: String, depth: Int, width: Int) =
    array((0 until depth).map(i =>
      struct(lit(i).as("r"),
        pmod(xxhash64(col(keyName), lit(i)), lit(width.toLong)).as("b"))): _*)

  /** Scan once into per-(dims) CMS cell tables: one sparse
    * (cms_row, cms_bucket, cnt) set per dims cell.
    */
  def cmsBuild(df: DataFrame, keyCol: String, dims: Seq[String],
               depth: Int = 5, width: Int = 2048): DataFrame =
    df.select(dims.map(col) :+ col(keyCol).as("_k"): _*)
      .select(dims.map(col) :+ explode(cmsRowBuckets("_k", depth, width))
        .as("_rb"): _*)
      .groupBy((dims.map(col) :+ col("_rb.r").as("cms_row")
        :+ col("_rb.b").as("cms_bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketch cells down to coarser `dims` (counter addition —
    * the CMS union). Merging to `Seq()` yields one global sketch.
    */
  def cmsMerge(cells: DataFrame, dims: Seq[String]): DataFrame =
    cells.groupBy((dims.map(col) :+ col("cms_row")
      :+ col("cms_bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate each probe key against one (already-merged)
    * sketch: MIN over depth rows of the joined cell counts. Probes
    * are a small frame (broadcast); keys absent from the stream
    * estimate as the row-wise bucket minimum (0 when any bucket is
    * empty).
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 5, width: Int = 2048): DataFrame = {
    val exploded = probes
      .select(col("*"), explode(cmsRowBuckets(keyCol, depth, width))
        .as("_rb"))
      .select(col("*"), col("_rb.r").as("cms_row"),
        col("_rb.b").as("cms_bucket"))
      .drop("_rb")
    exploded
      .join(cells, Seq("cms_row", "cms_bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Equi-join SIZE estimation from two CMS cell tables (the
    * AMS/Count-Min inner-product estimator, Alon-Matias-Szegedy '96 /
    * Cormode-Muthukrishnan '05): for sketches of streams A and B over
    * the same (depth, width, hash) parameters, `min over rows of
    * Σ_bucket A[r,b]·B[r,b]` never undercounts the true join size
    * Σ_k fA(k)·fB(k) and overshoots by ≤ ε·|A|·|B| w.h.p. — the
    * cardinality-estimation primitive a cost-based optimizer needs
    * BEFORE running the join, answered from kilobyte sketch tables
    * instead of the data. One (row, bucket) equi-join of cell tables;
    * products accumulate in DECIMAL(38,0).
    */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame = {
    val perRow = a
      .select(col("cms_row"), col("cms_bucket"), col("cnt").as("ca"))
      .join(b.select(col("cms_row"), col("cms_bucket"),
        col("cnt").as("cb")), Seq("cms_row", "cms_bucket"))
      .groupBy(col("cms_row"))
      .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("ip"))
    // densify over the full row domain before the min: a depth row
    // whose buckets are disjoint between the two sketches has true
    // row inner product 0 (a shared key collides in EVERY row), and
    // dropping it from the inner join would return the min over only
    // the colliding rows — an overestimate. Left-joining the per-row
    // sums against sketch a's distinct rows coalesces those rows to
    // 0; fully empty inputs coalesce the empty min to 0 as before.
    a.select(col("cms_row")).distinct()
      .join(perRow, Seq("cms_row"), "left")
      .agg(coalesce(min(coalesce(col("ip"), lit(0))), lit(0))
        .cast("long").as("join_size_est"))
  }

  // ---- KMV ("theta") sketches -------------------------------------
  //
  // The set-operation member of the sketch-table family: HLL (above)
  // unions losslessly but cannot intersect; a KMV sketch — the k
  // smallest distinct hash values of a set — supports union AND
  // intersection estimates, which is what audience-overlap questions
  // ("users who did A and B") need at 100 TB. θ = the k-th smallest
  // value; every kept value is a uniform sample of the key space at
  // rate θ/D, so |{x ∈ S : x < θ}|·D/θ estimates |S| for any S
  // assembled from sketch values by set algebra.
  //
  // Hashes are the 60-bit md5 prefix (engine-common: Spark
  // conv(hex,16,10) ≡ DuckDB CAST('0x…')), so the sketch — and every
  // estimate derived from it — is DETERMINISTIC and exactly
  // hash-oracle-able, not tolerance-gated. D = 16^15 = 2^60.

  /** 2^60 — the KMV hash domain (15 hex chars of md5). */
  val KmvDomain: Long = 1152921504606846976L

  private def kmvHash(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.LongType)

  /** Scan once into a per-(dims) KMV sketch table: `kmv` = ascending
    * array of the cell's k smallest distinct key hashes. Map-side
    * partials keep ≤k longs per group per task — raw keys never
    * shuffle ([[graft.functions.KmvAgg]]).
    */
  def kmvBuild(df: DataFrame, keyCol: String, dims: Seq[String],
               k: Int = 256): DataFrame =
    df.select(dims.map(col) :+ kmvHash(col(keyCol)).as("_hv"): _*)
      .groupBy(dims.map(col): _*)
      .agg(graft.functions.KmvAgg.kMinDistinct(k)(col("_hv")).as("kmv"))

  /** Merge sketches down to coarser `dims`: union the value sets,
    * keep the k smallest — the KMV union, exact w.r.t. a direct build
    * of the coarser cell (spec-asserted). Cells are ≤k-long arrays,
    * so the merge shuffles kilobytes per group.
    */
  def kmvMerge(sketches: DataFrame, dims: Seq[String],
               k: Int = 256): DataFrame =
    sketches.groupBy(dims.map(col): _*)
      .agg(slice(array_sort(array_distinct(flatten(
        collect_list(col("kmv"))))), 1, k).as("kmv"))

  /** θ of a sketch array: its k-th smallest value, or D when the cell
    * holds fewer than k distinct keys (every value kept — the exact
    * regime; all estimates below collapse to exact counts there).
    */
  def kmvTheta(kmv: org.apache.spark.sql.Column, k: Int = 256) =
    when(size(kmv) < k, lit(KmvDomain)).otherwise(element_at(kmv, k))

  /** Distinct-count estimate from one sketch: |{x < θ}| · D div θ
    * ((k−1)·D div θ in the full regime). DECIMAL(38,0) numerator —
    * (k−1)·2^60 crosses 2^63 from k ≥ 9.
    */
  def kmvEstimate(kmvCol: String, k: Int = 256) = {
    val theta = kmvTheta(col(kmvCol), k)
    when(size(col(kmvCol)) < k, size(col(kmvCol)).cast("long"))
      .otherwise(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * $KmvDomain" +
        s" div element_at($kmvCol, $k)"))
  }

  // ---- Bottom-k sample sketches: mergeable QUANTILES ---------------
  //
  // The quantile member of the sketch-table family (HLL = distinct,
  // CMS = frequency, KMV = set algebra): per-cell bottom-k samples.
  // Keeping the k (hash, value) pairs with the smallest row-unique
  // hash is a uniform random sample of the cell's rows, and a uniform
  // sample is a mergeable quantile summary (Cormode et al., "Mergeable
  // Summaries", PODS'12: ε-approximation error O(1/√k)) — the k
  // smallest of a union of bottom-k cells IS the bottom-k of the
  // union, so per-day cells roll up to any coarser grain exactly,
  // without rescanning raw rows. Exact per-group `percentile` buffers
  // every group value (the B14 OOM argument at 100 TB); these cells
  // are ≤k pairs each, SUM-merge-cheap, and — because the hash is the
  // deterministic engine-common md5 prefix — every order statistic
  // read from them is exactly hash-oracled, not tolerance-gated.

  /** Scan once into a per-(dims) bottom-k sample sketch table:
    * `qsk` = ascending array of the cell's k smallest (row-hash,
    * value) pairs. Map-side partials keep ≤k pairs per group per task
    * ([[graft.functions.SampleKAgg]]); raw rows never shuffle.
    */
  def sampleSketchBuild(df: DataFrame, rowKeyCol: String,
                        valueCol: String, dims: Seq[String],
                        k: Int = 256): DataFrame =
    df.select(dims.map(col) :+ kmvHash(col(rowKeyCol)).as("_hv")
        :+ col(valueCol).cast("long").as("_v"): _*)
      .groupBy(dims.map(col): _*)
      .agg(graft.functions.SampleKAgg.bottomK(k)(col("_hv"), col("_v"))
        .as("qsk"))

  /** Merge sketch cells down to coarser `dims`: union the pair sets,
    * keep the k lexicographically smallest — exact w.r.t. a direct
    * build of the coarser cell over disjoint fine cells
    * (spec-asserted). Cells are ≤k-pair arrays: kilobytes per group.
    */
  def sampleSketchMerge(sketches: DataFrame, dims: Seq[String],
                        k: Int = 256): DataFrame =
    sketches.groupBy(dims.map(col): _*)
      .agg(slice(array_sort(flatten(collect_list(col("qsk")))), 1, k)
        .as("qsk"))

  /** Order-statistic read: the `permille`-quantile of a cell's sample
    * by the nearest-rank convention `index = 1 + (p·(n−1)) div 1000`
    * over the sample's ascending values — pure integer arithmetic, so
    * both engines land on the same element.
    */
  def sampleSketchQuantile(qskCol: String, permille: Int) =
    expr(s"element_at(array_sort(transform($qskCol, x -> x._2)), " +
      s"CAST(1 + ($permille * (size($qskCol) - 1)) div 1000 AS INT))")

  // ---- Bloom filters: mergeable MEMBERSHIP sketch tables -----------
  //
  // The membership member of the sketch-table family (HLL = distinct,
  // CMS = frequency, KMV = set algebra, bottom-k = quantiles): "was
  // key k EVER seen in cell c" with NO false negatives and a bounded
  // false-positive rate — the shape behind "have we crawled this URL",
  // "is this user in the suppression list", and decontamination
  // pre-filters at 100 TB. A filter is held as a sparse TABLE of its
  // SET bit positions, `(dims…, bloom_bit)`, not a binary blob:
  // building is explode-k-probes + distinct (map-side partial dedup,
  // the shuffle carries ≤ m cells per group regardless of key count);
  // merging to a coarser grain is distinct-union (bitwise OR ≡ set
  // union of set-bit positions — associative, commutative, idempotent);
  // probing is one equi-join on bit position + a count(matched) = k
  // test. Every step is a plain relational operator.
  //
  // Probe bits are engine-common md5 slices (four 32-bit words per
  // `md5(key:block)` digest, each `pmod(slice, m)` ≡ DuckDB
  // `((x % m) + m) % m` arithmetic), so — unlike the
  // xxhash64-bucketed CMS, whose gate is a contract — the ENTIRE
  // Bloom surface (cell bit counts, merged tables, membership flags,
  // measured collisions) is deterministic and exactly hash-oracled.
  //
  // Guarantees: present ⇒ hit, always (no false negatives — gated
  // directly); absent ⇒ hit with p ≈ (1 − e^(−k·n/m))^k (k=4,
  // m=65536, n=5000 → ~0.6%).

  /** The k probe-bit positions of one key: the i-th position is the
    * (i mod 4)-th 32-bit word of `md5(key:⌊i/4⌋)`, taken `pmod m`.
    * Each slice parses as a non-negative BIGINT, so Spark `pmod` and
    * DuckDB `%` agree without the signed-modulus mirror.
    */
  private def bloomProbeBits(keyName: String, m: Int, k: Int) = {
    // k bit positions from ceil(k/4) digests: each 128-bit md5 yields
    // four independent 32-bit slices (slice-one-hash derivation — one
    // hash per 4 probes instead of one per probe). Fully UNROLLED as
    // an array() of plain expressions: the previous
    // transform(sequence(...), i -> md5(...)) ran the lambda
    // INTERPRETED (HOF lambdas don't codegen) with a fresh
    // MessageDigest + string conv per (row, i) — stack-sampled at
    // ~10 serial CPU-seconds per million rows at sf1.0. md5 (not
    // xxhash64) because the bit values are mirrored by the DuckDB
    // oracles, and md5 is the hash both engines share.
    array((0 until k).map { i =>
      val block = i / 4
      val slot = i % 4
      expr(s"pmod(CAST(conv(substring(md5(concat_ws(':'," +
        s" CAST($keyName AS STRING), '$block')), ${1 + 8 * slot}, 8)," +
        s" 16, 10) AS BIGINT), $m)")
    }: _*)
  }

  /** Scan once into a per-(dims) Bloom cell table: the distinct set
    * bit positions of each cell's filter. m = 2^16 bits, k = 4 probes
    * by default (≤0.7% fpp up to ~5k distinct keys per cell; size m
    * to the expected per-cell cardinality, not the corpus).
    */
  def bloomBuild(df: DataFrame, keyCol: String, dims: Seq[String],
                 m: Int = 65536, k: Int = 4): DataFrame =
    df.select(dims.map(col) :+ col(keyCol).as("_k"): _*)
      .select(dims.map(col) :+
        explode(bloomProbeBits("_k", m, k)).as("bloom_bit"): _*)
      .distinct()

  /** Merge cell tables down to coarser `dims`: distinct-union of set
    * bits — the Bloom OR. Exact w.r.t. a direct build of the coarser
    * cell by construction (same probe arithmetic, set union).
    */
  def bloomMerge(cells: DataFrame, dims: Seq[String]): DataFrame =
    cells.select((dims.map(col) :+ col("bloom_bit")): _*).distinct()

  /** Membership-test each probe key against one (already-merged)
    * filter: a key hits iff ALL k of its probe bits are set. One
    * equi-join on bit position; the filter side is the sparse cell
    * table (≤ m rows — broadcast-sized by construction).
    */
  def bloomProbe(cells: DataFrame, probes: DataFrame, keyCol: String,
                 m: Int = 65536, k: Int = 4): DataFrame =
    probes
      // distinct first: a probe key appearing n times would explode
      // to n·k bit rows and fail the sum===k test below — a false
      // NEGATIVE for a present key, violating the Bloom guarantee.
      // Output is per distinct key either way (the groupBy), so
      // deduplicating here only fixes the repeated-key call.
      .select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(bloomProbeBits(keyCol, m, k)).as("bloom_bit"))
      .join(broadcast(cells.select(col("bloom_bit"), lit(1).as("_set"))
        .distinct()), Seq("bloom_bit"), "left")
      .groupBy(col(keyCol))
      .agg((sum(coalesce(col("_set"), lit(0))) === k).cast("int")
        .as("bloom_hit"))
}
