package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = Tables.events(spark, sf).select(
    col("event_type"), col("user_id"),
    expr("unix_timestamp(ts) div 86400").as("day"))

  test("merging daily sketches equals one global sketch per group") {
    val daily = Sketches.distinctSketchTable(events, "user_id",
      Seq("event_type", "day"))
    val merged = Sketches.rollupDistinct(daily, Seq("event_type"))
      .select(col("event_type"), col("distinct_est"))
    val global = Sketches.distinctSketchTable(events, "user_id",
        Seq("event_type"))
      .select(col("event_type"),
        expr("hll_sketch_estimate(hll_sketch)").as("distinct_est"))
    // register-wise max-union is lossless: sketching the union and
    // unioning the sketches land on identical registers
    assert(merged.except(global).count() === 0)
    assert(global.except(merged).count() === 0)
  }

  test("CMS: estimates never undercount, for EVERY key") {
    val cells = Sketches.cmsMerge(
      Sketches.cmsBuild(events, "user_id", Seq("event_type")), Seq.empty)
    val truth = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("true_cnt"))
    val under = Sketches.cmsEstimate(cells, truth, "user_id")
      .join(truth, "user_id")
      .filter(col("cms_est") < col("true_cnt"))
    assert(under.count() === 0)
  }

  test("CMS: merging per-group cell tables equals sketching the union") {
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(events, "user_id", Seq("event_type")), Seq.empty)
    val direct = Sketches.cmsMerge(
      Sketches.cmsBuild(events, "user_id", Seq.empty), Seq.empty)
    assert(merged.except(direct).count() === 0)
    assert(direct.except(merged).count() === 0)
  }

  test("CMS: absent keys estimate through empty buckets, never error") {
    val cells = Sketches.cmsMerge(
      Sketches.cmsBuild(events, "user_id", Seq.empty), Seq.empty)
    import spark.implicits._
    val ghosts = Seq(-1L, -2L, Long.MaxValue).toDF("user_id")
    val est = Sketches.cmsEstimate(cells, ghosts, "user_id").collect()
    assert(est.length === 3)
    // tiny key space: a ghost key's 5 buckets are almost surely not
    // all occupied, so the row minimum bottoms out at the empty-cell 0
    assert(est.map(_.getAs[Long]("cms_est")).forall(_ >= 0L))
  }

  test("estimate is partitioning-invariant and within tolerance of exact") {
    val est7 = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events.repartition(7), "user_id",
        Seq("event_type", "day")), Seq("event_type"))
    val est3 = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events.repartition(3), "user_id",
        Seq("event_type", "day")), Seq("event_type"))
    assert(est7.except(est3).count() === 0)
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    val bad = est7.join(exact, "event_type")
      .filter(abs(col("distinct_est").cast("double") -
        col("n_exact").cast("double")) >
        col("n_exact").cast("double") * 0.10)
    assert(bad.count() === 0)
  }

  test("KMV: merging fine-grained sketches equals a direct coarse build, " +
    "independent of partitioning") {
    val k = 32
    val fine = Sketches.kmvBuild(events.repartition(7), "user_id",
      Seq("event_type", "day"), k)
    val merged = Sketches.kmvMerge(fine, Seq("event_type"), k)
    val direct = Sketches.kmvBuild(events.repartition(3), "user_id",
      Seq("event_type"), k)
    // the k-min-distinct set is a function of the VALUE SET alone —
    // merge order, grain, and partitioning cannot change it
    assert(merged.except(direct).count() === 0)
    assert(direct.except(merged).count() === 0)
  }

  test("CMS inner product: hand-computed join size, never undercounts") {
    import spark.implicits._
    // A = {x:2, y:1}, B = {x:1, y:2, z:1} → true join size 2·1+1·2 = 4
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    val est = Sketches.cmsInnerProduct(
        Sketches.cmsBuild(a, "k", Seq.empty),
        Sketches.cmsBuild(b, "k", Seq.empty))
      .head().getLong(0)
    // ≥ is the guarantee; = holds unless all 5 depth rows collide
    assert(est === 4L)
    // disjoint streams estimate 0 (empty cell intersection)
    val z = Sketches.cmsInnerProduct(
        Sketches.cmsBuild(Seq("p").toDF("k"), "k", Seq.empty),
        Sketches.cmsBuild(Seq("q").toDF("k"), "k", Seq.empty))
      .head().getLong(0)
    assert(z === 0L)
  }

  test("sample sketch: merging fine cells equals a direct coarse build " +
      "and is partitioning-invariant") {
    val k = 64
    val ev = Tables.events(spark, sf).select(col("event_type"),
      col("event_id"), col("user_id"),
      expr("unix_timestamp(ts) div 86400").as("day"))
    val fine = Sketches.sampleSketchBuild(ev, "event_id", "user_id",
      Seq("event_type", "day"), k)
    val merged = Sketches.sampleSketchMerge(fine, Seq("event_type"), k)
    val direct = Sketches.sampleSketchBuild(ev.repartition(3), "event_id",
      "user_id", Seq("event_type"), k)
    // bottom-k of a union of bottom-ks = bottom-k of the union; the
    // pair set is a function of the data alone
    assert(merged.except(direct).count() === 0)
    assert(direct.except(merged).count() === 0)
  }

  test("sample sketch: below-k cells hold every row exactly, and the " +
      "nearest-rank read matches a hand-computed quantile") {
    import spark.implicits._
    // 9 rows, ids 1..9, values 10·id → sample = all rows (k > n);
    // p50 index = 1 + (500·8)//1000 = 5 → value 50; p990 → 8 → ...
    val toy = (1L to 9L).map(i => (i, 10L * i)).toDF("id", "v")
    val sk = Sketches.sampleSketchBuild(toy, "id", "v", Seq.empty, k = 64)
      .select(size(col("qsk")).as("n"),
        Sketches.sampleSketchQuantile("qsk", 0).as("p0"),
        Sketches.sampleSketchQuantile("qsk", 500).as("p50"),
        Sketches.sampleSketchQuantile("qsk", 1000).as("p100"))
      .head()
    assert(sk.getInt(0) === 9)
    assert(sk.getLong(1) === 10L) // min
    assert(sk.getLong(2) === 50L) // median of 10..90
    assert(sk.getLong(3) === 90L) // max
  }

  test("sample sketch: above-k quantile estimates track exact " +
      "percentiles within the O(1/sqrt(k)) rank band") {
    val k = 256
    val ev = Tables.events(spark, sf).select(col("event_id"),
      expr("CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)")
        .as("cents"))
    val est = Sketches.sampleSketchBuild(ev, "event_id", "cents",
        Seq.empty, k)
      .select(Sketches.sampleSketchQuantile("qsk", 500).as("p50"))
      .head().getLong(0)
    // rank contract (the approx-percentile gate pattern): the
    // estimated median's true rank must sit within ±4/sqrt(k) of 0.5
    val n = ev.count()
    val below = ev.filter(col("cents") < est).count()
    val atMost = ev.filter(col("cents") <= est).count()
    val tol = (4.0 / math.sqrt(k) * n).toLong
    assert(below <= n / 2 + tol && atMost >= n / 2 - tol,
      s"p50=$est below=$below atMost=$atMost n=$n tol=$tol")
  }

  test("KMV: exact below k, within 15% above k, and set-op estimates " +
    "bounded by their operands") {
    // small k forces the estimation regime on real data
    val k = 64
    val sk = Sketches.kmvBuild(events, "user_id", Seq("event_type"), k)
      .withColumn("est", Sketches.kmvEstimate("kmv", k))
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    val joined = sk.join(exact, "event_type").collect()
    joined.foreach { r =>
      val (est, ex) = (r.getAs[Long]("est"), r.getAs[Long]("n_exact"))
      if (ex < k) assert(est === ex, s"below k must be exact: $r")
      else assert(math.abs(est - ex) <= ex * 0.15, s"est $est vs $ex")
    }
    // a sketch of everything vs per-type: global distinct >= any type's
    val global = Sketches.kmvBuild(events, "user_id", Seq.empty, k)
      .select(Sketches.kmvEstimate("kmv", k)).head().getLong(0)
    joined.foreach(r => assert(global >= r.getAs[Long]("est") / 2))
  }

  test("Bloom: every present key hits (no false negatives, ever)") {
    val cells = Sketches.bloomBuild(events, "user_id", Seq.empty)
    val probes = events.select(col("user_id").as("k")).distinct()
    val misses = Sketches.bloomProbe(cells, probes, "k")
      .filter(col("bloom_hit") =!= 1)
    assert(misses.count() === 0)
  }

  test("Bloom: merging fine cells equals a direct coarse build, and " +
    "fpp on absent keys stays under 5%") {
    val daily = Sketches.bloomBuild(events, "user_id",
      Seq("event_type", "day"))
    val merged = Sketches.bloomMerge(daily, Seq("event_type"))
    val direct = Sketches.bloomBuild(events, "user_id", Seq("event_type"))
    assert(merged.except(direct).count() === 0)
    assert(direct.except(merged).count() === 0)
    // absent keys: images far outside the id domain; fpp is bounded by
    // (1 - e^(-k n / m))^k ~ 0.6% at n = 5k — assert a loose 5%
    val present = events.select(col("user_id")).distinct()
    val absent = present
      .select((col("user_id") * 1000003 + 7).as("k"))
      .join(present.select(col("user_id").as("k")), Seq("k"), "left_anti")
    val global = Sketches.bloomMerge(daily, Seq.empty)
    val probed = Sketches.bloomProbe(global, absent, "k")
    val n = probed.count()
    val fp = probed.filter(col("bloom_hit") === 1).count()
    assert(fp * 20 <= n, s"fpp too high: $fp of $n")
  }
}
