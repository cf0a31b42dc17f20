package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed contracts for the integer-exact statistics queries
  * (KS drift test, time-weighted average, truncated-kernel EWMA) —
  * the gate proves Spark ≡ DuckDB; these prove both match the math.
  */
class StatsSpec extends AnyFunSuite with SparkSpec {

  test("q_ks_test: identical samples score 0, disjoint samples 1000, " +
    "and the real gate value sits strictly between") {
    val r = SparkEntry.queries("q_ks_test")(spark, sf).head()
    val (n1, n2, ks) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("ks_permille"))
    assert(n1 > 0 && n2 > 0)
    // priorities are assigned independently of price, so D is small;
    // a broken cumulative pass lands near 1000 instead
    assert(ks >= 0 && ks < 500, s"ks=$ks")
    // closed-form: samples {1,2} vs {3,4} → D = 1 at v = 2
    import spark.implicits._
    val two = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 0L, 1L))
      .toDF("cents", "cnt1", "cnt2")
    val off1 = graft.operators.PrefixSums
      .exclusiveOffsets(two, "cents", "cnt1", "c1ex")
    val off2 = graft.operators.PrefixSums
      .exclusiveOffsets(two, "cents", "cnt2", "c2ex")
    val d = two.join(off1, "cents").join(off2, "cents")
      .select(expr("abs((c1ex + cnt1) * 2 - (c2ex + cnt2) * 2)").as("d"))
      .agg(max("d")).head().getLong(0)
    assert(d === 4L) // |2·2 − 0·2| at v = 2 → D = 4/(2·2) = 1
  }

  test("q_twa: a constant-value user time-weights to that constant; " +
    "hand series weights by duration, not by count") {
    import spark.implicits._
    // value 100 for 3 s then 400 for 1 s over [0, 4):
    // twa = (100·3 + 400·1) / 4 = 175 — plain AVG would say 250
    val e = Seq((1L, 0L, 100L), (2L, 3L, 400L), (3L, 4L, 999L))
      .toDF("event_id", "t", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("t"), col("event_id"))
    val twa = e.withColumn("t2", lead(col("t"), 1).over(w))
      .filter(col("t2").isNotNull)
      .agg((sum((col("t2") - col("t")) * col("v")) /
        (max(col("t2")) - min(col("t")))).cast("long"))
      .head().getLong(0)
    assert(twa === 175L)
    // gate shape on real data: one row per user with >= 2 events
    val rows = SparkEntry.queries("q_twa")(spark, sf)
    assert(rows.count() > 0)
    assert(rows.groupBy("user_id").count().filter(col("count") > 1)
      .count() === 0)
  }

  test("q_ewma: steady series is a fixpoint; step response moves " +
    "more than half-way in one observation") {
    val r = SparkEntry.queries("q_ewma")(spark, sf)
    assert(r.count() > 0)
    // hand kernel: x = [10, 10, 10, 10, 100] →
    // last = (8·100 + 4·10 + 2·10 + 10) div 15 = 870 div 15 = 58
    val vals = Seq(10L, 10L, 10L, 10L, 100L)
    def ewmaAt(i: Int): Long = {
      val lags = (0 to 3).flatMap(d => if (i - d >= 0) Some(vals(i - d)) else None)
      val wts = Seq(8L, 4L, 2L, 1L).take(lags.size)
      lags.zip(wts).map { case (v, w) => v * w }.sum / wts.sum
    }
    assert(ewmaAt(3) === 10L) // steady fixpoint
    assert(ewmaAt(4) === 58L) // > half-way from 10 toward 100
    // and the engine agrees on a planted frame
    import spark.implicits._
    val df = vals.zipWithIndex.map { case (v, i) => ("t", i.toLong, v) }
      .toDF("event_type", "day", "x")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val got = df
      .withColumn("l1", lag(col("x"), 1).over(w))
      .withColumn("l2", lag(col("x"), 2).over(w))
      .withColumn("l3", lag(col("x"), 3).over(w))
      .select(col("day"), expr(
        "CAST((8 * CAST(x AS DECIMAL(38,0)) + 4 * coalesce(l1, 0)" +
          " + 2 * coalesce(l2, 0) + coalesce(l3, 0)) div" +
          " (8 + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END" +
          "    + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END" +
          "    + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END) AS BIGINT)")
        .as("e"))
      .orderBy("day").collect().map(_.getLong(1))
    assert(got.toSeq === Seq(10L, 10L, 10L, 10L, 58L))
  }

  test("q_attribution: planted journey credits first and last touch " +
    "correctly, and credits balance to the conversion count") {
    import spark.implicits._
    // user 1: view -> click -> purchase  (first=view, last=click)
    // user 2: purchase                   (no touch -> 'none')
    // user 3: click -> purchase -> view -> purchase
    //   (p1: first=click last=click; p2: first=click last=view)
    val e = Seq(
      (1L, 10L, 100L, "view"), (2L, 11L, 100L, "click"),
      (3L, 12L, 100L, "purchase"),
      (4L, 10L, 200L, "purchase"),
      (5L, 10L, 300L, "click"), (6L, 11L, 300L, "purchase"),
      (7L, 12L, 300L, "view"), (8L, 13L, 300L, "purchase"))
      .toDF("event_id", "t", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val credited = e
      .withColumn("ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("ft"), lit("none")).as("ft"),
        coalesce(col("lt"), lit("none")).as("lt"))
    val rows = credited.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.sorted.toSeq === Seq(("click", "click"), ("click", "view"),
      ("none", "none"), ("view", "click")))
    // on real data: total first credits == total last credits ==
    // number of conversions
    val g = SparkEntry.queries("q_attribution")(spark, sf)
    val Row(nf: Long, nl: Long) =
      g.agg(sum("n_first"), sum("n_last")).head()
    val conv = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(nf === conv && nl === conv)
  }

  test("q_rfm: segment counts cover every customer exactly once, and " +
    "higher m_score segments have higher average monetary value") {
    val seg = SparkEntry.queries("q_rfm")(spark, sf)
    val total = seg.agg(sum("n_customers")).head().getLong(0)
    val nCust = Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).head().getLong(0)
    assert(total === nCust)
    // m-quintile monotonicity: avg cents strictly rises across the
    // occupied m_score levels
    val byM = seg.groupBy("m_score")
      .agg((sum("m_cents") / sum("n_customers")).as("avg_m"))
      .orderBy("m_score").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    byM.sliding(2).foreach {
      case Array((s1, a1), (s2, a2)) =>
        assert(a1 < a2, s"m_score $s1 avg $a1 !< $s2 avg $a2")
      case _ =>
    }
  }

  test("q_fd_profile: key-determined candidates hold with zero " +
    "violations; violating candidates count their extras exactly") {
    val r = SparkEntry.queries("q_fd_profile")(spark, sf)
      .collect().map(x => x.getAs[String]("fd") -> x).toMap
    val pk = r("o_orderkey->o_custkey")
    assert(pk.getAs[Int]("holds") === 1 &&
      pk.getAs[Long]("n_violations") === 0L)
    // the composite candidate is data-dependent (the synthetic
    // generator does NOT key lineitem on (orderkey, linenumber)) —
    // assert internal consistency, not a truth the data doesn't hold
    val ck = r("l_orderkey,l_linenumber->l_partkey")
    assert((ck.getAs[Int]("holds") === 1) ===
      (ck.getAs[Long]("n_violations") === 0L))
    // a violating FD's extras reconcile: n_both - n_lhs, independently
    // recomputed
    val v = r("l_partkey->l_suppkey")
    val l = Tables.lineitem(spark, sf)
    val nl = l.select(countDistinct("l_partkey")).head().getLong(0)
    val nb = l.select(countDistinct("l_partkey", "l_suppkey"))
      .head().getLong(0)
    assert(v.getAs[Long]("n_lhs") === nl)
    assert(v.getAs[Long]("n_violations") === nb - nl)
  }

  test("q_sessionize: hand journey splits sessions at the gap and " +
    "totals reconcile with the event count") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // gaps: 10, 20000(>14400 -> split), 100 → sessions {a,b},{c,d}
    val e = Seq((1L, 0L), (2L, 10L), (3L, 20010L), (4L, 20110L))
      .toDF("event_id", "t").withColumn("user_id", lit(7L))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val sess = e.withColumn("new_s",
        when(col("t") - lag(col("t"), 1).over(w) > 14400L, 1L)
          .when(lag(col("t"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n_ev"),
        (max(col("t")) - min(col("t"))).as("dur"))
      .orderBy("sid").collect()
    assert(sess.map(r => (r.getAs[Long]("n_ev"), r.getAs[Long]("dur")))
      .toSeq === Seq((2L, 10L), (2L, 100L)))
    // real data: session events sum to the corpus event count
    val g = SparkEntry.queries("q_sessionize")(spark, sf)
    assert(g.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sf).count())
    assert(g.filter(col("longest_session_events") > col("n_events"))
      .count() === 0)
  }

  test("q_cohort_ltv: revenue reconciles with orders, cumulative is " +
    "monotone per cohort, and age-0 cum equals age-0 revenue") {
    val ltv = SparkEntry.queries("q_cohort_ltv")(spark, sf)
      .persist()
    val totalRev = ltv.agg(sum("rev_cents")).head().getLong(0)
    val direct = Tables.orders(spark, sf)
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(12,2)) * 100"))
        .cast("long")).head().getLong(0)
    assert(totalRev === direct)
    assert(ltv.filter(col("age_weeks") === 0 &&
      col("cum_rev_cents") =!= col("rev_cents")).count() === 0)
    // cumulative monotone within cohort
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cohort_week").orderBy("age_weeks")
    val dips = ltv.withColumn("prev",
        lag(col("cum_rev_cents"), 1).over(w))
      .filter(col("prev").isNotNull && col("cum_rev_cents") < col("prev"))
    assert(dips.count() === 0)
    ltv.unpersist(blocking = false)
  }

  test("q_autocorr arithmetic: a perfectly persistent series scores " +
    "1000 permille, a mean-reverting alternation scores -1000") {
    import spark.implicits._
    def ar1(xs: Seq[Long]): Long = {
      val p = xs.zip(xs.tail).map { case (x, y) => (BigInt(x), BigInt(y)) }
      val n = BigInt(p.size)
      val (sx, sy) = (p.map(_._1).sum, p.map(_._2).sum)
      val sxy = p.map { case (x, y) => x * y }.sum
      val sxx = p.map { case (x, _) => x * x }.sum
      ((1000 * (n * sxy - sx * sy)) / (n * sxx - sx * sx)).toLong
    }
    assert(ar1(Seq(1L, 2L, 3L, 4L, 5L)) === 1000L) // x_{t+1} = x_t + 1
    assert(ar1(Seq(10L, 2L, 10L, 2L, 10L, 2L)) === -1000L)
    // engine agreement on the planted persistent series
    val d = Seq.tabulate(6)(i => ("t", i.toLong, i + 1L))
      .toDF("event_type", "day", "x")
    val pairs = d.join(d.select(col("event_type"),
      (col("day") - 1).as("day"), col("x").as("y")),
      Seq("event_type", "day"))
    val got = pairs
      .select(col("x").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        expr("sum(x*y)").as("sxy"), expr("sum(x*x)").as("sxx"))
      .select(expr("CAST((1000 * (n * sxy - sx * sy))" +
        " div (n * sxx - sx * sx) AS BIGINT)")).head().getLong(0)
    assert(got === 1000L)
  }

  test("q_slice_parity: parity permilles average to ~1000 when " +
    "weighted by docs, and a planted short-doc slice flags unbalanced") {
    val p = SparkEntry.queries("q_slice_parity")(spark, sf)
    // doc-weighted mean of cell means == global mean → Σ n·parity ≈
    // 1000·Σn (floor error < #cells)
    // Σ n_c·floor-parity ∈ (1000·N − N, 1000·N]: each cell's floor
    // loses < 1 permille-unit per doc
    val r = p.agg(sum(expr("n_docs * parity_permille")).cast("long"),
      sum("n_docs").cast("long")).head()
    val (wsum, n) = (r.getLong(0), r.getLong(1))
    assert(wsum <= 1000L * n && wsum > 1000L * n - n)
    assert(p.filter(col("balanced") =!= 1 &&
      abs(col("parity_permille") - 1000) <= 200).count() === 0)
  }

  test("q_readability: hand-counted document and formula fixpoints") {
    import spark.implicits._
    // "The cat sat. It ran." → 5 words, 2 sentences,
    // vowel runs: e,a,a,I,a → 5 syllables
    // fk = 39·5//2 + 1180·5//5 − 1559 = 97 + 1180 − 1559 = −282
    val d = Seq((1L, "The cat sat. It ran.")).toDF("doc_id", "text")
    val rv = regexp_replace(lower(col("text")), "[aeiou]+", "V")
    val row = d.select(
      size(split(col("text"), " ")).cast("long").as("w"),
      size(filter(split(col("text"), "\\."),
        x => length(trim(x)) > 0)).cast("long").as("s"),
      (length(rv) - length(regexp_replace(rv, "V", "")))
        .cast("long").as("y"))
      .select(col("w"), col("s"), col("y"),
        (expr("(39 * w) div greatest(s, 1)") +
          expr("(1180 * y) div greatest(w, 1)") - lit(1559L)).as("fk"))
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === ((5L, 2L, 5L, -282L)))
    val real = SparkEntry.queries("q_readability")(spark, sf)
    assert(real.filter(col("n_syllables") > col("n_words") * 10)
      .count() === 0)
  }

  test("q_kanonymity: class sizes partition the table and every " +
    "below-k class is flagged") {
    val r = SparkEntry.queries("q_kanonymity")(spark, sf).persist()
    assert(r.agg(sum("n")).head().getLong(0) ===
      Tables.customer(spark, sf).count())
    assert(r.filter((col("n") < 5) =!= (col("at_risk") === 1))
      .count() === 0)
    r.unpersist(blocking = false)
  }

  test("q_funnel_delay arithmetic: planted view->purchase journeys " +
    "yield exact delays; non-viewers and pre-view purchases drop") {
    import spark.implicits._
    // u1: view@10, purchase@40 → 30; u2: purchase@5 only → drops;
    // u3: purchase@3 BEFORE view@8, then purchase@20 → 12
    val e = Seq((1L, "view", 10L), (1L, "purchase", 40L),
      (2L, "purchase", 5L),
      (3L, "purchase", 3L), (3L, "view", 8L), (3L, "purchase", 20L))
      .toDF("user_id", "event_type", "t")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t").as("tv"))
    val d = e.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("t") >= col("tv"))
      .groupBy("user_id").agg((min("t") - min("tv")).as("delay"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 30L, 3L -> 12L))
    val g = SparkEntry.queries("q_funnel_delay")(spark, sf).head()
    assert(g.getAs[Long]("n_converted") > 0)
    assert(g.getAs[Long]("p25_delay_s") <= g.getAs[Long]("p50_delay_s")
      && g.getAs[Long]("p50_delay_s") <= g.getAs[Long]("p90_delay_s"))
  }

  test("q_dbscan: two planted blobs with a sparse bridge resolve to " +
    "two clusters through the cell-merge machinery") {
    import spark.implicits._
    // dense cells at (0,0),(0,1) and (5,5) on a 1000-key grid; the
    // far cell is its own cluster; the adjacent pair merges
    val cells = Seq((0L, 0L, 10L), (0L, 1L, 12L), (5L, 5L, 9L))
      .toDF("cx", "cy", "n")
      .withColumn("cell", col("cx") * 1000 + col("cy"))
    val offs = explode(array(
      Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
        (1, 0), (1, 1)).map { case (dx, dy) =>
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
      }: _*))
    val edges = cells.select(col("cell").as("src"), col("cx"),
        col("cy"), offs.as("o"))
      .select(col("src"),
        ((col("cx") + col("o.dx")) * 1000 + col("cy") + col("o.dy"))
          .as("dst"))
      .join(cells.select(col("cell").as("dst")), "dst")
      .filter(col("src") < col("dst"))
    val comp = graft.operators.Graph.connectedComponents(edges)
    val lbl = cells.join(comp, cells("cell") === comp("node"), "left")
      .select(coalesce(col("component"), col("cell")).as("cid"), col("n"))
      .groupBy("cid").agg(count(lit(1)).as("nc"), sum("n").as("np"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(lbl.size === 2)
    assert(lbl(0L) === ((2L, 22L)))   // cells (0,0)+(0,1), min label 0
    assert(lbl(5005L) === ((1L, 9L))) // the isolated far cell
  }

  test("q_benford: digits cover 1-9 exactly once, observed permilles " +
    "sum to ~1000, and the Benford table is the canonical one") {
    val r = SparkEntry.queries("q_benford")(spark, sf).collect()
    assert(r.map(_.getAs[Int]("digit")).sorted.toSeq === (1 to 9))
    val s = r.map(_.getAs[Long]("observed_permille")).sum
    assert(s > 990 && s <= 1000) // floor loses < 1 per digit
    val b = r.map(x => x.getAs[Int]("digit") ->
      x.getAs[Long]("benford_permille")).toMap
    assert(b(1) === 301L && b(9) === 46L)
    assert(r.forall(x => x.getAs[Long]("abs_dev_permille") ===
      math.abs(x.getAs[Long]("observed_permille") -
        x.getAs[Long]("benford_permille"))))
  }

  test("q_paths: hand journey yields its exact trigrams; counts on " +
    "real data reconcile with eligible positions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c"),
      (4L, 4L, "d")).map { case (id, t, ty) => (id, t, 9L, ty) }
      .toDF("event_id", "t", "user_id", "event_type")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val tri = e.select(col("user_id"), col("event_type").as("s0"),
        lead(col("event_type"), 1).over(w).as("s1"),
        lead(col("event_type"), 2).over(w).as("s2"))
      .filter(col("s2").isNotNull)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(tri.sorted.toSeq === Seq(("a", "b", "c"), ("b", "c", "d")))
    // real data: Σ trigram counts over ALL trigrams = Σ max(0, n_u−2)
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).head().getLong(0)
    // the gated query is top-20; recompute untruncated here
    val all = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_timestamp(ts)").as("t"),
        col("event_id"), col("event_type").as("s0"))
      .withColumn("s1", lead(col("s0"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))))
      .withColumn("s2", lead(col("s0"), 2).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))))
      .filter(col("s2").isNotNull).count()
    assert(all === perUser)
  }

  test("q_ab_test: closed-form z2 on a hand frame, and the gate row " +
    "is internally consistent") {
    // n_t=100, c_t=60, n_c=100, c_c=40: diff=2000, N=200, C=100
    // z2 = (60*100-40*100)^2 * 200 / (100*100*100*100) = 8
    val z2 = (BigInt(100) * BigInt(2000) * BigInt(2000) * 200 /
      (BigInt(100) * 100 * 100 * 100)).toLong
    assert(z2 === 800L) // z2_centi = 800 -> z2 = 8.00, z ~ 2.83
    val r = SparkEntry.queries("q_ab_test")(spark, sf).head()
    val (nt, ct, nc, cc) = (r.getAs[Long]("n_t"), r.getAs[Long]("c_t"),
      r.getAs[Long]("n_c"), r.getAs[Long]("c_c"))
    assert(nt > 0 && nc > 0 && ct <= nt && cc <= nc)
    assert(r.getAs[Long]("uplift_permille") ===
      1000 * ct / nt - 1000 * cc / nc)
    // interior conversion: the guard case never fires on this corpus
    assert(ct + cc > 0 && ct + cc < nt + nc)
    assert(!r.isNullAt(r.fieldIndex("z2_centi")))
  }

  test("q_vocab_coverage: coverage is monotone in k, bounded by 1000 " +
    "permille, and the total reconciles") {
    val rows = SparkEntry.queries("q_vocab_coverage")(spark, sf)
      .orderBy("k").collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(100L, 1000L, 10000L))
    val cov = rows.map(_.getAs[Long]("coverage_permille"))
    assert(cov.toSeq === cov.sorted.toSeq)
    assert(cov.forall(c => c > 0 && c <= 1000))
    val tot = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    assert(rows.forall(_.getAs[Long]("n_tok") === tot))
    assert(rows.forall(r => r.getAs[Long]("top_mass") <= tot))
  }

  test("q_item_sims: at most 5 partners per item, ranks dense from 1, " +
    "and cos2 never exceeds 1e6") {
    val r = SparkEntry.queries("q_item_sims")(spark, sf).persist()
    val bad = r.groupBy("item").agg(count(lit(1)).as("cnt"),
        max("rnk").as("mx"), min("rnk").as("mn"))
      .filter(col("cnt") > 5 || col("mx") =!= col("cnt") ||
        col("mn") =!= 1)
    assert(bad.count() === 0)
    assert(r.filter(col("cos2_micro") > 1000000L ||
      col("cos2_micro") < 0).count() === 0)
    r.unpersist(blocking = false)
  }

  test("q_lang_confusion: cells partition the corpus and row shares " +
    "sum to ~1000 permille per label") {
    val m = SparkEntry.queries("q_lang_confusion")(spark, sf).persist()
    assert(m.agg(sum("n")).head().getLong(0) ===
      Tables.documents(spark, sf).count())
    // per label: Σ n = n_label and Σ floor-shares ∈ (1000 − cells, 1000]
    val bad = m.groupBy("lang_label")
      .agg(sum("n").as("sn"), max("n_label").as("nl"),
        sum("share_permille").as("ss"), count(lit(1)).as("cells"))
      .filter(col("sn") =!= col("nl") || col("ss") > 1000 ||
        col("ss") <= lit(1000) - col("cells"))
    assert(bad.count() === 0)
    m.unpersist(blocking = false)
  }

  test("q_knn_classify: one row per probe, votes bounded by k, and a " +
    "planted homogeneous neighborhood predicts its label") {
    val r = SparkEntry.queries("q_knn_classify")(spark, sf).collect()
    assert(r.length === 10 && r.map(_.getAs[Long]("q_id")).distinct.length === 10)
    assert(r.forall(x => x.getAs[Long]("n_votes") >= 1 &&
      x.getAs[Long]("n_votes") <= 5))
    assert(r.forall(x => (x.getAs[Int]("correct") == 1) ==
      (x.getAs[Int]("pred_label") == x.getAs[Int]("true_label"))))
  }
}
