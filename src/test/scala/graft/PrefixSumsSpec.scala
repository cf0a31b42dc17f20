package graft

import graft.operators.PrefixSums
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrefixSumsSpec extends AnyFunSuite with SparkSpec {

  test("exclusiveOffsets matches the naive reference, asc and desc, " +
      "across super-bucket boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed)
    // keys straddle many shiftright(·,10) super-buckets, including
    // negatives (floor-vs-trunc division would misgroup those)
    val rows = Seq.tabulate(500)(_ =>
      (rnd.nextLong() % 10000L, rnd.nextInt(100).toLong + 1L))
      .distinctBy(_._1)
    val df = rows.toDF("k", "t")
    for (desc <- Seq(false, true)) {
      val expected = rows.map { case (k, _) =>
        k -> rows.collect {
          case (k2, t2) if (if (desc) k2 > k else k2 < k) => t2
        }.sum
      }.toMap
      val got = PrefixSums.exclusiveOffsets(df, "k", "t", "off", desc)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"desc=$desc")
    }
  }

  test("offsetsWithTotals: inclusive prefixes match the naive " +
      "reference and totals come back exact, multi-measure") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xacc)
    val rows = Seq.tabulate(300)(_ =>
      (rnd.nextLong() % 5000L, rnd.nextInt(50).toLong + 1L,
        rnd.nextInt(9).toLong))
      .distinctBy(_._1)
    val df = rows.toDF("k", "a", "b")
    val (incl, tot) = PrefixSums.offsetsWithTotals(df, "k",
      Seq("a" -> "ai", "b" -> "bi"), inclusive = true)
    val got = incl.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.map { case (k, _, _) =>
      k -> (rows.collect { case (k2, a2, _) if k2 <= k => a2 }.sum,
        rows.collect { case (k2, _, b2) if k2 <= k => b2 }.sum)
    }.toMap
    assert(got === expected)
    val t = tot.collect()
    assert(t.length === 1)
    assert(t.head.getLong(0) === rows.map(_._2).sum) // a_total
    assert(t.head.getLong(1) === rows.map(_._3).sum) // b_total
    assert(tot.columns.toSeq === Seq("a_total", "b_total"))
  }

  test("offsetsWithTotals: single-key and empty inputs (totals of an " +
      "empty frame are one NULL row — a global agg, documented here)") {
    import spark.implicits._
    val one = Seq((42L, 7L)).toDF("k", "t")
    val (incl1, tot1) = PrefixSums.offsetsWithTotals(one, "k",
      Seq("t" -> "ti"), inclusive = true)
    assert(incl1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((42L, 7L)))
    assert(tot1.collect().head.getLong(0) === 7L)
    val empty = Seq.empty[(Long, Long)].toDF("k", "t")
    val (incl0, tot0) = PrefixSums.offsetsWithTotals(empty, "k",
      Seq("t" -> "ti"), inclusive = true)
    assert(incl0.count() === 0)
    val t0 = tot0.collect()
    assert(t0.length === 1 && t0.head.isNullAt(0))
  }

  test("exclusivePrefixMax matches the naive reference, null on the " +
      "first key, across super-bucket boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xca5e)
    val rows = Seq.tabulate(500)(_ =>
      (rnd.nextLong() % 10000L, rnd.nextLong() % 1000L))
      .distinctBy(_._1)
    val df = rows.toDF("k", "v")
    val expected = rows.map { case (k, _) =>
      val prior = rows.collect { case (k2, v2) if k2 < k => v2 }
      k -> (if (prior.isEmpty) None else Some(prior.max))
    }.toMap
    val got = PrefixSums.exclusivePrefixMax(df, "k", "v", "m")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === expected)
  }

  test("exclusiveOffsets handles fractional keys") {
    import spark.implicits._
    val rows = Seq((0.5, 10L), (1.5, 20L), (2048.25, 30L), (-3000.75, 40L))
    val got = PrefixSums.exclusiveOffsets(rows.toDF("k", "t"), "k", "t", "off")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got === Map(0.5 -> 40L, 1.5 -> 50L, 2048.25 -> 70L,
      -3000.75 -> 0L))
  }

  test("exclusiveOffsets stays correct at the density extremes the " +
      "adaptive width exists for") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xced5)
    // (a) fractional keys confined to [0,1] — the aucMicro score shape
    // that a fixed /1024 width folds into ONE super-bucket
    val dense = Seq.tabulate(3000)(_ => rnd.nextDouble())
      .distinct.map(k => (k, 1L))
    val gotD = PrefixSums.exclusiveOffsets(dense.toDF("k", "t"), "k", "t",
      "off").collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sortedD = dense.map(_._1).sorted
    assert(gotD === sortedD.zipWithIndex.map { case (k, i) =>
      k -> i.toLong }.toMap)
    // (b) integral keys spaced ~1e6 apart — the sparse shape a fixed
    // width explodes into one bucket PER KEY (O(|keys|²) step 3)
    val sparse = Seq.tabulate(2000)(i =>
      (i.toLong * 1000000L - 777000000L, rnd.nextInt(50).toLong + 1L))
    val gotS = PrefixSums.exclusiveOffsets(sparse.toDF("k", "t"), "k", "t",
      "off", descending = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val suffix = sparse.sortBy(-_._1)
      .scanLeft(0L)(_ + _._2).dropRight(1)
    assert(gotS === sparse.sortBy(-_._1).map(_._1).zip(suffix).toMap)
  }

  test("exclusivePrefixMax stays correct at the sparse-key extreme " +
      "and on negative values") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xfade)
    // keys ~1e6 apart (one bucket per key under a fixed width) and
    // strictly-negative values (greatest-with-null still correct)
    val sparse = Seq.tabulate(2000)(i =>
      (i.toLong * 1000000L - 777000000L, -rnd.nextInt(1000).toLong - 1L))
    val got = PrefixSums.exclusivePrefixMax(sparse.toDF("k", "v"),
        "k", "v", "m")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val sorted = sparse.sortBy(_._1)
    val expected = sorted.zipWithIndex.map { case ((k, _), i) =>
      k -> (if (i == 0) None else Some(sorted.take(i).map(_._2).max))
    }.toMap
    assert(got === expected)
  }

  test("maxEcdfCrossGap matches the naive cross-multiplied KS " +
      "numerator across super-bucket boundaries, both gap signs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x6a9)
    // two cases: sample 1 stochastically ABOVE sample 2 (gap max is
    // positive prefix) and below (gap max is the NEGATED min prefix) —
    // both paths through greatest(off+maxr, -(off+minr)) must win
    for (flip <- Seq(false, true)) {
      val rows = Seq.tabulate(800)(_ => {
        val k = rnd.nextLong() % 20000L
        val c1 = rnd.nextInt(if (k > 0 ^ flip) 9 else 3).toLong
        val c2 = rnd.nextInt(if (k > 0 ^ flip) 3 else 9).toLong
        (k, c1, c2)
      }).distinctBy(_._1).filter(r => r._2 + r._3 > 0)
      val n1 = rows.map(_._2).sum
      val n2 = rows.map(_._3).sum
      val sorted = rows.sortBy(_._1)
      val expected = sorted.scanLeft(0L) { case (acc, (_, c1, c2)) =>
        acc + c1 * n2 - c2 * n1 }.tail.map(math.abs).max
      val got = PrefixSums.maxEcdfCrossGap(rows.toDF("k", "c1", "c2"),
        "k", "c1", "c2").head()
      assert(got.getDecimal(0).longValueExact() === n1, s"flip=$flip")
      assert(got.getDecimal(1).longValueExact() === n2, s"flip=$flip")
      assert(got.getDecimal(2).longValueExact() === expected,
        s"flip=$flip")
    }
    // identical per-key counts → every prefix term is 0 → gap 0
    val same = Seq.tabulate(50)(i => (i.toLong * 3000L, 2L, 2L))
    assert(PrefixSums.maxEcdfCrossGap(same.toDF("k", "c1", "c2"),
      "k", "c1", "c2").head().getDecimal(2).longValueExact() === 0L)
  }

  test("exclusiveOffsets plans no single-partition global window") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong * 37L, 1L)).toDF("k", "t")
    val plan = PrefixSums.exclusiveOffsets(df, "k", "t", "off")
      .queryExecution.executedPlan.toString
    // every Window node must carry a partition spec; an empty one
    // renders as "Window [...], [k#..]" with no partitionBy list
    val windowLines = plan.linesIterator.filter(_.contains("Window "))
    assert(windowLines.forall(_.contains("windowspecdefinition(_sb")),
      plan)
  }
}
