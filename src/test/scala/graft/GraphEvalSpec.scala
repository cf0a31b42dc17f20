package graft

import graft.operators.{Eval, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphEvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("pageRank on a known 3-node chain matches hand arithmetic") {
    // 1 -> 2 -> 3: n=3, start 333333 each
    // i1: node2 gets 333333, node3 gets 333333
    //   r1 = 50000 + 850*inflow//1000: n1=50000, n2=n3=333333
    // i2: node2 <- n1//1 = 50000; node3 <- n2//1 = 333333
    //   r2: n1=50000, n2=50000+42500=92500, n3=333333
    // i3: node2 <- 50000; node3 <- 92500
    //   r3: n1=50000, n2=92500, n3=50000+78625=128625
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 50000L, 2L -> 92500L, 3L -> 128625L))
  }

  test("q_hits arithmetic: on a star the hub authority normalizes to " +
    "exactly 1e6 and a leaf authority to its in-degree share") {
    // 3 hubs each point at A; 1 hub points at B:
    // a1: A=3e6, B=1e6 → a1n: A=1e6, B=333333
    // h1(s->A,B both)=1333333, pure-A hubs=1e6 → h1n: 1e6 / 750000
    // a2(A)= for hubs: say hubs 1,2 -> A only; hub 3 -> A and B
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
      .toDF("src", "dst")
    def normed(scores: org.apache.spark.sql.DataFrame, c: String) =
      scores.crossJoin(broadcast(scores.agg(max(col(c)).as("mx"))))
        .select(col("node"),
          expr(s"CAST((1000000 * CAST($c AS DECIMAL(38,0))) div mx" +
            " AS BIGINT)").as(c + "n"))
    val a1 = normed(e.groupBy(col("dst").as("node"))
      .agg((count(lit(1)) * 1000000L).as("a1")), "a1")
    val h1 = normed(e.join(a1, e("dst") === a1("node"))
      .groupBy(e("src").as("node")).agg(sum(col("a1n")).as("h1")), "h1")
    val a2 = normed(e.join(h1, e("src") === h1("node"))
      .groupBy(e("dst").as("node")).agg(sum(col("h1n")).as("a2")), "a2")
    val a1m = a1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1m === Map(10L -> 1000000L, 11L -> 333333L))
    val h1m = h1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hub 3 holds A(1e6) + B(333333) = 1333333 → normalizes to 1e6;
    // hubs 1, 2 hold 1e6 → 1000000e6/1333333 = 750000
    assert(h1m === Map(3L -> 1000000L, 1L -> 750000L, 2L -> 750000L))
    val a2m = a2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A: 750000+750000+1000000 = 2.5e6 → 1e6; B: 1e6 → 400000
    assert(a2m === Map(10L -> 1000000L, 11L -> 400000L))
  }

  test("pageRank conserves non-dangling structure: sink outranks sources") {
    // star: many sources point at one hub
    val edges = (1L to 9L).map(i => (i, 100L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(100L) > ranks(1L) * 5, s"hub should dominate: $ranks")
    // duplicate edges must not double-count (distinct by contract)
    val dup = edges.union(edges)
    val ranks2 = Graph.pageRank(dup, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks2 === ranks)
  }

  test("connectedComponents: chain + pair + isolated-free, min-id labels") {
    // chain 0-..-9 (diameter 9 exercises pointer jumping past one
    // round), a disjoint pair, and a self-loop-only node (dropped by
    // the caller contract: src != dst edges only reach the operator)
    val edges = ((0L until 9L).map(i => (i, i + 1)) ++ Seq((100L, 200L)))
      .toDF("src", "dst")
    val got = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L to 9L).map(_ -> 0L).toMap ++
      Map(100L -> 100L, 200L -> 100L)
    assert(got === expected)
  }

  test("extendComponents == full rebuild on seeded random graphs, " +
    "including brand-new nodes and cross-component merges") {
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      // base on nodes 0..59; batch reaches into 60..89 so it links
      // existing components AND introduces unseen nodes
      val base = Seq.fill(50)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(t => t._1 != t._2)
      val batch = Seq.fill(25)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
        .filter(t => t._1 != t._2)
      val incremental = Graph.extendComponents(
          Graph.connectedComponents(base.toDF("src", "dst")),
          batch.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rebuilt = Graph.connectedComponents(
          (base ++ batch).toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incremental === rebuilt, s"seed $seed")
      // chained daily admissions: extending the extended labeling
      // with a second batch still equals one rebuild of everything
      val batch2 = Seq.fill(20)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter(t => t._1 != t._2)
      val chained = Graph.extendComponents(
          Graph.extendComponents(
            Graph.connectedComponents(base.toDF("src", "dst")),
            batch.toDF("src", "dst")),
          batch2.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rebuilt2 = Graph.connectedComponents(
          (base ++ batch ++ batch2).toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(chained === rebuilt2, s"chained, seed $seed")
    }
  }

  test("triangleCount: hand-counted graph, duplicates/reversals/loops inert") {
    // K4 minus edge {3,4} plus a pendant: triangles {1,2,3}, {1,2,4}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (4L, 5L)).toDF("src", "dst")
    val r = Graph.triangleCount(edges).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 2L)
    // reversed duplicates and self-loops change nothing
    val noisy = edges.union(
      Seq((2L, 1L), (3L, 1L), (5L, 5L)).toDF("src", "dst"))
    val r2 = Graph.triangleCount(noisy).collect()(0)
    assert(r2.getAs[Long]("n_edges") === 6L)
    assert(r2.getAs[Long]("n_triangles") === 2L)
  }

  test("triangleCount: wedge bound holds on a skewed star") {
    // star = no triangles; orientation must point INTO the hub, so
    // wedge count is 0 — the Σdeg² naive count would be C(9,2)=36
    val star = (1L to 9L).map(i => (i, 100L)).toDF("src", "dst")
    val r = Graph.triangleCount(star).collect()(0)
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Long]("n_wedges") === 0L)
  }

  test("triangleCount matches the brute-force triple scan on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 4) {
      val n = 12
      val edges = for {
        i <- 0 until n; j <- i + 1 until n if rnd.nextInt(3) == 0
      } yield (i.toLong, j.toLong)
      val es = edges.toSet
      val expected = (for {
        i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n
        if es((i.toLong, j.toLong)) && es((j.toLong, k.toLong)) &&
          es((i.toLong, k.toLong))
      } yield 1).size.toLong
      val got = Graph.triangleCount(edges.toDF("src", "dst"))
        .collect()(0).getAs[Long]("n_triangles")
      assert(got === expected, s"edges: $edges")
    }
  }

  test("kCore: hand-peeled trajectory, pendant chain collapses") {
    // triangle {1,2,3} + chain 3-4-5: k=2 round 1 peels 5 (deg 1),
    // round 2 peels 4 (deg dropped to 1), round 3 stable at the
    // triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(got === List((1, 4L, 4L), (2, 3L, 3L), (3, 3L, 3L)))
  }

  test("sssp: hand-computed weighted distances, relaxation beats the " +
      "greedy hop path, beyond-budget nodes stay unreached") {
    import spark.implicits._
    // 1 →(10) 2 →(1) 3 →(1) 4 →(1) 5 →(1) 6 ; shortcut 1 →(1) 4
    // seeds {1}: dist(4) = 1 via the shortcut, dist(3) = 11 via 2;
    // node 6 is 3 hops past the shortcut — within rounds=4 at dist 3
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.sssp(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 10L, 3L -> 11L, 4L -> 1L,
      5L -> 2L, 6L -> 3L))
    // rounds=1 truncates: only direct neighbors reached
    val r1 = Graph.sssp(edges, seeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 0L, 2L -> 10L, 4L -> 1L))
    // multi-source: nearest seed wins
    val ms = Graph.sssp(edges, Seq(1L, 5L).toDF("node"), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ms(6L) === 1L && ms(4L) === 1L && ms(5L) === 0L)
  }

  test("labelPropagation: two cliques joined by a bridge keep their " +
      "own min-id communities; a clique converges to its min id") {
    import spark.implicits._
    def undirected(ps: Seq[(Long, Long)]) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    // cliques {1,2,3} and {10,11,12} joined by bridge 3-10
    val g = undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)))
    val got = Graph.labelPropagation(g, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-run synchronous rounds: r1 votes are neighbor self-labels
    // (3's id crosses the bridge into 10), r2/r3 settle each clique on
    // one label — left on its min id 1, right on the leaked bridge
    // label 3. The two communities stay DISTINCT: the single bridge
    // never merges them, which is what separates LPA from CC.
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), s"got $got")
  }

  test("calibrationBins and thresholdMetrics match closed-form " +
      "hand-computed values, F1 harmonic mean exact") {
    import spark.implicits._
    val toy = Seq((950L, 1L), (850L, 1L), (450L, 0L), (50L, 0L))
      .toDF("s", "y")
    val cal = Eval.calibrationBins(toy, col("s"), col("y"), bins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(cal(9L) === ((1L, 1L, 950L, 1000L)))
    assert(cal(8L) === ((1L, 1L, 850L, 1000L)))
    assert(cal(4L) === ((1L, 0L, 450L, 0L)))
    assert(cal(0L) === ((1L, 0L, 50L, 0L)))
    val th = Eval.thresholdMetrics(toy, col("s"), col("y"),
        Seq(500, 900))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // t=500: perfect split → P=R=F1=1000
    assert(th(500L) === ((2L, 0L, 0L, 2L, 1000L, 1000L, 1000L)))
    // t=900: one positive missed → R=500, F1 = 2000/3 = 666
    assert(th(900L) === ((1L, 0L, 1L, 2L, 1000L, 500L, 666L)))
  }

  test("aucMicro hits the closed-form corners") {
    // perfect separation: all positives score above all negatives
    val perfect = Seq((1L, 0L), (2L, 0L), (10L, 1L), (11L, 1L))
      .toDF("s", "l")
    assert(Eval.aucMicro(perfect, col("s"), col("l"))
      .head.getLong(2) === 1000000L)
    // inverted: AUC 0
    val inverted = Seq((10L, 0L), (11L, 0L), (1L, 1L), (2L, 1L))
      .toDF("s", "l")
    assert(Eval.aucMicro(inverted, col("s"), col("l"))
      .head.getLong(2) === 0L)
    // all ties: avg rank everywhere -> exactly 1/2
    val ties = Seq((5L, 0L), (5L, 1L), (5L, 0L), (5L, 1L)).toDF("s", "l")
    assert(Eval.aucMicro(ties, col("s"), col("l"))
      .head.getLong(2) === 500000L)
  }
}
