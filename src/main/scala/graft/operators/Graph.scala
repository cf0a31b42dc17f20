package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-iteration graph analytics over edge DataFrames.
  *
  * PageRank here is integer fixed-point: ranks live in micro units
  * (Σ≈1e6), every division is a positive-operand floor division, and
  * the iteration count is fixed — so two engines running the same
  * arithmetic land on the SAME integers, and the driver's hash oracle
  * can check an iterative graph computation exactly (float PageRank
  * can only ever be tolerance-gated). Dangling-node mass is dropped,
  * not redistributed — the simpler contract, stated here so the
  * oracle mirrors it.
  *
  * Scale shape: ONE shuffle per iteration. The edge table is pinned
  * hash-partitioned on `src` with the out-degree folded in (a window
  * over the pinned partitioning — no join, no extra exchange), and
  * the rank/node frame is the pinned distinct-node cache, so the
  * message join is exchange-free on both sides; the only per-round
  * exchange is the groupBy(dst) message aggregation, whose output
  * partitioning then feeds the node-frame join exchange-free again.
  * Ranks are key+counter rows, never payload bytes; total cost is
  * iters × O(|E|) through one shuffle each.
  *
  * Loop-scoped conf: `canChangeCachedPlanOutputPartitioning=true`
  * (restored on exit) lets AQE right-size every stage that reads the
  * pinned caches. Without it the cached 32-way layout is frozen into
  * each round and the final materialization re-runs wide stages over
  * per-task constant overhead — measured at sf0.1 this one flag plus
  * the literal node-count rewrite cut the query 5.1 s → 2.2 s and its
  * task time 74 CPU-s → 4 CPU-s at identical output. At cluster scale
  * the same flag simply lets AQE pick partition counts from bytes,
  * which is the behavior every non-cached stage already has.
  */
object Graph {

  /** `edges`: two LongType columns `src`, `dst` (pre-namespaced by
    * the caller if the id spaces overlap). Returns (node, pr) with pr
    * in micro units after `iters` damped rounds from a uniform start.
    *
    * The result is materialized (localCheckpoint) before returning so
    * the loop's pinned inputs can be unpersisted here instead of
    * leaking into the caller's session, and so the returned plan is
    * three nodes instead of `iters` nested join rounds. Long
    * iteration budgets stay planner-safe the same way: lineage is cut
    * every `checkpointEvery` rounds.
    *
    * The node count is pulled to the driver once (one Long — the same
    * bounded-scalar class as em's eager-fill count) and folded into
    * the start/base ranks as literals: the old broadcast-1-row
    * crossJoin recomputed the distinct-node shuffle twice and pinned
    * an extra cached frame for nothing.
    */
  def pageRank(edges: DataFrame, iters: Int,
               dampingPermille: Int = 850,
               checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1 && dampingPermille >= 0 && dampingPermille <= 1000)
    val spark = edges.sparkSession
    ConfScope.withCachedPlanRepartitioning(spark) {
      // every iteration re-reads the edge and node tables — without
      // pinning them the final plan's lineage re-derives the base
      // tables once PER ITERATION (measured: 44 scans / 43 shuffles
      // for 3 rounds). repartition(src) BEFORE the persist: the
      // cached partitioning is what every round's message join
      // reuses. Eager fill (ngramJaccard pattern): concurrent
      // lazily-filling consumers serialize on per-block cache-fill
      // locks (measured 2.5s → 21s at sf0.1 when left lazy).
      // repartition BEFORE the dedup: HashPartitioning(src) satisfies
      // the (src,dst) clustering requirement (same src ⇒ same
      // partition), so dropDuplicates runs partition-local and the
      // whole edge-cache build is ONE exchange
      val e = edges.select(col("src").cast(LongType),
          col("dst").cast(LongType))
        .repartition(col("src"))
        .dropDuplicates("src", "dst")
      val em = e.withColumn("deg",
        count(lit(1)).over(Window.partitionBy(col("src")))).persist()
      // ONE action fills BOTH pins (measured: a separate eager
      // em.count() costs +0.6 s steady-state here — the fill job's
      // AQE-chosen cached layout is worse for the loop's join than
      // the layout chosen when the fill runs inside the node job;
      // an explode-based single-scan variant measured +0.35 s vs
      // this union). Cold first runs pay ~2 s of fill contention
      // between the union legs — the min-of-reps steady state is
      // what the loop's daily users and the bench gate both see.
      val nodes = em.select(col("src").as("node"))
        .union(em.select(col("dst").as("node"))).distinct().persist()
      val nNodes = nodes.count()
      if (nNodes == 0) {
        val empty = nodes.select(col("node"), lit(0L).as("pr"))
          .localCheckpoint(true)
        em.unpersist(blocking = false)
        nodes.unpersist(blocking = false)
        return empty
      }
      val base = 1000L * (1000 - dampingPermille)
      // per-round zero seed: unioning (node, 0) rows into the message
      // stream folds the old "left-join ranks back onto the node
      // frame" step INTO the aggregation — sum(c) over messages ∪
      // zeros ≡ coalesce(inflow, 0), one join and one hash-build
      // fewer per round
      val zeros = nodes.select(col("node"), lit(0L).as("c"))
      var ranks = nodes.select(col("node"),
        lit(1000000L / nNodes).as("pr"))
      for (i <- 1 to iters) {
        // shuffle_hash: a sort-merge join would re-sort the pinned
        // edge cache every round; hash-building on the node-sized
        // side keeps the cached edge partitions streaming as-is
        val msgs = em.join(ranks.hint("shuffle_hash"),
            em("src") === ranks("node"))
          .select(col("dst").as("node"), expr("pr div deg").as("c"))
        ranks = msgs.unionByName(zeros)
          .groupBy(col("node"))
          .agg((lit(base / nNodes) +
            expr(s"($dampingPermille * sum(c)) div 1000"))
            .cast(LongType).as("pr"))
        if (i % checkpointEvery == 0 && i < iters)
          ranks = ranks.localCheckpoint(true)
      }
      val result = ranks.localCheckpoint(true)
      em.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      result
    }
  }

  /** Exact global triangle count via degree-ordered orientation —
    * the standard scale discipline for the heaviest relational graph
    * pattern: orienting every undirected edge from its lower- to its
    * higher-degree endpoint (ties by node id — a total order) bounds
    * every out-degree by O(√m), so the wedge join generates at most
    * O(m^1.5) candidate rows instead of Σdeg² — the difference
    * between a skewed hub exploding the join and a plan that holds
    * at any scale. Wedges close into triangles with ONE further
    * equi-join against the oriented edge set; each triangle is
    * counted exactly once (its two lowest-ordered endpoints form the
    * wedge).
    *
    * Returns one row: (n_nodes, n_edges, n_wedges, n_triangles) —
    * n_wedges is the orientation's candidate count, published so a
    * regression in the orientation (the scale property) is itself
    * gate-visible, not just the final triangle count.
    *
    * Plan shape: canonicalize+dedup is one (a,b) shuffle; degrees
    * are one explode + count; the orientation join is edge ⋈
    * broadcast-able degree table (node-sized); wedge and closure
    * joins are equi-joins on oriented endpoints. No cross products
    * anywhere.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).cast(LongType).as("a"),
        greatest(col("src"), col("dst")).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    und.count() // eager fill: degree + two orientation consumers
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg(a), a) < (deg(b), b): zero-padded
    // (deg, id) strings give the lexicographic = numeric total order
    // (the q_aggfuncs selection-key trick)
    val key = (d: org.apache.spark.sql.Column,
               v: org.apache.spark.sql.Column) =>
      concat(lpad(d.cast("string"), 10, "0"), lpad(v.cast("string"), 19, "0"))
    val oriented = und
      .join(broadcast(deg).withColumnRenamed("v", "a")
        .withColumnRenamed("deg", "deg_a"), "a")
      .join(broadcast(deg).withColumnRenamed("v", "b")
        .withColumnRenamed("deg", "deg_b"), "b")
      .select(
        when(key(col("deg_a"), col("a")) < key(col("deg_b"), col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(key(col("deg_a"), col("a")) < key(col("deg_b"), col("b")),
          col("b")).otherwise(col("a")).as("hi"))
      .persist()
    oriented.count() // eager fill: wedge self-join + wedge-count consumers
    // wedge endpoints come out id-ordered (e1.hi < e2.hi), and und is
    // id-canonical (a < b) — so closure is a PURE equi-join on (a, b).
    // An either-orientation OR-condition here would plan as a nested
    // loop; the id-canonical probe keeps it hash-joinable.
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.hi").as("a"), col("e2.hi").as("b"))
    val closures = wedges.join(und, Seq("a", "b"), "left_semi")
    // wedge count from out-degrees (Σ C(d_out, 2)) — never a second
    // pass over the materialized wedge rows
    val nWedges = oriented.groupBy(col("lo"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("n_wedges"))
    val out = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(nWedges)
      .crossJoin(closures.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"),
        coalesce(col("n_wedges"), lit(0L)).as("n_wedges"),
        col("n_triangles"))
      .localCheckpoint(true)
    und.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    out
  }

  /** Bounded-round k-core peeling — the degree-based quality filter
    * web-graph pipelines run before trusting link structure: each
    * round drops every node of degree < k (and the edges touching
    * it), a FIXED `rounds` times. A fixed budget instead of
    * peel-to-fixpoint makes the iteration engine-exact (the pageRank
    * argument); each round's survivor graph converges monotonically
    * toward the true k-core, and the per-round (n_nodes, n_edges)
    * trajectory is itself the output — so the oracle checks every
    * round, not just a fixpoint.
    *
    * Returns one row per round: (peel_round, n_nodes, n_edges).
    * Counts are pulled to the driver per round (two Longs — the
    * bounded-scalar class) so the result is a lineage-free local
    * relation; the surviving edge set is re-pinned per round and the
    * previous pin freed (the pageRank loop discipline). Per-round
    * cost: one degree aggregation + two semi-joins over the
    * shrinking survivor edges — at any scale, rounds × O(|E|).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    var cur = edges
      .select(least(col("src"), col("dst")).cast(LongType).as("a"),
        greatest(col("src"), col("dst")).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    cur.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (round <- 1 to rounds) {
      val deg = cur.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("v"))
      val next = cur
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .persist()
      val nEdges = next.count() // eager fill + the round's edge count
      val nNodes = next.select(explode(array(col("a"), col("b"))).as("v"))
        .distinct().count()
      out += ((round, nNodes, nEdges))
      cur.unpersist(blocking = false)
      cur = next
    }
    cur.unpersist(blocking = false)
    out.toSeq.toDF("peel_round", "n_nodes", "n_edges")
  }

  /** Bounded-round multi-source SSSP (weighted BFS): after `rounds`
    * relaxation rounds, every node's minimum path weight to its
    * nearest seed over paths of ≤ `rounds` edges — the remaining
    * standard graph member beside PageRank/CC/k-core/triangles
    * (nearest-facility distances, crawl-frontier depth, influence
    * radius). A FIXED round budget makes the iteration engine-exact
    * (the kCore/pageRank argument): the oracle unrolls the same
    * `rounds` min-relaxations and must land on identical integer
    * distances — no convergence judgment in the contract.
    *
    * `edges` needs (`src`, `dst`, `w`) with non-negative integral
    * weights (directed; pass both directions for undirected graphs);
    * `sources` one `node` column. Returns (node, dist) for nodes
    * within `rounds` hops of any seed; seeds are at distance 0.
    *
    * Scale shape: the edge table is pinned repartitioned on `src`
    * (every round's relaxation join reuses the cached layout — the
    * pageRank discipline, loop-scoped AQE conf included); each round
    * is ONE shuffle-hash join plus one min-aggregation over the
    * frontier-sized distance table, localCheckpoint-ed so lineage
    * stays flat (distance rows are two longs — never payload). Cost:
    * rounds × O(|E| + |reached|).
    */
  def sssp(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = edges.sparkSession
    ConfScope.withCachedPlanRepartitioning(spark) {
      val e = edges.select(col("src").cast(LongType),
          col("dst").cast(LongType), col("w").cast(LongType))
        .repartition(col("src")).persist()
      e.count() // eager fill — every round's relaxation reads it
      var dist = sources
        .select(col("node").cast(LongType), lit(0L).as("dist"))
        .distinct().localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val relaxed = e.join(dist.hint("shuffle_hash"),
            e("src") === dist("node"))
          .select(col("dst").as("node"),
            (col("dist") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
      }
      e.unpersist(blocking = false)
      dist
    }
  }

  /** Bounded-round label-propagation community detection (LPA,
    * Raghavan et al. 2007) — the modularity-free community member of
    * the graph family: every node starts labelled with itself and
    * each SYNCHRONOUS round adopts the most frequent label among its
    * neighbors, ties to the smallest label — a deterministic total
    * order, so a FIXED round budget makes the iteration engine-exact
    * (the kCore/pageRank/sssp rule) and the oracle unrolls the same
    * rounds. Communities are denser than connected components: a
    * bridge edge joins components but rarely flips a majority.
    *
    * `edges` must carry both directions of each undirected edge;
    * duplicates are removed (message counts are mode votes — the
    * multiset must be canonical). Returns (node, lbl) after `rounds`.
    *
    * Scale shape: per round ONE shuffle-hash join of the pinned edge
    * table against the label frame, one (node, lbl) count, and one
    * max-of-struct argmax — `max(struct(cnt, -lbl))` picks
    * highest-count-then-lowest-label in a single hash aggregation, NO
    * per-node window over neighbor labels. Rounds × O(|E|).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = edges.sparkSession
    ConfScope.withCachedPlanRepartitioning(spark) {
      val e = edges.select(col("src").cast(LongType),
          col("dst").cast(LongType))
        .filter(col("src") =!= col("dst"))
        .repartition(col("src"))
        .dropDuplicates("src", "dst")
        .persist()
      e.count() // eager fill — every round's vote join reads it
      // with both directions present every node occurs as dst
      var labels = e.select(col("dst").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        labels = e.join(labels.hint("shuffle_hash"),
            e("src") === labels("node"))
          .select(col("dst").as("node"), col("lbl"))
          .groupBy(col("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("node"))
          .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("lbl"))
          .localCheckpoint(true)
      }
      e.unpersist(blocking = false)
      labels
    }
  }

  /** Connected components over an edge DataFrame (`src`, `dst`,
    * LongType): every node labelled with the MINIMUM node id in its
    * component — the graph-analytics face of the same min-label +
    * pointer-jumping engine that collapses near-duplicate pair lists
    * ([[graft.operators.Dedup.clusters]]); this entry point forces
    * the DISTRIBUTED propagation path (`driverEdgeThreshold = 0`), so
    * a caller gets the O(log diameter)-round, two-long-shuffle loop
    * regardless of edge-list size — the shape a 100 TB link graph
    * needs, where even the pair list is far beyond any driver pull.
    *
    * Converged output is deterministic (the min id reachable from
    * each node), so the result is exactly oracle-able without fixing
    * a round budget: an engine-independent transitive closure equals
    * it no matter how many rounds either side took. Convergence is
    * detected by the strictly-decreasing Σlabel aggregate; the loop
    * throws rather than return inconsistent labels if `2^25` hops
    * ever fail to cover a component's diameter.
    */
  def connectedComponents(edges: DataFrame): DataFrame =
    Dedup.clusters(edges, "src", "dst", driverEdgeThreshold = 0L)
      .select(col("doc_id").as("node"), col("cluster_id").as("component"))

  /** INCREMENTALLY fold a batch of new edges into a converged
    * [[connectedComponents]] labeling — the daily-admission shape
    * (dedup_minhash_inc's analog for graphs): cost tracks the BATCH,
    * the old graph's edges are never re-read.
    *
    * Correctness: with converged min-id labels, merging components
    * is itself a component problem on the LABEL graph — each new
    * edge (u,v) contributes the pair (label(u), label(v)), with a
    * previously-unseen endpoint standing in for itself. Min-label CC
    * over those pairs (bounded by the batch size, reusing
    * [[graft.operators.Dedup.clusters]] with its own driver fast
    * path / distributed escalation) yields a remap old-label →
    * merged-min; the result is the old labeling remapped plus the
    * batch's new nodes — and EQUALS a full rebuild of G ∪ batch
    * (spec-asserted on seeded random graphs), because the min id of
    * a merged class is the min over its member components' min ids.
    *
    * Scale shape: two broadcast-sized joins against the remap table
    * (≤ 2·|batch| labels) over the label table, one anti-join to
    * find new nodes; no iteration over old-graph data at all.
    */
  def extendComponents(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val e = newEdges
      .select(col("src").cast(LongType), col("dst").cast(LongType))
      .filter(col("src") =!= col("dst"))
      .persist()
    e.count() // eager: endpoint labeling + new-node sweep both read it
    val l = labels.select(col("node"), col("component"))
    val pairs = e
      .join(l.select(col("node").as("src"), col("component").as("ca")),
        Seq("src"), "left")
      .join(l.select(col("node").as("dst"), col("component").as("cb")),
        Seq("dst"), "left")
      .select(coalesce(col("ca"), col("src")).as("la"),
        coalesce(col("cb"), col("dst")).as("lb"))
      // same-component pairs merge nothing; dedup shrinks the label
      // graph to <= |batch| distinct pairs before clustering
      .filter(col("la") =!= col("lb")).distinct()
    val remap = Dedup.clusters(pairs, "la", "lb")
      .select(col("doc_id").as("old_label"), col("cluster_id").as("merged"))
    val newNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(l, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val out = l.unionByName(newNodes)
      .join(remap.withColumnRenamed("old_label", "component"),
        Seq("component"), "left")
      .select(col("node"),
        coalesce(col("merged"), col("component")).as("component"))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    out
  }
}
