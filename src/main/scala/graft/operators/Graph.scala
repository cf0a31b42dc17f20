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
    val ccKey = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val ccPrev = spark.conf.getOption(ccKey)
    spark.conf.set(ccKey, "true")
    try {
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
    } finally ccPrev match {
      case Some(v) => spark.conf.set(ccKey, v)
      case None => spark.conf.unset(ccKey)
    }
  }
}
