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
  * the rank table enters each round hash-partitioned on `node` (the
  * join key), so the message join is exchange-free on both sides; the
  * only per-round exchange is the groupBy(dst) message aggregation,
  * whose output partitioning then feeds the node-frame join
  * exchange-free again. Ranks are key+counter rows, never payload
  * bytes; total cost is iters × O(|E|) through one shuffle each.
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
    */
  def pageRank(edges: DataFrame, iters: Int,
               dampingPermille: Int = 850,
               checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1 && dampingPermille >= 0 && dampingPermille <= 1000)
    // every iteration re-reads the edge and node tables — without
    // pinning them the final plan's lineage re-derives the base
    // tables once PER ITERATION (measured: 44 scans / 43 shuffles for
    // 3 rounds). repartition(src) BEFORE the persist: the cached
    // partitioning is what every round's message join reuses.
    // Eager fill (ngramJaccard pattern): concurrent lazily-filling
    // consumers serialize on per-block cache-fill locks (measured
    // 2.5s → 21s at sf0.1 when left lazy).
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
    em.count()
    val nodes = em.select(col("src").as("node"))
      .union(em.select(col("dst").as("node"))).distinct()
    // node count rides along as a broadcast 1-row frame: no driver
    // action, the plan stays lazy end to end
    val total = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    val base = 1000L * (1000 - dampingPermille)
    // node frame with both the uniform start and the per-round base
    // term precomputed — one cached copy, partitioned on the join
    // key, serves every iteration
    val nb = nodes.crossJoin(total)
      .select(col("node"), expr("1000000 div n_nodes").as("pr0"),
        expr(s"$base div n_nodes").as("base_pr"))
      .repartition(col("node")).persist()
    nb.count()
    var ranks = nb.select(col("node"), col("pr0").as("pr"))
    for (i <- 1 to iters) {
      // shuffle_hash: a sort-merge join would re-sort the pinned
      // edge cache every round; hash-building on the node-sized side
      // keeps the cached edge partitions streaming as-is
      val inflow = em.join(ranks.hint("shuffle_hash"),
          em("src") === ranks("node"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nb.join(inflow.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          (col("base_pr") +
            expr(s"($dampingPermille * coalesce(inflow, cast(0 as bigint)))" +
              " div 1000")).cast(LongType).as("pr"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    val result = ranks.localCheckpoint(true)
    em.unpersist(blocking = false)
    nb.unpersist(blocking = false)
    result
  }
}
