package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale shape: each iteration is (edges ⋈ ranks on src) → groupBy
  * dst — the standard Pregel message round as two hash shuffles over
  * edge-count rows. Out-degrees are computed once outside the loop.
  * Ranks are key+counter rows, never payload bytes; for a fixed
  * iteration budget the total cost is iters × O(|E| shuffle). At
  * 1000 executors, hash-partitioning edges by src once lets every
  * iteration's build side reuse the same partitioning (AQE handles
  * the skewed-hub case).
  */
object Graph {

  /** `edges`: two LongType columns `src`, `dst` (pre-namespaced by
    * the caller if the id spaces overlap). Returns (node, pr) with pr
    * in micro units after `iters` damped rounds from a uniform start.
    */
  def pageRank(edges: DataFrame, iters: Int,
               dampingPermille: Int = 850): DataFrame = {
    require(iters >= 1 && dampingPermille >= 0 && dampingPermille <= 1000)
    // every iteration re-reads edges, out-degrees, and the node set —
    // without pinning them the final plan's lineage re-derives the
    // base tables once PER ITERATION (measured: 44 scans / 43
    // shuffles for 3 rounds). Persisted, the loop only adds its own
    // two joins + aggregate per round.
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType)).distinct().persist()
    // eager fill (ngramJaccard pattern): the final plan reads e and nb
    // once PER ITERATION concurrently — lazily-filling consumers
    // serialize on per-block cache-fill locks (measured 2.5s → 21s at
    // sf0.1 when left lazy)
    e.count()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // node count rides along as a broadcast 1-row frame: no driver
    // action, the plan stays lazy end to end
    val total = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist()
    val base = 1000L * (1000 - dampingPermille)
    // node frame with both the uniform start and the per-round base
    // term precomputed — one cached copy serves every iteration
    val nb = nodes.crossJoin(total)
      .select(col("node"), expr("1000000 div n_nodes").as("pr0"),
        expr(s"$base div n_nodes").as("base_pr")).persist()
    nb.count(); outdeg.count()
    var ranks = nb.select(col("node"), col("pr0").as("pr"))
    for (_ <- 1 to iters) {
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nb.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (col("base_pr") +
            expr(s"($dampingPermille * coalesce(inflow, cast(0 as bigint)))" +
              " div 1000")).cast(LongType).as("pr"))
    }
    ranks
  }
}
