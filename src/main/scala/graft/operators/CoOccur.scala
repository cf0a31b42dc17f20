package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-engagement / co-occurrence pair mining — the "frequently bought
  * together" primitive behind recommendation candidate generation and
  * bipartite-graph projection (users×items → item-item edges).
  *
  * Scale discipline: the pair generator is a self-join of baskets on
  * the group key, so its cost is Σ|basket|² — bounded ONLY if baskets
  * are. `maxBasket` drops groups above the cap before pairing (the
  * standard skew guard: a crawler or bot account with 10⁵ items would
  * otherwise contribute 10¹⁰ pairs and dominate both cost and counts
  * with noise). The cap is part of the operator's contract and the
  * gate's oracle mirrors it, so the bound is gate-visible. Basket
  * membership is deduplicated first — a pair counts once per group.
  */
object CoOccur {

  /** Item pairs co-occurring within the same group: `(item_a, item_b,
    * n_co)` with `item_a < item_b`, counting GROUPS (not rows), over
    * groups of ≤ `maxBasket` distinct items.
    *
    * `finish` runs INSIDE the pinned-basket scope (pass the caller's
    * filter/top-k so only the bounded answer materializes); the
    * result is pinned via localCheckpoint and the basket pin is
    * released before returning — a long-lived session accumulates no
    * basket frames (the Graph.pageRank discipline). NOTE the
    * checkpoint is EAGER at call time: with the default
    * `finish = identity` the FULL pair table materializes here — at
    * scale always pass a bounding `finish` (or use
    * [[buildRulesTable]] and read the stored table).
    */
  def pairCounts(df: DataFrame, groupCol: String, itemCol: String,
                 maxBasket: Int,
                 finish: DataFrame => DataFrame = identity): DataFrame = {
    val bounded = boundedBaskets(df, groupCol, itemCol, maxBasket)
    val out = finish(pairCountsOf(bounded)).localCheckpoint(true)
    bounded.unpersist(blocking = false)
    out
  }

  /** Association RULES from the same capped projection: each
    * unordered pair annotated with the exact integer rule metrics —
    * support (µ of baskets containing both), directional confidence
    * (‰ of a's baskets that also hold b, and the reverse), and lift
    * (µ, observed/independence co-rate). All counts come from the SAME
    * capped basket set, so the skew guard governs every metric
    * consistently; numerators ride DECIMAL(38,0) (n_co·N crosses 2^63
    * past ~9e12 pair-basket products).
    */
  def associationRules(df: DataFrame, groupCol: String, itemCol: String,
                       maxBasket: Int,
                       finish: DataFrame => DataFrame = identity): DataFrame = {
    val bounded = boundedBaskets(df, groupCol, itemCol, maxBasket)
    // same release discipline as pairCounts: finish inside the pin
    // scope, checkpoint the bounded answer, drop the basket pin
    val out = finish(rulesOf(bounded)).localCheckpoint(true)
    bounded.unpersist(blocking = false)
    out
  }

  /** Build-once MATERIALIZATION of the capped rule table (the B45
    * sketch-table discipline applied to co-occurrence): derives
    * [[associationRules]] restricted to `n_co >= minCo` and writes it
    * to `path` as parquet. Serving consumers (co-purchase top-k, lift
    * ranking, item-item similar-items) read the stored table instead
    * of each re-paying the Σ|basket|² projection — at scale the
    * projection is a scheduled build job, not a per-query cost. The
    * support floor is part of the STORED table's contract: readers
    * cannot see below `minCo`, so every consumer must want the same
    * (or a higher) floor.
    */
  def buildRulesTable(df: DataFrame, groupCol: String, itemCol: String,
                      maxBasket: Int, minCo: Long, path: String): Unit = {
    val bounded = boundedBaskets(df, groupCol, itemCol, maxBasket)
    rulesOf(bounded).filter(col("n_co") >= minCo)
      .write.mode("overwrite").parquet(path)
    bounded.unpersist(blocking = false)
  }

  private def rulesOf(bounded: DataFrame): DataFrame = {
    val itemCnt = bounded.groupBy(col("it")).agg(count(lit(1)).as("n_i"))
    val nGroups = bounded.agg(
      countDistinct(col("g")).as("n_groups"))
    pairCountsOf(bounded)
      .join(itemCnt.select(col("it").as("item_a"), col("n_i").as("n_a")),
        "item_a")
      .join(itemCnt.select(col("it").as("item_b"), col("n_i").as("n_b")),
        "item_b")
      .crossJoin(broadcast(nGroups))
      .select(col("item_a"), col("item_b"), col("n_co"),
        expr("(1000000 * CAST(n_co AS DECIMAL(38,0))) div n_groups")
          .cast("long").as("support_micro"),
        expr("(1000 * n_co) div n_a").as("conf_ab_permille"),
        expr("(1000 * n_co) div n_b").as("conf_ba_permille"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_co * n_groups)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("lift_micro"))
  }

  /** Distinct membership, groups above `maxBasket` dropped.
    * Persisted + eagerly filled (the ngramJaccard pattern): the pair
    * self-join reads it twice and the rule metrics add two more
    * consumers — unpinned, each re-runs the source join + distinct
    * (measured 3.0 s → 1.9 s on the rule query at sf0.1). Two longs
    * per row; callers unpersist it before returning.
    */
  private def boundedBaskets(df: DataFrame, groupCol: String,
                             itemCol: String, maxBasket: Int): DataFrame = {
    val b = df.select(col(groupCol).as("g"), col(itemCol).as("it"))
      .distinct()
    val small = b.groupBy(col("g")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket)
      .select(col("g"))
    val bounded = b.join(small, Seq("g"), "left_semi").persist()
    bounded.count()
    bounded
  }

  private def pairCountsOf(bounded: DataFrame): DataFrame =
    bounded.alias("a").join(bounded.alias("b"),
        col("a.g") === col("b.g") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("item_a"), col("b.it").as("item_b"))
      .agg(count(lit(1)).as("n_co"))
}
