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
    */
  def pairCounts(df: DataFrame, groupCol: String, itemCol: String,
                 maxBasket: Int): DataFrame = {
    val b = df.select(col(groupCol).as("g"), col(itemCol).as("it"))
      .distinct()
    val small = b.groupBy(col("g")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket)
      .select(col("g"))
    val bounded = b.join(small, Seq("g"), "left_semi")
    bounded.alias("a").join(bounded.alias("b"),
        col("a.g") === col("b.g") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("item_a"), col("b.it").as("item_b"))
      .agg(count(lit(1)).as("n_co"))
  }
}
