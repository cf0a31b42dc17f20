package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (edit distance) — the entity-
  * resolution primitive behind catalog normalization: find dictionary
  * values that are typo-level variants of each other.
  *
  * Scale shape: fuzzy matching is run on the DISTINCT value
  * dictionary, never the fact rows — a catalog column's dictionary is
  * orders of magnitude smaller than the table, and row-level
  * consolidation is then one broadcast map join. Candidates come from
  * an equi-join on a cheap blocking key (first token), so the
  * quadratic levenshtein verify runs per block, not per dictionary —
  * the standard blocking tradeoff: typos in the blocking token itself
  * are missed, and the gate's oracle mirrors the same blocking so the
  * contract is exact over what the operator promises. Both `
  * levenshtein` implementations (Spark, DuckDB) are the plain DP edit
  * distance, so verified distances are engine-exact integers.
  */
object FuzzyMatch {

  /** All distinct-value pairs of `strCol` within `maxDist` edits,
    * candidates blocked on the first whitespace token:
    * `(name_a, name_b, dist)` with `name_a < name_b`.
    */
  def dictionaryPairs(df: DataFrame, strCol: String,
                      maxDist: Int): DataFrame = {
    val names = df.select(col(strCol).as("name")).distinct()
      .withColumn("blk", substring_index(col("name"), " ", 1))
    names.alias("a").join(names.alias("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("dist"))
  }

  /** COMPLETE edit-distance-1 pairs over the distinct value dictionary
    * via the deletion-neighborhood index (the FastSS / SymSpell
    * trick): `ed(a,b) ≤ 1` implies `N(a) ∩ N(b) ≠ ∅` where
    * `N(s) = {s} ∪ {s with one char deleted}` — a deletion from one
    * side covers insert/delete edits, matching single-deletion forms
    * covers substitutions. Candidates come from ONE equi-join on the
    * deletion key, then the exact levenshtein verify keeps true pairs,
    * so unlike [[dictionaryPairs]]' first-token blocking this finds
    * EVERY distance-1 pair — including first-character typos —
    * without an O(n²) dictionary self-join (spec-asserted against the
    * naive join).
    *
    * Scale shape: the key table is Σ(len+1) rows over the dictionary
    * (dictionary-sized × mean length, never fact-sized); the join
    * shuffles on well-spread string keys; duplicate candidate routes
    * (a pair can share several deletion keys) dedup at candidate
    * volume. Returns `(name_a, name_b, dist)`, `name_a < name_b`,
    * `dist ≤ 1`.
    */
  def deletionNeighborhoodPairs(df: DataFrame,
                                strCol: String): DataFrame = {
    val keyed = df.select(col(strCol).as("name")).distinct()
      .select(col("name"), explode(expr(
        "transform(sequence(0, length(name)), i -> CASE WHEN i = 0 " +
          "THEN name ELSE concat(substring(name, 1, i - 1), " +
          "substring(name, i + 1, length(name))) END)")).as("k"))
      .distinct() // deleting either of two equal adjacent chars
                  // yields the same key — one route is enough
    keyed.alias("a").join(keyed.alias("b"),
        col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .dropDuplicates("name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
  }
}
