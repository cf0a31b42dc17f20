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
}
