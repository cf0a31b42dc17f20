package graft

import graft.operators.FuzzyMatch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyMatchSpec extends AnyFunSuite with SparkSpec {

  test("dictionary pairs: exact distances, dedup of rows, blocking contract") {
    import spark.implicits._
    val rows = Seq(
      "red widget", "red widgett", "red wdget",   // 1 edit from the first
      "red widget",                               // duplicate row: one dict entry
      "blue bolt", "blue boltt",
      "bluu bolt")                                // first-token typo: NOT blocked
      .toDF("name")
    val got = FuzzyMatch.dictionaryPairs(rows, "name", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(
      ("red wdget", "red widget", 1),
      ("red wdget", "red widgett", 2),
      ("red widget", "red widgett", 1),
      ("blue bolt", "blue boltt", 1)))
    // ordering invariant: name_a < name_b, so no mirror duplicates
    val all = FuzzyMatch.dictionaryPairs(rows, "name", 2)
    assert(all.filter(col("name_a") >= col("name_b")).count() === 0)
  }

  test("part-name dictionary matching stays dictionary-sized") {
    val part = Tables.part(spark, sf)
    val dict = part.select("p_name").distinct().count()
    val pairs = FuzzyMatch.dictionaryPairs(part, "p_name", 3)
    // pair universe is bounded by the dictionary, not the fact table
    assert(pairs.count() <= dict * (dict - 1) / 2)
    assert(pairs.count() > 0)
    assert(pairs.filter(col("dist") > 3).count() === 0)
  }
}
