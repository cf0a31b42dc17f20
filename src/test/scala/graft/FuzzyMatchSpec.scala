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

  test("deletion-neighborhood pairs are COMPLETE at distance 1 " +
      "(equal to the naive n² join), including first-char typos") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x51)
    val alphabet = "abcd"
    def word(n: Int) =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    // small alphabet + short words → dense genuine distance-1 pairs
    // via every edit type (substitution, insertion, deletion, and
    // first-character variants the token-blocking operator misses)
    val dict = (1 to 200).map(_ => word(3 + rnd.nextInt(4))).distinct
    val df = dict.toDF("name")
    val got = operators.FuzzyMatch.deletionNeighborhoodPairs(df, "name")
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    val naive = (for {
      a <- dict; b <- dict if a < b
      if levenshteinRef(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === naive)
    // the first-char-typo class is genuinely present in the data
    assert(naive.exists { case (a, b) =>
      a.length == b.length && a.substring(1) == b.substring(1) &&
        a.head != b.head })
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
