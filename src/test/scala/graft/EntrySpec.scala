package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite with SparkSpec {

  test("entry (flagship fraud pipeline) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is non-empty on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("oracle SQL exists only for declared queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle for unknown queries: $unknown")
  }

  test("SURVEY section 2 and the queries map agree") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val surveyNames = "query `([a-z0-9_]+)`".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val missingImpl = surveyNames -- SparkEntry.queries.keySet
    assert(missingImpl.isEmpty, s"SURVEY names without implementation: $missingImpl")
    val undocumented = SparkEntry.queries.keySet -- surveyNames
    assert(undocumented.isEmpty, s"queries not in SURVEY section 2: $undocumented")
  }
}
