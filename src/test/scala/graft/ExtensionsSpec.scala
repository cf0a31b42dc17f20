package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("GraftExtensions makes kernel functions available to plain SQL") {
    spark // force shared session (and its SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = extended
        .sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head.getDouble(0)
      assert(dot === 11.0)
      val sh = extended
        .sql("SELECT graft_simhash64(array('a','b','c')) AS s").head.getLong(0)
      val fp = extended
        .sql("SELECT graft_fingerprint64(array('a','b','c')) AS f").head.getLong(0)
      assert(sh !== 0L)
      assert(fp !== 0L)
    } finally {
      SparkSession.setDefaultSession(SparkSpec.session)
      SparkSession.setActiveSession(SparkSpec.session)
    }
  }
}
