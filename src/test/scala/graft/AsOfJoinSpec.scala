package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("union-trick as-of join equals the naive range-join + rank") {
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))

    val fast = AsOfJoin.join(e, o, "user_id", "ts", "o_orderdate",
        "o_orderkey", Seq("o_orderkey"))
      .select("event_id", "o_orderkey")

    val naive = {
      val j = e.join(o.withColumnRenamed("user_id", "r_user"),
        col("user_id") === col("r_user") && col("o_orderdate") <= col("ts"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("event_id", "o_orderkey")
    }

    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("as-of join is inclusive and respects per-timestamp tie-breaks") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (2L, 50L))
      .toDF("k", "t_l")
      .select(col("k"), col("t_l").cast("timestamp").as("tl"))
    val right = Seq((1L, 100L, 10L), (1L, 100L, 11L), (1L, 150L, 12L), (2L, 60L, 13L))
      .toDF("k", "t_r", "rid")
      .select(col("k"), col("t_r").cast("timestamp").as("tr"), col("rid"))
    val got = AsOfJoin.join(left, right, "k", "tl", "tr", "rid", Seq("rid"))
      .select(col("k"), unix_timestamp(col("tl")).as("tl"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // k=1 @100 matches rid 11 (inclusive, max tie-break);
    // k=1 @200 matches rid 12; k=2 @50 has no match (60 > 50) → dropped
    assert(got === Set((1L, 100L, 11L), (1L, 200L, 12L)))
  }

  test("string tie-breaks order natively; left-outer keeps unmatched rows") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 50L)).toDF("k", "t_l")
      .select(col("k"), col("t_l").cast("timestamp").as("tl"))
    // two right rows at the same timestamp tie-broken by a STRING id
    // ("b" > "a" — a cast-to-long tie would null both and pick either)
    val right = Seq((1L, 100L, "a", 10L), (1L, 100L, "b", 11L))
      .toDF("k", "t_r", "sid", "rid")
      .select(col("k"), col("t_r").cast("timestamp").as("tr"),
        col("sid"), col("rid"))
    val inner = AsOfJoin.join(left, right, "k", "tl", "tr", "sid", Seq("rid"))
      .select("k", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(inner.toSet === Set((1L, 11L))) // "b" wins the tie, k=2 dropped
    val outer = AsOfJoin.join(left, right, "k", "tl", "tr", "sid", Seq("rid"),
      dropUnmatched = false).select("k", "rid").collect()
    assert(outer.length === 2)
    assert(outer.filter(_.getLong(0) == 2L).forall(_.isNullAt(1)))
  }

  test("attached right columns come atomically from the same row") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t_l")
      .select(col("k"), col("t_l").cast("timestamp").as("tl"))
    // latest right row has a NULL tag — the join must still attach
    // (rid=11, tag=null) as one row, not mix tag from rid=10
    val right = Seq((1L, 50L, 10L, Some("a")), (1L, 60L, 11L, None))
      .toDF("k", "t_r", "rid", "tag")
      .select(col("k"), col("t_r").cast("timestamp").as("tr"),
        col("rid"), col("tag"))
    val got = AsOfJoin.join(left, right, "k", "tl", "tr", "rid",
      Seq("rid", "tag")).select("rid", "tag").collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 11L)
    assert(got.head.isNullAt(1))
  }
}
