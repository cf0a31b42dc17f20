package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkSpec {

  test("salted join is row-identical to the plain join") {
    val events = Tables.events(spark, sf)
    val dim = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "user_id")
    val plain = events.join(dim, "user_id")
      .select("event_id", "user_id", "c_mktsegment")
    val salted = SkewJoin.saltedJoin(events, dim, "user_id", "event_id", 8)
      .select("event_id", "user_id", "c_mktsegment")
    assert(plain.count() > 0)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salt values spread a hot key over the requested buckets") {
    val events = Tables.events(spark, sf)
    val salts = events.withColumn("_salt",
        pmod(xxhash64(col("event_id")), lit(8L)))
      .groupBy("_salt").count()
    assert(salts.count() === 8)
  }
}
