package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join on a key with hot values sends every row of a
  * hot key to one reducer. Salting splits each key into `saltBuckets`
  * sub-keys: the large (skewed) side gets a deterministic salt from a
  * row-unique column, the small side is replicated `saltBuckets`
  * times, and the join runs on (key, salt) — hot keys fan out over
  * `saltBuckets` reducers. Result is row-for-row identical to the
  * plain join (spec-checked).
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles
  * moderate skew automatically at runtime; explicit salting is the
  * deterministic fallback for pathological keys (one key = 30% of
  * 100 TB) or for non-AQE engines/sinks.
  */
object SkewJoin {

  /** @param big        skewed side
    * @param small      replicated side (size × saltBuckets must stay
    *                   shuffle-friendly)
    * @param key        equi-join key present on both sides
    * @param bigUniqueCol row-unique column on `big` used to derive a
    *                   deterministic salt (keeps runs reproducible)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigUniqueCol: String, saltBuckets: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(bigUniqueCol)), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
