package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handling (on by default) splits oversized
  * partitions at runtime, but only for sort-merge joins and only
  * post-shuffle; explicit salting is the planned-ahead variant for
  * keys known to be pathological (the reference's analog: a handful
  * of mega-hit games dominating the timeseries).
  *
  * Mechanics: the skewed (large, many-rows-per-key) side gets a
  * random-but-deterministic salt in [0, n); the small side is
  * replicated n times; the join key becomes (key, salt), spreading
  * each hot key over n reducers.
  */
object SkewJoin {

  /** Deterministic pseudo-salt derived from a row-identity column
    * (xxhash64 mod n) — reproducible, unlike rand(). */
  private def salt(idCol: Column, n: Int): Column =
    pmod(xxhash64(idCol), lit(n)).cast("int")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 largeIdCol: String, saltBuckets: Int): DataFrame = {
    val salted = large.withColumn("_salt", salt(col(largeIdCol), saltBuckets))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
