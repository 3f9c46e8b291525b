package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join split handles most hot keys at runtime; salting is
  * the plan-level tool for the pathological case it cannot split — one
  * key so hot that even a single post-split partition of it exceeds an
  * executor (SURVEY.md §7.2 "salting for skew"). The contract: results
  * are identical to a plain inner equi-join.
  */
object SkewOps {

  /** Salted inner equi-join: the (big, skewed) left side gets a random
    * salt in [0, buckets); the right side is replicated `buckets` times
    * so every (key, salt) cell finds its match. One hot left key then
    * spreads over `buckets` tasks instead of one.
    *
    * Replication multiplies the right side — use when right is the
    * small side (dims against a skewed fact). Salt is derived from a
    * uniform hash of the full left row id passed in `saltBy` (NOT
    * rand(): deterministic → retries/speculative tasks stay
    * consistent).
    */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
