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

  /** The salted join on the oracle surface: lineitem (fact, skewed in
    * general) joined to nation-keyed suppliers through a 16-way salt.
    * The oracle is the PLAIN join — hash-matching it proves the
    * salt/replicate/drop dance is result-invisible, the same
    * gate-the-mechanism pattern as q68's bloom pruning. */
  val q79SaltedJoin: graft.QueryDef = graft.QueryDef(
    "q79_salted_join",
    """SELECT n.n_name, count(*) AS n_items,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (sp, dir) =>
    val l = graft.Tables.lineitem(sp, dir)
    val s = graft.Tables.supplier(sp, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val n = graft.Tables.nation(sp, dir)
    saltedInnerJoin(l, s, "l_suppkey",
        saltBy = col("l_orderkey") * lit(10) + col("l_linenumber"), buckets = 16)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy("n_name")
  }

  val all: Seq[graft.QueryDef] = Seq(q79SaltedJoin)
}
