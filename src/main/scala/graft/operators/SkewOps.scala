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

  /** q149 — join-key skew report: the diagnostic that DECIDES whether
    * a join needs [[saltedInnerJoin]] (or AQE skew splitting) at all.
    * For each candidate join key of the fact table: distinct key
    * count, the hottest key's share of all rows, the p99 per-key row
    * count, and the mean — max-share vs p99 is the classic "one whale
    * vs heavy tail" distinction that picks between salting (whale)
    * and plain AQE (tail).
    *
    * Scale design: one UNION of per-key projections feeds ONE
    * partial-aggregable (key_col, key) count shuffle; the stats then
    * run over per-key counts (|keys| rows), and the report is 3 rows.
    * Exactness: shares and means are integer ppm/milli floor-divs;
    * the p99 is the exact interpolated percentile (the q17 bit-exact
    * contract) floored to milli-units. */
  val q149SkewReport: graft.QueryDef = graft.QueryDef(
    "q149_skew_report",
    """WITH k AS (
      |  SELECT 'l_orderkey' AS key_col, l_orderkey AS key FROM lineitem
      |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
      |c AS (
      |  SELECT key_col, key, CAST(count(*) AS BIGINT) AS cnt
      |  FROM k GROUP BY key_col, key)
      |SELECT key_col,
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  CAST(max(cnt) AS BIGINT) AS max_cnt,
      |  (1000000 * CAST(max(cnt) AS BIGINT)) // CAST(sum(cnt) AS BIGINT) AS max_share_ppm,
      |  (1000 * CAST(sum(cnt) AS BIGINT)) // CAST(count(*) AS BIGINT) AS mean_cnt_milli,
      |  CAST(floor(quantile_cont(cnt, 0.99) * 1000) AS BIGINT) AS p99_cnt_milli
      |FROM c GROUP BY key_col ORDER BY key_col""".stripMargin) { (sp, dir) =>
    val l = graft.Tables.lineitem(sp, dir)
    def keyed(name: String): DataFrame =
      l.select(lit(name).as("key_col"), col(name).as("key"))
    val c = keyed("l_orderkey")
      .unionByName(keyed("l_partkey"))
      .unionByName(keyed("l_suppkey"))
      .groupBy(col("key_col"), col("key"))
      .agg(count(lit(1)).as("cnt"))
    // second compression: the count HISTOGRAM (key_col, cnt) -> freq
    // is tiny (distinct per-key counts, not keys), so even the p99
    // runs weighted over it — per-group state O(|distinct counts|)
    val h = c.groupBy(col("key_col"), col("cnt")).agg(count(lit(1)).as("freq"))
    h.groupBy(col("key_col"))
      .agg(
        sum(col("freq")).as("n_keys"),
        sum(col("cnt") * col("freq")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        expr("(1000000 * max(cnt)) div sum(cnt * freq)").as("max_share_ppm"),
        expr("(1000 * sum(cnt * freq)) div sum(freq)").as("mean_cnt_milli"),
        floor(expr("percentile(cnt, 0.99D, freq)") * 1000).cast("long").as("p99_cnt_milli"))
      .orderBy("key_col")
  }

  val all: Seq[graft.QueryDef] = Seq(q79SaltedJoin, q149SkewReport)
}
