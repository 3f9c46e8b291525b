package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** RFM segmentation — the classic customer-analytics operator: score
  * every customer by Recency (days since last order), Frequency
  * (order count), and Monetary (total spend), quartile each dimension,
  * and report the resulting 4×4×4 segment grid.
  *
  * Scale design: the fact table collapses to one row per customer in
  * a single partial-aggregable pass; the quartiles then run over the
  * CUSTOMER table, not the facts — and NOT as global ntile windows
  * (a single-task sort at scale) but through [[ScaleRank]]: exact
  * two-level distributed rank (range-chunk local row_number +
  * broadcast chunk offsets) feeding the closed-form ntile formula.
  * Every task is bounded by a range chunk (~customers/P) at any
  * scale, and the output is byte-identical to the ntile window the
  * oracle still uses.
  *
  * Determinism: every ntile ORDER BY carries the custkey tiebreaker;
  * money flows through DECIMAL(18,2) sums and rounds before the final
  * double cast. */
object Segmentation {

  val q119Rfm: QueryDef = QueryDef(
    "q119_rfm",
    """WITH m AS (SELECT CAST(max(o_orderdate) AS DATE) AS maxd FROM orders),
      |r AS (
      |  SELECT o_custkey AS cust,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS monetary,
      |    CAST(max(o_orderdate) AS DATE) AS lastd
      |  FROM orders GROUP BY o_custkey),
      |q AS (
      |  SELECT cust, freq, monetary,
      |    ntile(4) OVER (ORDER BY date_diff('day', lastd, m.maxd), cust) AS rq,
      |    ntile(4) OVER (ORDER BY freq DESC, cust) AS fq,
      |    ntile(4) OVER (ORDER BY monetary DESC, cust) AS mq
      |  FROM r, m)
      |SELECT CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(round(sum(CAST(monetary AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_m
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val m = orders.agg(max(col("o_orderdate")).cast("date").as("maxd"))
    val r = orders.groupBy(col("o_custkey").as("cust"))
      .agg(
        count(lit(1)).as("freq"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("monetary"),
        max(col("o_orderdate")).cast("date").as("lastd"))
      .crossJoin(broadcast(m))
      .withColumn("rec_days", datediff(col("maxd"), col("lastd")))
    val ranked = Seq[(String, Seq[org.apache.spark.sql.Column])](
      "r" -> Seq(col("rec_days"), col("cust")),
      "f" -> Seq(col("freq").desc, col("cust")),
      "m" -> Seq(col("monetary").desc, col("cust"))
    ).foldLeft(r) { case (df, (p, sort)) =>
      ScaleRank.withRowNumber(df, Nil, sort, s"${p}rk", s"${p}n")
    }
    val q = ranked
      .withColumn("rq", ScaleRank.ntileFromRank(4, col("rrk"), col("rn")))
      .withColumn("fq", ScaleRank.ntileFromRank(4, col("frk"), col("fn")))
      .withColumn("mq", ScaleRank.ntileFromRank(4, col("mrk"), col("mn")))
    q.select((col("rq") * 100 + col("fq") * 10 + col("mq")).cast("bigint").as("segment"),
        col("monetary"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary").cast("decimal(18,2)")), 2)
          .cast("double").as("total_m"))
      .orderBy("segment")
  }

  /** q133 — Gini concentration index per market segment: how unequal
    * is customer spend inside each segment? The standard inequality
    * audit (revenue concentration, whale detection), via the sorted
    * rank formula G = (2·Σrᵢxᵢ − (n+1)·Σx) / (n·Σx).
    *
    * Scale design: facts collapse to (segment, customer, cents) in
    * one shuffle; the rank is per SEGMENT — but c_mktsegment has only
    * 5 values, so a rank WINDOW would put ~1/5 of all customers in
    * one sort task at any scale. [[ScaleRank.withRowNumber]] computes
    * the identical rank with every task bounded by a range chunk;
    * the Gini itself is three int64 sums per segment (Σrx ≤
    * n²·maxspend — checked ≈ 10¹⁶ at sf1000, inside int64) and one
    * IEEE divide-floor chain. */
  val q133Gini: QueryDef = QueryDef(
    "q133_gini",
    """WITH sp AS (
      |  SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
      |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT seg, cents,
      |    row_number() OVER (PARTITION BY seg ORDER BY cents, cust) AS rk
      |  FROM sp),
      |a AS (
      |  SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot,
      |    CAST(sum(rk * cents) AS BIGINT) AS src
      |  FROM r GROUP BY seg)
      |SELECT seg, n, tot,
      |  CAST(floor((CAST(2 * src - (n + 1) * tot AS DOUBLE) * 1000000.0) /
      |       CAST(n * tot AS DOUBLE)) AS BIGINT) AS gini_ppm
      |FROM a WHERE n * tot > 0 ORDER BY seg""".stripMargin) { (s, dir) =>
    val sp = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("seg"), col("o_custkey").as("cust"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("bigint")).as("cents"))
    ScaleRank.withRowNumber(sp, Seq("seg"), Seq(col("cents"), col("cust")),
        "rk", "n_in_seg")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"),
        sum(col("rk") * col("cents")).as("src"))
      .filter(col("n") * col("tot") > 0)
      .select(col("seg"), col("n"), col("tot"),
        floor(((lit(2L) * col("src") - (col("n") + 1) * col("tot")).cast("double") *
          lit(1000000.0)) / (col("n") * col("tot")).cast("double"))
          .cast("bigint").as("gini_ppm"))
      .orderBy("seg")
  }

  val all: Seq[QueryDef] = Seq(q119Rfm, q133Gini)
}
