package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM segmentation — the classic customer-analytics operator: score
  * every customer by Recency (days since last order), Frequency
  * (order count), and Monetary (total spend), quartile each dimension,
  * and report the resulting 4×4×4 segment grid.
  *
  * Scale design: the fact table collapses to one row per customer in
  * a single partial-aggregable pass; the ntile windows then run over
  * the CUSTOMER table, not the facts. The windows are single-partition
  * here (exact quartile assignment needs a total order, and the
  * deterministic oracle needs exactly ntile's tie behavior) — at
  * 100 TB of customers the swap is interpolated percentile cutoffs
  * (the q17/q85 machinery) broadcast as range boundaries, same
  * output schema, documented rather than silently approximated.
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
    val q = r
      .withColumn("rq", ntile(4).over(Window.orderBy(col("rec_days"), col("cust"))))
      .withColumn("fq", ntile(4).over(Window.orderBy(col("freq").desc, col("cust"))))
      .withColumn("mq", ntile(4).over(Window.orderBy(col("monetary").desc, col("cust"))))
    q.select((col("rq") * 100 + col("fq") * 10 + col("mq")).cast("bigint").as("segment"),
        col("monetary"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary").cast("decimal(18,2)")), 2)
          .cast("double").as("total_m"))
      .orderBy("segment")
  }

  val all: Seq[QueryDef] = Seq(q119Rfm)
}
