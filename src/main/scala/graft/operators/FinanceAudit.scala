package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Forensic finance audits over the order/lineitem facts — the
  * controls a finance warehouse runs nightly on top of the reference's
  * ETL output (the Benford digit screen lives with the profiling
  * family in [[DataProfile.q186Benford]]; these are its
  * transaction-level siblings).
  *
  * Exactness contract: both queries are pure integer arithmetic over
  * exact cents (the q01 decimal-cast contract) and day indexes;
  * ratios ride DECIMAL(38)/HUGEINT cross-multiplication so no float
  * exists anywhere.
  */
object FinanceAudit {

  /** q188 — duplicate-charge screen: pairs of lineitems where the
    * SAME supplier ships the SAME part in the SAME quantity within 90
    * days — the classic double-billing / double-shipment audit
    * pattern (exact-key repeat + closeness window). Emits each
    * flagged pair with its day gap, ordered for review.
    *
    * Exactness: quantity goes through floor() before the BIGINT cast
    * (Spark's double→int cast truncates, DuckDB's rounds half-even —
    * floor lands both on the same integer for the integral-valued
    * domain); the pair orientation (aₒ,aₗ) < (bₒ,bₗ) is a pure
    * integer lexicographic predicate; the gap is |Δday| on day
    * indexes, so the window is symmetric ("within 90 days of each
    * other", not "after").
    *
    * Scale design (100 TB): the self-join is an EQUI-join on the
    * composite (supplier, part, qty) key — high cardinality, no skew
    * (group sizes are the per-key repeat counts, which an audit
    * expects to be tiny); the day-window and orientation predicates
    * filter after the hash match, so no range/theta join ever forms.
    * Output is bounded by the true duplicate volume. */
  val q188DupCharge: QueryDef = QueryDef(
    "q188_dup_charge",
    """WITH li AS (
      |  SELECT l_suppkey AS s, l_partkey AS p,
      |    CAST(floor(l_quantity) AS BIGINT) AS q,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |                   CAST(l_shipdate AS DATE)) AS BIGINT) AS d,
      |    l_orderkey AS o, CAST(l_linenumber AS BIGINT) AS ln
      |  FROM lineitem)
      |SELECT a.s AS suppkey, a.p AS partkey, a.q AS qty,
      |  a.o AS o_a, a.ln AS ln_a, b.o AS o_b, b.ln AS ln_b,
      |  abs(b.d - a.d) AS gap_days
      |FROM li a JOIN li b
      |  ON b.s = a.s AND b.p = a.p AND b.q = a.q
      | AND (b.o > a.o OR (b.o = a.o AND b.ln > a.ln))
      | AND abs(b.d - a.d) <= 90
      |ORDER BY suppkey, partkey, qty, o_a, ln_a, o_b, ln_b""".stripMargin) {
    (s, dir) =>
      val li = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("s"), col("l_partkey").as("p"),
        floor(col("l_quantity")).cast("bigint").as("q"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01"))
          .cast("bigint").as("d"),
        col("l_orderkey").as("o"), col("l_linenumber").cast("bigint").as("ln"))
      li.as("a").join(li.as("b"),
          expr("b.s = a.s AND b.p = a.p AND b.q = a.q") &&
          expr("b.o > a.o OR (b.o = a.o AND b.ln > a.ln)") &&
          expr("abs(b.d - a.d) <= 90"))
        .select(col("a.s").as("suppkey"), col("a.p").as("partkey"),
          col("a.q").as("qty"), col("a.o").as("o_a"), col("a.ln").as("ln_a"),
          col("b.o").as("o_b"), col("b.ln").as("ln_b"),
          abs(col("b.d") - col("a.d")).as("gap_days"))
        .orderBy("suppkey", "partkey", "qty", "o_a", "ln_a", "o_b", "ln_b")
  }

  /** q189 — Pareto / ABC customer classification: rank customers by
    * lifetime revenue and class them A (first 80% of cumulative
    * revenue), B (to 95%), C (tail) — the inventory-control cut
    * ("which 20% of customers fund 80% of the book") that q133's Gini
    * coefficient summarizes as one number; this materializes the
    * actionable partition.
    *
    * Exactness: revenue is exact cents; the cumulative sum rides
    * [[ScaleRank.withRunningSum]] over the unique (cents DESC, cust)
    * order (bit-identical to the window form, ties impossible);
    * class thresholds cross-multiply through DECIMAL(38)/HUGEINT
    * (cum·100 ≤ total·80), never dividing; the final shares are
    * HUGEINT floor-divs.
    *
    * Scale design (100 TB): per-customer revenue is one
    * partial-aggregable fact pass on an unbounded key; the running
    * sum is the two-level chunked rank (no single task ever sorts the
    * customer table); the 1-row total broadcasts into the class
    * projection; the report is a ≤3-group aggregate. */
  val q189ParetoAbc: QueryDef = QueryDef(
    "q189_pareto_abc",
    """WITH cust AS (
      |  SELECT o_custkey AS cust,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT cust, cents,
      |    CAST(sum(cents) OVER (ORDER BY cents DESC, cust) AS BIGINT) AS cum,
      |    CAST(sum(cents) OVER () AS BIGINT) AS t
      |  FROM cust),
      |c AS (
      |  SELECT CASE
      |      WHEN CAST(cum AS HUGEINT) * 100 <= CAST(t AS HUGEINT) * 80 THEN 'A'
      |      WHEN CAST(cum AS HUGEINT) * 100 <= CAST(t AS HUGEINT) * 95 THEN 'B'
      |      ELSE 'C' END AS abc_class,
      |    cents, t
      |  FROM r)
      |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(cents) AS BIGINT) AS rev_cents,
      |  CAST((CAST(1000000 AS HUGEINT) * CAST(sum(cents) AS BIGINT)) // t
      |       AS BIGINT) AS rev_share_ppm
      |FROM c GROUP BY abc_class, t
      |ORDER BY abc_class""".stripMargin) { (s, dir) =>
    val cust = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("cust"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")).cast("bigint").as("cents"))
      // materialize the per-customer aggregate once: it feeds the
      // rank's range sampling, the rank exchange, AND the total —
      // without this the fact scan would run three times
      .localCheckpoint()
    val withCum = ScaleRank.withRunningSum(
      cust, Seq.empty, Seq(col("cents").desc, col("cust")),
      col("cents"), "cum")
    val tot = cust.agg(sum(col("cents")).as("t"))
    withCum.crossJoin(broadcast(tot))
      .select(
        when(expr("CAST(cum AS DECIMAL(38,0)) * 100 <= CAST(t AS DECIMAL(38,0)) * 80"), "A")
          .when(expr("CAST(cum AS DECIMAL(38,0)) * 100 <= CAST(t AS DECIMAL(38,0)) * 95"), "B")
          .otherwise("C").as("abc_class"),
        col("cents"), col("t"))
      .groupBy(col("abc_class"), col("t"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("rev_cents"))
      .select(col("abc_class"), col("n_cust"), col("rev_cents"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * rev_cents) div t AS BIGINT)")
          .as("rev_share_ppm"))
      .orderBy("abc_class")
  }

  val all: Seq[QueryDef] = Seq(q188DupCharge, q189ParetoAbc)
}
