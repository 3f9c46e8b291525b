package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the warehouse-side dual of
  * the reference's incremental append (J1 keeps history by never
  * rewriting rows; SCD Type 2 keeps history by *versioning* them,
  * the standard shape for dimension tables fed from a change stream;
  * cf. /root/reference/utils/db_manager.py:85–91, which appends facts
  * and leaves dimension history unsolved).
  *
  * Scale design: one shuffle on the entity key; both windows (change
  * detection, then validity intervals) share the same partitioning, so
  * Catalyst reuses the exchange and the second window adds only an
  * in-partition sort. No driver-side state, no joins — a 100 TB change
  * log builds its dimension in a single pass.
  */
object Scd {

  /** Collapse an ordered change stream into SCD-2 version rows.
    *
    * @param df       change stream (one row per observation)
    * @param entity   dimension key column name
    * @param attr     tracked attribute column name
    * @param orderBy  event-time column name
    * @param tiebreak unique column name breaking event-time ties
    * @return one row per (entity, version): attr, valid_from,
    *         valid_to (null = open), is_current, version (1-based)
    */
  def buildType2(
      df: DataFrame,
      entity: String,
      attr: String,
      orderBy: String,
      tiebreak: String): DataFrame = {
    val byTime = Window.partitionBy(col(entity)).orderBy(col(orderBy), col(tiebreak))
    // a version starts on the first observation or a genuine attribute
    // change; the first row needs its own marker — lag() returning null
    // cannot distinguish "no previous row" from "previous attr was
    // null", which would silently drop a leading null version
    val starts = df
      .withColumn("prev_attr", lag(col(attr), 1).over(byTime))
      .withColumn("obs_rank", row_number().over(byTime))
      .filter(col("obs_rank") === 1 || !(col("prev_attr") <=> col(attr)))
    // same partitioning → exchange reuse; only a sort below this window
    val byStart = Window.partitionBy(col(entity)).orderBy(col(orderBy), col(tiebreak))
    starts.select(
        col(entity),
        row_number().over(byStart).cast("long").as("version"),
        col(attr),
        col(orderBy).as("valid_from"),
        lead(col(orderBy), 1).over(byStart).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** SCD-2 build over the order change stream: each customer's
    * `o_orderpriority` history as versioned validity intervals. The
    * (date, orderkey) tiebreak is load-bearing — the test data has
    * same-day orders per customer. Output sampled to every 10th
    * customer to bound the driver compare. */
  val q66Scd2: QueryDef = QueryDef(
    "q66_scd2",
    """WITH src AS (
      |  SELECT o_custkey, o_orderpriority AS prio, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev,
      |    row_number() OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders),
      |chg AS (
      |  SELECT o_custkey, prio, o_orderdate, o_orderkey FROM src
      |  WHERE rn = 1 OR prev IS DISTINCT FROM prio),
      |ver AS (
      |  SELECT o_custkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS version,
      |    prio, o_orderdate AS valid_from,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
      |  FROM chg)
      |SELECT o_custkey, version, prio, valid_from, valid_to,
      |  (valid_to IS NULL) AS is_current
      |FROM ver WHERE o_custkey % 10 = 0
      |ORDER BY o_custkey, version""".stripMargin) { (s, dir) =>
    buildType2(
      Tables.orders(s, dir).withColumnRenamed("o_orderpriority", "prio"),
      entity = "o_custkey", attr = "prio",
      orderBy = "o_orderdate", tiebreak = "o_orderkey")
      .filter(col("o_custkey") % 10 === 0)
      .orderBy("o_custkey", "version")
  }

  /** q208 — bitemporal "as-known-at" audit: the dimension has TWO time
    * axes — valid time (when a fact was true: the order date) and
    * system time (when the warehouse LEARNED it: arrival, here a
    * deterministic 0–6-day ingest lag of `o_orderkey % 7` days). The
    * query reconstructs, for a fixed valid-time as-of V, what each
    * customer's priority APPEARED to be when queried 0, 3, and 14
    * days after V, and scores each snapshot against the final truth —
    * the "how wrong were yesterday's reports" curve that motivates
    * bitemporal modeling (q66's SCD-2 tracks only valid time; a
    * restated row there silently rewrites history).
    *
    * Exactness: the per-customer belief is `max_by`/`arg_max` over
    * the packed BIGINT key day·10¹⁰+orderkey — unique, so both
    * engines pick the same row; everything else is counts and one
    * non-negative ppm floor-div. The packing radix holds to 10¹⁰
    * orders (headroom asserted nowhere near at shipped scales, same
    * class as the q115 pair radix).
    *
    * Scale design (100 TB): the 4-offset explode multiplies the
    * filtered slice, not the fact; the belief is ONE partial-
    * aggregable arg-max per (offset, customer); truth-vs-belief is an
    * equi-join on customer; the report is a ≤3-row aggregate. No
    * windows, no fact-sized sort. */
  val q208Bitemporal: QueryDef = QueryDef(
    "q208_bitemporal",
    """WITH obs AS (
      |  SELECT o_custkey AS cust, o_orderpriority AS prio,
      |    CAST(o_orderdate AS DATE) AS vd,
      |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 7 AS INT) AS sysd,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |         AS BIGINT) * 10000000000 + o_orderkey AS pk
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE) <= DATE '1995-06-01'),
      |offs AS (SELECT CAST(unnest([0, 3, 14, 9999]) AS BIGINT) AS off),
      |belief AS (
      |  SELECT offs.off, obs.cust, arg_max(obs.prio, obs.pk) AS prio
      |  FROM obs CROSS JOIN offs
      |  WHERE obs.sysd <= DATE '1995-06-01' + CAST(offs.off AS INT)
      |  GROUP BY 1, 2),
      |truth AS (SELECT cust, prio FROM belief WHERE off = 9999)
      |SELECT b.off AS days_after,
      |  CAST(count(t.cust) AS BIGINT) AS n_cust_truth,
      |  CAST(count(b2.cust) AS BIGINT) AS n_known,
      |  CAST(count(CASE WHEN b2.prio = t.prio THEN 1 END) AS BIGINT) AS n_matching,
      |  CAST((1000000 * (count(t.cust) - count(CASE WHEN b2.prio = t.prio THEN 1 END)))
      |       // count(t.cust) AS BIGINT) AS stale_ppm
      |FROM (SELECT DISTINCT off FROM belief WHERE off <> 9999) b
      |CROSS JOIN truth t
      |LEFT JOIN belief b2 ON b2.off = b.off AND b2.cust = t.cust
      |GROUP BY b.off ORDER BY days_after""".stripMargin) { (s, dir) =>
    val obs = Tables.orders(s, dir)
      .filter(col("o_orderdate").cast("date") <= lit("1995-06-01").cast("date"))
      .select(col("o_custkey").as("cust"), col("o_orderpriority").as("prio"),
        date_add(col("o_orderdate").cast("date"),
          (col("o_orderkey") % 7).cast("int")).as("sysd"),
        (datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
          .cast("bigint") * 10000000000L + col("o_orderkey")).as("pk"))
    val offs = s.range(1).select(explode(array(
      lit(0L), lit(3L), lit(14L), lit(9999L))).as("off"))
    val belief = obs.crossJoin(broadcast(offs))
      .filter(col("sysd") <= date_add(lit("1995-06-01").cast("date"),
        col("off").cast("int")))
      .groupBy(col("off"), col("cust"))
      .agg(max_by(col("prio"), col("pk")).as("prio"))
      .ckpt() // belief feeds truth, the offsets list, AND the join
    val truth = belief.filter(col("off") === 9999)
      .select(col("cust"), col("prio").as("t_prio"))
    val offRows = belief.filter(col("off") =!= 9999).select(col("off")).distinct()
    offRows.crossJoin(truth)
      .join(belief.select(col("off"), col("cust"), col("prio").as("b_prio")),
        Seq("off", "cust"), "left")
      .groupBy(col("off"))
      .agg(count(col("t_prio")).as("n_cust_truth"),
        count(col("b_prio")).as("n_known"),
        count(when(col("b_prio") === col("t_prio"), 1)).as("n_matching"))
      .select(col("off").as("days_after"), col("n_cust_truth"), col("n_known"),
        col("n_matching"),
        expr("(1000000 * (n_cust_truth - n_matching)) div n_cust_truth")
          .as("stale_ppm"))
      .orderBy("days_after")
  }

  val all: Seq[QueryDef] = Seq(q66Scd2, q208Bitemporal)
}
