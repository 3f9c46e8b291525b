package graft.operators

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

  val all: Seq[QueryDef] = Seq(q66Scd2)
}
