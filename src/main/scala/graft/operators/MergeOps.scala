package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (Delta/Iceberg's upsert) expressed as a plain
  * relational plan — the generalization of the reference's insert-only
  * incremental load (db_manager.py:85–91 appends; a MERGE also
  * updates matched rows): target LEFT JOIN updates on the key with
  * column-wise coalesce, then UNION ALL the not-matched inserts.
  *
  * Scale design: the change set is orders of magnitude smaller than
  * the snapshot in any incremental pipeline, so BOTH merge inputs keep
  * the snapshot un-shuffled — updates broadcast into the join, inserts
  * union in. If the change set outgrows broadcast, the bucketed layout
  * ([[graft.etl.Bucketing]]) keeps the key join co-located instead.
  */
object MergeOps {

  /** q80: deterministic change batch (keys %10==0 updated with a +100
    * price adjustment and status 'U'; keys %97==3 re-inserted under a
    * shifted key as status 'I') merged into the orders snapshot; the
    * post-merge per-status rollup is the gate. */
  val q80MergeUpsert: QueryDef = QueryDef(
    "q80_merge_upsert",
    """WITH upd AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) + 100 AS price, 'U' AS status
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |ins AS (
      |  SELECT o_orderkey + 100000000 AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS price, 'I' AS status
      |  FROM orders WHERE o_orderkey % 97 = 3),
      |merged AS (
      |  SELECT coalesce(u.k, t.o_orderkey) AS k,
      |    coalesce(u.price, CAST(t.o_totalprice AS DECIMAL(18,2))) AS price,
      |    coalesce(u.status, t.o_orderstatus) AS status
      |  FROM orders t LEFT JOIN upd u ON t.o_orderkey = u.k
      |  UNION ALL SELECT k, price, status FROM ins)
      |SELECT status, count(*) AS n,
      |  CAST(round(sum(price), 2) AS DOUBLE) AS total
      |FROM merged GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
    val t = Tables.orders(s, dir)
    val dec = col("o_totalprice").cast("decimal(18,2)")
    val upd = t.filter(col("o_orderkey") % 10 === 0).select(
      col("o_orderkey").as("k"), (dec + 100).as("u_price"), lit("U").as("u_status"))
    val ins = t.filter(col("o_orderkey") % 97 === 3).select(
      (col("o_orderkey") + 100000000L).as("k"), dec.as("price"), lit("I").as("status"))
    val merged = t.join(broadcast(upd), t("o_orderkey") === upd("k"), "left")
      .select(
        coalesce(col("u_price"), dec).as("price"),
        coalesce(col("u_status"), col("o_orderstatus")).as("status"))
      .unionByName(ins.select(col("price"), col("status")))
    merged.groupBy(col("status"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("price")), 2).cast("double").as("total"))
      .orderBy("status")
  }

  val all: Seq[QueryDef] = Seq(q80MergeUpsert)
}
