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

  /** Snapshot diff (q92) — classify every key across two snapshot
    * versions as added / removed / changed with the list of changed
    * columns: the table-diff primitive behind incremental-pipeline
    * reconciliation, CDC backfills, and "what did this rerun change"
    * audits. Here the snapshots are the per-customer order count and
    * spend before vs from 1995 — two real aggregates of the orders
    * table, so the diff exercises genuine adds, drops, and both
    * change columns.
    *
    * One full-outer join on the snapshot key; everything else is
    * column-local CASE logic, so the plan is a single co-partitioned
    * shuffle at any scale (bucket both snapshots on the key to make
    * it exchange-free — [[graft.etl.Bucketing]]). `concat_ws` skips
    * the null CASE arms in both engines, giving a stable sorted
    * changed-column list. */
  val q92SnapshotDiff: QueryDef = QueryDef(
    "q92_snapshot_diff",
    """WITH a AS (
      |  SELECT o_custkey AS k, count(*) AS cnt,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00' GROUP BY 1),
      |b AS (
      |  SELECT o_custkey AS k, count(*) AS cnt,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' GROUP BY 1),
      |j AS (
      |  SELECT coalesce(a.k, b.k) AS custkey,
      |    a.cnt AS old_cnt, b.cnt AS new_cnt,
      |    CAST(a.total AS DOUBLE) AS old_total, CAST(b.total AS DOUBLE) AS new_total,
      |    CASE WHEN a.k IS NULL THEN 'added'
      |         WHEN b.k IS NULL THEN 'removed'
      |         WHEN a.cnt != b.cnt OR a.total != b.total THEN 'changed'
      |         ELSE 'unchanged' END AS change_type
      |  FROM a FULL OUTER JOIN b ON a.k = b.k)
      |SELECT custkey, change_type, old_cnt, new_cnt, old_total, new_total,
      |  concat_ws(',',
      |    CASE WHEN old_cnt IS DISTINCT FROM new_cnt THEN 'cnt' END,
      |    CASE WHEN old_total IS DISTINCT FROM new_total THEN 'total' END) AS changed_cols
      |FROM j WHERE change_type != 'unchanged'
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    def snap(pred: org.apache.spark.sql.Column) = o.filter(pred)
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    val cut = lit("1995-01-01 00:00:00").cast("timestamp")
    val a = snap(col("o_orderdate") < cut)
      .select(col("k"), col("cnt").as("old_cnt"), col("total").cast("double").as("old_total"))
    val b = snap(col("o_orderdate") >= cut)
      .select(col("k").as("kb"), col("cnt").as("new_cnt"), col("total").cast("double").as("new_total"))
    a.join(b, col("k") === col("kb"), "full_outer")
      .select(
        coalesce(col("k"), col("kb")).as("custkey"),
        col("old_cnt"), col("new_cnt"), col("old_total"), col("new_total"),
        when(col("k").isNull, "added")
          .when(col("kb").isNull, "removed")
          .when(col("old_cnt") =!= col("new_cnt") ||
            col("old_total") =!= col("new_total"), "changed")
          .otherwise("unchanged").as("change_type"))
      .filter(col("change_type") =!= "unchanged")
      .withColumn("changed_cols", concat_ws(",",
        when(!(col("old_cnt") <=> col("new_cnt")), "cnt"),
        when(!(col("old_total") <=> col("new_total")), "total")))
      .select(col("custkey"), col("change_type"),
        col("old_cnt"), col("new_cnt"), col("old_total"), col("new_total"),
        col("changed_cols"))
      .orderBy("custkey")
  }

  /** q120 — deletion cascade (the right-to-be-forgotten pass): given a
    * set of customers to forget, trace the cascade through the star
    * (their orders, those orders' lineitems) and report per-table
    * total/forgotten/kept counts — the audit a deletion job must emit
    * before anything is rewritten.
    *
    * Scale design: the forget set and each derived key set flow
    * through LEFT SEMI joins (Catalyst broadcasts them when bounded,
    * which a deletion list is); the fact tables are scanned once each
    * and only aggregates move. The selection predicate here is a
    * deterministic mod so the oracle can reproduce the keyset. */
  val q120ForgetCascade: QueryDef = QueryDef(
    "q120_forget_cascade",
    """WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |del_o AS (SELECT o_orderkey FROM orders
      |          WHERE o_custkey IN (SELECT c_custkey FROM del_c)),
      |del_l AS (SELECT count(*) AS n FROM lineitem
      |          WHERE l_orderkey IN (SELECT o_orderkey FROM del_o))
      |SELECT tbl, n_total, n_forgotten, n_total - n_forgotten AS n_kept FROM (
      |  SELECT 'customer' AS tbl,
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total,
      |    (SELECT CAST(count(*) AS BIGINT) FROM del_c) AS n_forgotten
      |  UNION ALL SELECT 'orders',
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |    (SELECT CAST(count(*) AS BIGINT) FROM del_o)
      |  UNION ALL SELECT 'lineitem',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(n AS BIGINT) FROM del_l))
      |ORDER BY tbl""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val delC = cust.filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val delO = orders.join(delC, orders("o_custkey") === delC("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    def row(name: String, total: org.apache.spark.sql.DataFrame,
        forgotten: org.apache.spark.sql.DataFrame) =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(forgotten.agg(count(lit(1)).as("n_forgotten")))
        .select(lit(name).as("tbl"), col("n_total"), col("n_forgotten"))
    val delL = li.join(delO, li("l_orderkey") === delO("o_orderkey"), "left_semi")
    row("customer", cust, delC)
      .unionByName(row("orders", orders, delO))
      .unionByName(row("lineitem", li, delL))
      .select(col("tbl"), col("n_total"), col("n_forgotten"),
        (col("n_total") - col("n_forgotten")).as("n_kept"))
      .orderBy("tbl")
  }

  /** q212 — CDC log compaction: a change-data-capture stream of
    * insert/update/delete operations collapses to the final table
    * state by LAST-WRITER-WINS per key — the log-compaction view of
    * what q80's MERGE does batch-by-batch, and the shape a 100 TB
    * lakehouse actually materializes (compact the log with ONE
    * arg-max aggregate, instead of replaying N MERGE rounds). The
    * changelog is synthesized deterministically from orders: op by
    * key residue (I/U/D), sequence by orderkey.
    *
    * Exactness: the survivor per key is `max_by`/`arg_max` over the
    * unique sequence number; op counts and surviving revenue are
    * integer sums of exact cents.
    *
    * Scale design (100 TB): ONE partial-aggregable arg-max pass over
    * the log keyed by the entity (no window, no sort, no iterative
    * merge); the report is a 1-row rollup. This is exactly the
    * compaction job's plan at any log size. */
  val q212CdcCompact: QueryDef = QueryDef(
    "q212_cdc_compact",
    """WITH log AS (
      |  SELECT o_custkey AS k, o_orderkey AS seq,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
      |         WHEN o_orderkey % 10 <= 3 THEN 'U' ELSE 'I' END AS op,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT k, arg_max(op, seq) AS last_op,
      |    arg_max(cents, seq) AS last_cents,
      |    CAST(count(*) AS BIGINT) AS n_ops
      |  FROM log GROUP BY k)
      |SELECT
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(count(CASE WHEN last_op <> 'D' THEN 1 END) AS BIGINT) AS n_live,
      |  CAST(count(CASE WHEN last_op = 'D' THEN 1 END) AS BIGINT) AS n_deleted,
      |  CAST(sum(n_ops) AS BIGINT) AS n_log_entries,
      |  CAST(sum(CASE WHEN last_op <> 'D' THEN last_cents END) AS BIGINT) AS live_cents
      |FROM fin""".stripMargin) { (s, dir) =>
    val log = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 10 === 0, "D")
        .when(col("o_orderkey") % 10 <= 3, "U").otherwise("I").as("op"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
        .as("cents"))
    log.groupBy("k")
      .agg(max_by(col("op"), col("seq")).as("last_op"),
        max_by(col("cents"), col("seq")).as("last_cents"),
        count(lit(1)).as("n_ops"))
      .agg(count(lit(1)).as("n_keys"),
        count(when(col("last_op") =!= "D", 1)).as("n_live"),
        count(when(col("last_op") === "D", 1)).as("n_deleted"),
        sum(col("n_ops")).as("n_log_entries"),
        sum(when(col("last_op") =!= "D", col("last_cents"))).as("live_cents"))
  }

  /** q250 — incremental view maintenance with retractions (the
    * materialized-view delta algebra: V' = V ⊎ agg(ΔI) ⊖ agg(ΔD)):
    * the per-nation revenue view is maintained from a stale base
    * snapshot (orders with key %4 ≠ 0) by MERGING signed partial
    * aggregates for the insert batch (%4 = 0 minus %8 = 1) and the
    * retraction batch (%8 = 1 within the base) — never rescanning the
    * base fact table. This is the refresh path every warehouse MV
    * runs on CDC feeds; the reference's append-only load (J1) is the
    * degenerate no-retraction case.
    *
    * Oracle leverage (the q206 pattern): the DuckDB twin computes the
    * FINAL state directly — one flat aggregate over the post-change
    * row set, no staging — so the hash match PROVES the signed-merge
    * algebra commutes with the aggregation, not merely that two
    * copies of the same staged plan agree.
    *
    * Exactness: revenue is half-up cents; counts/sums merge by signed
    * int64 addition (associative, partial-aggregable).
    *
    * Scale design (100 TB): the base-view aggregate is computed once
    * (in production: already materialized); each delta batch
    * aggregates DOWN to |nation| rows before the merge, so refresh
    * cost scales with the CHANGE set, not the view's base — the whole
    * point of IVM. All three partials merge on the bounded nation
    * axis. */
  val q250IvmView: QueryDef = QueryDef(
    "q250_ivm_view",
    """WITH live AS (
      |  SELECT n.n_name AS nation,
      |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE o.o_orderkey % 8 <> 1)
      |SELECT nation, count(*) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM live GROUP BY nation ORDER BY nation""".stripMargin) { (s, dir) =>
    val rows = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("o_orderkey").as("k"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    def agg(df: org.apache.spark.sql.DataFrame, sign: Long) =
      df.groupBy(col("nation"))
        .agg((lit(sign) * count(lit(1))).as("dn"),
          (lit(sign) * sum(col("cents"))).as("dr"))
    // stale base view: the %4 != 0 snapshot, aggregated once
    val baseView = agg(rows.filter(col("k") % 4 =!= 0), 1L)
    // CDC batches: inserts are the %4 == 0 keys, retractions the
    // %8 == 1 keys. The sets are disjoint BY ARITHMETIC (%8 == 1 ⇒
    // odd ⇒ %4 == 1), so retractions always hit the base snapshot and
    // never an in-flight insert — no overlap guard needed
    val inserts = agg(rows.filter(col("k") % 4 === 0), 1L)
    val deletes = agg(rows.filter(col("k") % 8 === 1), -1L)
    baseView.unionAll(inserts).unionAll(deletes)
      .groupBy(col("nation"))
      .agg(sum(col("dn")).as("n_orders"), sum(col("dr")).as("revenue_cents"))
      .orderBy("nation")
  }

  val all: Seq[QueryDef] =
    Seq(q80MergeUpsert, q92SnapshotDiff, q120ForgetCascade, q212CdcCompact,
      q250IvmView)
}
