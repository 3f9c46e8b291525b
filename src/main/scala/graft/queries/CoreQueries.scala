package graft.queries

import graft.{QueryDef, Tables}
import graft.CkptOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity query surface (SURVEY.md §2 operator IDs in scaladoc).
  *
  * Scale design notes (100 TB):
  *  - dimension joins (nation/region/supplier/part) are explicitly
  *    `broadcast()` — no shuffle of the fact side;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key and rely
  *    on AQE for skew/coalescing;
  *  - all aggregates are partial-aggregable (sum/count/min/max over
  *    decimal), so map-side combine applies;
  *  - float sums go through decimal casts: exact, associative, and thus
  *    both deterministic under any partitioning AND oracle-comparable.
  */
object CoreQueries {

  /** Exact order-insensitive sum: cast to decimal before aggregating. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  /** Final presentation: round at scale 2 and hand back a double. */
  private def d(c: Column): Column = round(c, 2).cast("double")

  /** A1 + P1 + F9 — TPC-H Q1-style pricing summary (flagship).
    * Ref: the reference's only aggregate is len(df) (main.py:14); this is
    * the canonical Spark group-by replacing its per-file accumulation. */
  val q01PricingSummary: QueryDef = QueryDef(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val price = dec2(col("l_extendedprice"))
    val disc  = dec2(col("l_discount"))
    val tax   = dec2(col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d(sum(dec2(col("l_quantity")))).as("sum_qty"),
        d(sum(price)).as("sum_base_price"),
        d(sum(price * (lit(1) - disc))).as("sum_disc_price"),
        d(sum(price * (lit(1) - disc) * (lit(1) + tax))).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1))).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** F1 + F2 — multi-column '#'-joined key, MD5 surrogate
    * (data_manager.py:62–63). Only non-float columns participate so the
    * concatenated text is byte-identical across engines. */
  val q02SurrogateKey: QueryDef = QueryDef(
    "q02_surrogate_key",
    """SELECT l_orderkey, l_linenumber,
      |  md5(concat_ws('#', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), l_returnflag)) AS surrogate_key
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, surrogate_key
      |LIMIT 500""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        md5(concat_ws("#",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          col("l_returnflag"))).as("surrogate_key"))
      // surrogate tiebreak: (l_orderkey, l_linenumber) is NOT unique
      // in the driver's lineitem (1161 dup groups) — see q11
      .orderBy("l_orderkey", "l_linenumber", "surrogate_key")
      .limit(500)
  }

  /** J1 — left-anti incremental load (data_manager.py:172–201): keep only
    * rows whose key is absent from the already-loaded set. At 100 TB the
    * keys side stays a distributed join (never collected); Catalyst
    * broadcasts it when small, else shuffles both sides on the key. */
  val q03AntiJoin: QueryDef = QueryDef(
    "q03_anti_join",
    """SELECT l.l_returnflag, count(*) AS n_new,
      |  CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty_new
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val loaded = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    li.join(loaded, li("l_orderkey") === loaded("o_orderkey"), "left_anti")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_new"), d(sum(dec2(col("l_quantity")))).as("qty_new"))
      .orderBy("l_returnflag")
  }

  /** F3 — dictionary decode as a broadcast lookup join (data_manager.py:71
    * `.map(config['accounts'])`): dims are broadcast, fact never shuffles. */
  val q04DecodeBroadcast: QueryDef = QueryDef(
    "q04_decode_broadcast",
    """SELECT r.r_name, n.n_name, count(*) AS n_cust,
      |  CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), d(sum(dec2(col("c_acctbal")))).as("total_bal"))
      .orderBy("r_name", "n_name")
  }

  /** F4 + F5 + F6 — date parse / year / year-month derivations
    * (data_manager.py:72–74). `ym` doubles as the natural sink partition
    * key at scale (SURVEY.md §7.3). */
  val q05Dates: QueryDef = QueryDef(
    "q05_dates",
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, strftime(l_shipdate, '%Y-%m') AS ym,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        year(col("l_shipdate")).cast("bigint").as("yr"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ym"),
        col("l_extendedprice"))
      .groupBy(col("yr"), col("ym"))
      .agg(count(lit(1)).as("n"), d(sum(dec2(col("l_extendedprice")))).as("total_price"))
      .orderBy("yr", "ym")
  }

  /** F7 — decimal-comma numeric normalization with coerce-to-null
    * (data_manager.py:75). Spark 4 is ANSI by default, so the pandas
    * `errors='coerce'` becomes try_cast (SURVEY.md §2 F7). The comma
    * string is built from `value` so both engines hash identical text. */
  val q06TryNumeric: QueryDef = QueryDef(
    "q06_try_numeric",
    """WITH src AS (
      |  SELECT event_type,
      |    CASE WHEN event_type = 'error' THEN 'N/A'
      |         ELSE replace(CAST(value AS VARCHAR), '.', ',') END AS amount_raw
      |  FROM events)
      |SELECT event_type,
      |  count(*) AS n_rows,
      |  count(TRY_CAST(replace(amount_raw, ',', '.') AS DOUBLE)) AS n_parsed,
      |  CAST(round(sum(CAST(TRY_CAST(replace(amount_raw, ',', '.') AS DOUBLE) AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      |FROM src GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val raw = Tables.events(s, dir)
      .select(
        col("event_type"),
        when(col("event_type") === "error", lit("N/A"))
          .otherwise(regexp_replace(col("value").cast("string"), "\\.", ","))
          .as("amount_raw"))
    val parsed = expr("try_cast(replace(amount_raw, ',', '.') as double)")
    raw.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(parsed).as("n_parsed"),
        d(sum(dec2(parsed))).as("total"))
      .orderBy("event_type")
  }

  /** F8 — debit/credit sign multiplier via bounded map lookup
    * (data_manager.py:76); missing flag → null (try_element_at under
    * ANSI). The map is a literal — broadcast-free, codegen'd. */
  val q07SignedAmount: QueryDef = QueryDef(
    "q07_signed_amount",
    """SELECT event_type,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 WHEN event_type = 'refund' THEN -1 END) AS n_signed,
      |  CAST(round(sum(CAST(value * (CASE WHEN event_type = 'purchase' THEN 1 WHEN event_type = 'refund' THEN -1 END) AS DECIMAL(18,2))), 2) AS DOUBLE) AS signed_total
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val mult = map(lit("purchase"), lit(1), lit("refund"), lit(-1))
    val signed = col("value") * try_element_at(mult, col("event_type"))
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(try_element_at(mult, col("event_type"))).as("n_signed"),
        d(sum(dec2(signed))).as("signed_total"))
      .orderBy("event_type")
  }

  /** U1 + set ops — union / intersect / except over customer key sets
    * (pd.concat accumulation, data_manager.py:138, generalized). */
  val q08SetOps: QueryDef = QueryDef(
    "q08_set_ops",
    """WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 100000),
      |     bld AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT 'except'    AS op, count(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM bld)
      |UNION ALL
      |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM big INTERSECT SELECT k FROM bld)
      |UNION ALL
      |SELECT 'union'     AS op, count(*) AS n FROM (SELECT k FROM big UNION SELECT k FROM bld)
      |ORDER BY op""".stripMargin) { (s, dir) =>
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("k")).distinct()
    val bld = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
    val u = big.union(bld).distinct().agg(count(lit(1)).as("n"))
      .select(lit("union").as("op"), col("n"))
    val i = big.intersect(bld).agg(count(lit(1)).as("n"))
      .select(lit("intersect").as("op"), col("n"))
    val e = big.except(bld).agg(count(lit(1)).as("n"))
      .select(lit("except").as("op"), col("n"))
    e.union(i).union(u).orderBy("op")
  }

  /** Window functions — per-nation customer spend ranking. Rank ordering
    * includes the unique custkey so ties are impossible (oracle-stable). */
  val q09WindowRank: QueryDef = QueryDef(
    "q09_window_rank",
    """WITH spend AS (
      |  SELECT n.n_name, c.c_custkey,
      |    CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY n.n_name, c.c_custkey)
      |SELECT n_name, c_custkey, spend, rnk FROM (
      |  SELECT *, CAST(rank() OVER (PARTITION BY n_name ORDER BY spend DESC, c_custkey) AS BIGINT) AS rnk
      |  FROM spend)
      |WHERE rnk <= 3
      |ORDER BY n_name, rnk""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val spend = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(d(sum(dec2(col("o_totalprice")))).as("spend"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("spend").desc, col("c_custkey"))
    spend.withColumn("rnk", rank().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select("n_name", "c_custkey", "spend", "rnk")
      .orderBy("n_name", "rnk")
  }

  /** Sort + limit top-k — top parts by discounted revenue; broadcast the
    * part dim; unique partkey tiebreaker keeps the cut deterministic. */
  val q10TopK: QueryDef = QueryDef(
    "q10_topk",
    """SELECT p.p_partkey, p.p_name,
      |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_partkey, p.p_name
      |ORDER BY revenue DESC, p_partkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    // no broadcast hint: part is an SF-SCALED dim (200k rows per TPC-H
    // SF — too big to pin as broadcast at 100 TB); AQE still chooses
    // broadcast at any scale where the dim actually fits
    val p = Tables.part(s, dir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(d(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
      .limit(10)
  }

  /** P1 + P2 + P3 + F9 — select / rename / reorder / filter
    * (data_manager.py:49–57, 90). Filter + projection both push to the
    * parquet scan (PushedFilters/ReadSchema). */
  val q11FilterProject: QueryDef = QueryDef(
    "q11_filter_project",
    """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
      |  l_quantity AS qty, l_returnflag AS flag
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_quantity > 25
      |ORDER BY order_id, line_no, qty
      |LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").as("qty"),
        col("l_returnflag").as("flag"))
      // qty tiebreak: the driver's lineitem is NOT unique on
      // (l_orderkey, l_linenumber) — 1161 duplicate key groups — so a
      // LIMIT cut on the bare key is nondeterministic when the
      // boundary splits a tie group (fuzz seed 4's stable-set sample
      // caught exactly that); ordering by every output column makes
      // the 200-row multiset engine-independent
      .orderBy("order_id", "line_no", "qty")
      .limit(200)
  }

  /** Full reference pipeline semantic (SURVEY.md §3 EP1) over lineitem
    * re-cast as raw CSV-ish strings: stringify → rename → decimal-comma
    * parse (F7) → date parse + ym (F4/F6) → MD5 surrogate (F1/F2) →
    * anti-join vs already-loaded keys (J1) → ym aggregate. */
  val q12EtlPipeline: QueryDef = QueryDef(
    "q12_etl_pipeline",
    """WITH src AS (
      |  SELECT md5(concat_ws('#', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))) AS surrogate_key,
      |    strftime(l_shipdate, '%d.%m.%Y') AS dt_raw,
      |    replace(CAST(l_quantity AS VARCHAR), '.', ',') AS amount_raw
      |  FROM lineitem),
      |existing AS (
      |  SELECT DISTINCT md5(concat_ws('#', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))) AS surrogate_key
      |  FROM lineitem WHERE l_returnflag = 'A'),
      |new_rows AS (
      |  SELECT strptime(dt_raw, '%d.%m.%Y') AS dt,
      |    TRY_CAST(replace(amount_raw, ',', '.') AS DOUBLE) AS amount
      |  FROM src
      |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.surrogate_key = src.surrogate_key))
      |SELECT strftime(dt, '%Y-%m') AS ym, count(*) AS n,
      |  CAST(round(sum(CAST(amount AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
      |FROM new_rows GROUP BY ym ORDER BY ym""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val key = md5(concat_ws("#",
      col("l_orderkey").cast("string"), col("l_linenumber").cast("string")))
    val src = li.select(
      key.as("surrogate_key"),
      date_format(col("l_shipdate"), "dd.MM.yyyy").as("dt_raw"),
      regexp_replace(col("l_quantity").cast("string"), "\\.", ",").as("amount_raw"))
    val existing = li.filter(col("l_returnflag") === "A")
      .select(key.as("surrogate_key")).distinct()
    src.join(existing, Seq("surrogate_key"), "left_anti")
      .select(
        to_timestamp(col("dt_raw"), "dd.MM.yyyy").as("dt"),
        expr("try_cast(replace(amount_raw, ',', '.') as double)").as("amount"))
      .groupBy(date_format(col("dt"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n"), d(sum(dec2(col("amount")))).as("total_qty"))
      .orderBy("ym")
  }

  /** Left outer join — order fill summary; null-producing side feeds
    * conditional aggregates. */
  val q13LeftJoin: QueryDef = QueryDef(
    "q13_left_join",
    """SELECT o.o_orderstatus, count(*) AS n_pairs,
      |  count(l.l_orderkey) AS n_matched,
      |  CAST(round(sum(CAST(coalesce(l.l_extendedprice, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
      |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY o.o_orderstatus
      |ORDER BY o.o_orderstatus""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_pairs"),
        count(col("l_orderkey")).as("n_matched"),
        d(sum(dec2(coalesce(col("l_extendedprice"), lit(0))))).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** Exact distinct aggregates (no approx — oracle must match bit-for-bit). */
  val q14Distinct: QueryDef = QueryDef(
    "q14_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")
  }

  /** Top-k per key through the custom [[graft.plans.TopKPerKey]]
    * operator (partial bounded heaps below the shuffle, final above —
    * no per-group sort, shuffle carries ≤ k rows per key per input
    * partition). Ordering key is a (price, orderkey) struct so the cut
    * is unique; the oracle states the equivalent two-key window. */
  val q15TopkNative: QueryDef = QueryDef(
    "q15_topk_native",
    """SELECT o_orderstatus, o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) AS price
      |FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn <= 5
      |ORDER BY o_orderstatus, price DESC, o_orderkey DESC""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .withColumn("__ord", struct(col("o_totalprice"), col("o_orderkey")))
    graft.plans.TopK.perKey(o, Seq("o_orderstatus"), "__ord", k = 5)
      .select(
        col("o_orderstatus"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
      .orderBy(col("o_orderstatus"), col("price").desc, col("o_orderkey").desc)
  }

  /** String-function battery — case mapping, concat, length, contains,
    * padding, edit distance. */
  val q16Strings: QueryDef = QueryDef(
    "q16_strings",
    """SELECT p_brand, count(*) AS n,
      |  min(upper(p_name)) AS min_upper,
      |  max(concat(p_type, ':', CAST(p_size AS VARCHAR))) AS max_typed,
      |  CAST(sum(length(p_name)) AS BIGINT) AS total_len,
      |  CAST(sum(CASE WHEN contains(p_name, 'a') THEN 1 ELSE 0 END) AS BIGINT) AS n_with_a,
      |  min(lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS min_padded,
      |  max(levenshtein(p_brand, p_type)) AS max_lev
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        min(upper(col("p_name"))).as("min_upper"),
        max(concat(col("p_type"), lit(":"), col("p_size").cast("string"))).as("max_typed"),
        sum(length(col("p_name"))).as("total_len"),
        sum(when(col("p_name").contains("a"), 1).otherwise(0)).as("n_with_a"),
        min(lpad(col("p_partkey").cast("string"), 8, "0")).as("min_padded"),
        // DuckDB levenshtein is BIGINT; Spark's is INT — align the type
        max(levenshtein(col("p_brand"), col("p_type"))).cast("bigint").as("max_lev"))
      .orderBy("p_brand")
  }

  /** Exact interpolated percentiles (both engines: linear interpolation
    * over the sorted values — no sketch).
    *
    * Scale design: a bare `percentile` over a 3-value group key
    * buffers EVERY row's value in one aggregation state — the
    * aggregate-shaped cousin of the bounded-key window problem. Both
    * value columns have bounded discrete domains (integral quantities,
    * 2dp prices), so the plan pre-collapses to (flag, value) → count
    * with an ordinary partial-aggregable shuffle on the
    * high-cardinality pair, then runs Spark's WEIGHTED
    * `percentile(value, p, count)` over the distinct values — the
    * identical interpolation code path (bit-identical output, the
    * gate proves it) with per-group state bounded by the value domain,
    * not the row count. */
  val q17Percentiles: QueryDef = QueryDef(
    "q17_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.9) AS p90,
      |  quantile_cont(l_extendedprice, 0.25) AS price_p25
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val qp = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("qn"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5D, qn)").as("p50"),
        expr("percentile(l_quantity, 0.9D, qn)").as("p90"))
    val pp = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25D, pn)").as("price_p25"))
    qp.join(pp, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("p50"), col("p90"), col("price_p25"))
      .orderBy("l_returnflag")
  }

  /** Stddev / correlation from decimal-exact co-moments: the running
    * sums are DECIMAL (associative, partitioning-independent), only the
    * final closed-form formula runs in double — so the statistics are
    * deterministic under any parallelism, unlike one-pass fp moment
    * aggregates. */
  val q18Stats: QueryDef = QueryDef(
    "q18_stats",
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
      |    sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS sxx,
      |    sum(CAST(l_discount AS DECIMAL(18,6))) AS sy,
      |    sum(CAST(l_discount AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS syy,
      |    sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) / (n-1)) AS sd_qty,
      |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n) /
      |    (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) *
      |     sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)) AS corr_qty_disc
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val dx = col("l_quantity").cast("decimal(18,6)")
    val dy = col("l_discount").cast("decimal(18,6)")
    val m = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dx).as("sx"), sum(dx * dx).as("sxx"),
        sum(dy).as("sy"), sum(dy * dy).as("syy"),
        sum(dx * dy).as("sxy"))
    val n = col("n"); val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
    val sy = col("sy").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    // corr denominator = 0 when either column is CONSTANT within a
    // group (zero variance — the degenerate all-zero-discount corpus):
    // ANSI double division throws where DuckDB's x/0 natively NULLs;
    // when-guard emits the same NULL. (n - 1) = 0 needs no guard here:
    // every returnflag group is ≥ 1/3 of lineitem by construction.
    val corrDen = sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)
    m.select(
        col("l_returnflag"), n,
        sqrt((sxx - sx * sx / n) / (n - 1)).as("sd_qty"),
        when(corrDen =!= 0.0, (sxy - sx * sy / n) / corrDen)
          .as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  /** Date arithmetic battery — interval add, month end, day diffs,
    * quarter truncation. */
  val q19DateMath: QueryDef = QueryDef(
    "q19_datemath",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
      |  min(strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')) AS min_plus30,
      |  max(strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')) AS max_eom,
      |  CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01')) AS BIGINT) AS total_age_days,
      |  count(DISTINCT date_trunc('quarter', o_orderdate)) AS n_quarters
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val d = col("o_orderdate").cast("date")
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("bigint").as("yr"))
      .agg(
        count(lit(1)).as("n"),
        min(date_format(date_add(d, 30), "yyyy-MM-dd")).as("min_plus30"),
        max(date_format(last_day(d), "yyyy-MM-dd")).as("max_eom"),
        sum(datediff(lit("2026-01-01").cast("date"), d)).as("total_age_days"),
        countDistinct(date_trunc("quarter", col("o_orderdate"))).as("n_quarters"))
      .orderBy("yr")
  }

  /** Join-type battery — every join strategy family as one summary
    * row: cross, full outer, inner, anti, left outer, semi. Both
    * inputs are checkpointed once ([[CkptOps.ckpt]]): the six branches
    * share `big` and `cust`, and without materialization each branch
    * re-scans orders — six scans of the fact table for one battery
    * (the r7 +34% drift). The checkpoint is an ordinary distributed
    * materialization (scales with the distinct high-value custkeys,
    * never collected to the driver). */
  val q39JoinTypes: QueryDef = QueryDef(
    "q39_join_types",
    """WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 250000),
      |cust AS (SELECT c_custkey AS k, c_mktsegment FROM customer WHERE c_custkey <= 300)
      |SELECT 'cross' AS jt, (SELECT count(*) FROM big CROSS JOIN cust) AS n
      |UNION ALL SELECT 'full', (SELECT count(*) FROM big FULL JOIN cust USING (k))
      |UNION ALL SELECT 'inner', (SELECT count(*) FROM big JOIN cust USING (k))
      |UNION ALL SELECT 'left_anti', (SELECT count(*) FROM cust WHERE NOT EXISTS (SELECT 1 FROM big WHERE big.k = cust.k))
      |UNION ALL SELECT 'left_outer', (SELECT count(*) FROM cust LEFT JOIN big USING (k))
      |UNION ALL SELECT 'left_semi', (SELECT count(*) FROM cust WHERE EXISTS (SELECT 1 FROM big WHERE big.k = cust.k))
      |ORDER BY jt""".stripMargin) { (s, dir) =>
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
      .select(col("o_custkey").as("k")).distinct().ckpt()
    val cust = Tables.customer(s, dir).filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("k"), col("c_mktsegment")).ckpt()
    def row(jt: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(jt).as("jt"), col("n"))
    row("cross", big.crossJoin(cust))
      .union(row("full", big.join(cust, Seq("k"), "full")))
      .union(row("inner", big.join(cust, Seq("k"), "inner")))
      .union(row("left_anti", cust.join(big, Seq("k"), "left_anti")))
      .union(row("left_outer", cust.join(big, Seq("k"), "left")))
      .union(row("left_semi", cust.join(big, Seq("k"), "left_semi")))
      .orderBy("jt")
  }

  /** Range join — equi key + ship-date interval residual: the hash
    * join carries the range predicate as a post-probe filter, so no
    * quadratic pass. */
  val q46RangeJoin: QueryDef = QueryDef(
    "q46_range_join",
    """SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS ym,
      |  count(*) AS n_pairs,
      |  count(DISTINCT o.o_orderkey) AS n_orders
      |FROM orders o JOIN lineitem l
      |  ON o.o_orderkey = l.l_orderkey
      | AND l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") >= o("o_orderdate") &&
        l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAY"))
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("ym")
  }

  /** Running / moving window battery — cumulative totals, a 3-row
    * moving sum+count (the moving average is their single IEEE
    * division), and lag deltas, all from decimal-exact frames with a
    * unique (date, orderkey) ordering so every frame cut is stable.
    * One shuffle on the partition key serves all four windows. */
  val q47Running: QueryDef = QueryDef(
    "q47_running",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders WHERE o_custkey < 50)
      |SELECT o_custkey, o_orderkey, strftime(d, '%Y-%m-%d') AS d,
      |  CAST(round(sum(p) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
      |  CAST(round(sum(p) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) /
      |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS INT) AS avg3,
      |  CAST(p - lag(p) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS DOUBLE) AS delta
      |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m3 = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("d"),
        round(sum(col("p")).over(cum), 2).cast("double").as("running_total"),
        (round(sum(col("p")).over(m3), 2).cast("double") /
          count(lit(1)).over(m3).cast("int")).as("avg3"),
        (col("p") - lag(col("p"), 1).over(w)).cast("double").as("delta"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q99 — TPC-H Q5-shaped six-table star join: local-supplier revenue
    * per nation within one region and year. The canonical "did the
    * optimizer get the join order right" query, stated declaratively:
    *
    *  - region/nation are the only hint-broadcasts: those are
    *    CONSTANT-cardinality (5 regions, 25 nations) at any SF, and
    *    the ASIA membership reaches customer as a LEFT-SEMI join —
    *    semi joins keep the probe side's size statistics, so the
    *    initial (pre-AQE) plan already sees customer at its true scan
    *    size and picks broadcast at small SF without materializing
    *    ensure-requirements exchanges first (the r7 +69% regression:
    *    an inner customer⋈nation join inflated the size estimate,
    *    forcing an SMJ initial plan whose shuffles AQE then paid for
    *    before converting to broadcast anyway);
    *  - customer and supplier SCALE WITH SF — they are declared as
    *    plain equi-joins, shuffling on their keys at 100 TB while the
    *    planner freely broadcasts them at small SF. Hint-forcing them
    *    would OOM the driver at scale (the q35-label lesson: never
    *    bake a size assumption that the data outgrows);
    *  - n_name is decoded AFTER aggregation: the fact pipeline groups
    *    on c_nationkey (≤25 groups), and only the ≤25-row aggregate
    *    joins the nation names — the wide string column never rides
    *    through the fact joins;
    *  - revenue sums as decimal (exact, order-insensitive), the q01
    *    discipline. */
  val q99StarJoin: QueryDef = QueryDef(
    "q99_star_join",
    """SELECT n.n_name,
      |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_lineitems
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nations.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(d(sum(col("rev"))).as("revenue"), count(lit(1)).as("n_lineitems"))
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("revenue"), col("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02SurrogateKey, q03AntiJoin, q04DecodeBroadcast,
    q05Dates, q06TryNumeric, q07SignedAmount, q08SetOps, q09WindowRank,
    q10TopK, q11FilterProject, q12EtlPipeline, q13LeftJoin, q14Distinct,
    q15TopkNative, q16Strings, q17Percentiles, q18Stats, q19DateMath,
    q39JoinTypes, q46RangeJoin, q47Running, q99StarJoin, q139Fulfillment,
    q144WeightedMedian)

  /** q144 — weighted median: the price at which half the QUANTITY
    * (not half the rows) sits below, per return flag — the
    * volume-weighted center that plain percentiles (q17) get wrong
    * whenever weights vary. Formulation: running weight over the
    * (price, unique-key) order per group; the median is the first
    * crossing row (min price among rows with 2·cumw ≥ total — minimal
    * because price is the sort key). All integer: half-up cents,
    * integer quantities, no interpolation.
    *
    * Scale note: l_returnflag has 3 values, so a running-weight
    * WINDOW would sort a third of lineitem in one task — the prefix
    * sum runs through [[graft.operators.ScaleRank.withRunningSum]]
    * instead (range-chunk local sums + broadcast chunk offsets),
    * bit-identical to the window under the unique
    * (cents, orderkey, linenumber) order with every task bounded by
    * a range chunk. */
  lazy val q144WeightedMedian: QueryDef = QueryDef(
    "q144_weighted_median",
    """WITH r AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(floor(l_quantity) AS BIGINT) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, cents, w,
      |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents, l_orderkey, l_linenumber
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
      |  FROM r),
      |t AS (SELECT flag, CAST(sum(w) AS BIGINT) AS tot FROM r GROUP BY flag)
      |SELECT c.flag, t.tot AS total_weight, min(c.cents) AS wmedian_cents
      |FROM c JOIN t ON c.flag = t.flag
      |WHERE 2 * c.cw >= t.tot
      |GROUP BY c.flag, t.tot ORDER BY c.flag""".stripMargin) { (s, dir) =>
    val r = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("cents"),
      floor(col("l_quantity")).cast("bigint").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    val t = r.groupBy(col("flag")).agg(sum(col("w")).as("tot"))
    graft.operators.ScaleRank.withRunningSum(r, Seq("flag"),
        Seq(col("cents"), col("l_orderkey"), col("l_linenumber")),
        col("w"), "cw")
      .join(broadcast(t), Seq("flag"))
      .filter(lit(2) * col("cw") >= col("tot"))
      .groupBy(col("flag"), col("tot"))
      .agg(min(col("cents")).as("wmedian_cents"))
      .select(col("flag"), col("tot").as("total_weight"), col("wmedian_cents"))
      .orderBy("flag")
  }

  /** q139 — fulfillment latency: order date → first line shipment gap
    * in whole days, exact quartiles per order priority. The ops SLA
    * question of the reference's domain, as a two-aggregate pipeline:
    * lineitem collapses to per-order first-ship (partial-aggregable,
    * one shuffle on the join key), the header join is key-to-key, and
    * the percentile aggregate runs over one row per order. Day
    * arithmetic is integer epoch-days; the interpolated quartiles
    * follow the q17 bit-exactness contract. */
  lazy val q139Fulfillment: QueryDef = QueryDef(
    "q139_fulfillment",
    """WITH fs AS (
      |  SELECT l_orderkey, min(epoch_us(l_shipdate) // 86400000000) AS ship_day
      |  FROM lineitem GROUP BY l_orderkey),
      |g AS (
      |  SELECT o.o_orderpriority AS pri,
      |    fs.ship_day - (epoch_us(o.o_orderdate) // 86400000000) AS gap_days
      |  FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey)
      |SELECT pri, CAST(count(*) AS BIGINT) AS n,
      |  quantile_cont(gap_days, 0.25) AS p25_days,
      |  quantile_cont(gap_days, 0.5) AS p50_days,
      |  quantile_cont(gap_days, 0.75) AS p75_days,
      |  CAST(max(gap_days) AS BIGINT) AS max_days
      |FROM g GROUP BY pri ORDER BY pri""".stripMargin) { (s, dir) =>
    // parquet dates read as TIMESTAMP_NTZ; the UTC-session cast to
    // TIMESTAMP is wall-clock identity and unlocks unix_micros
    val fs = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(min(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000"))
        .as("ship_day"))
    Tables.orders(s, dir)
      .join(fs, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("pri"),
        (col("ship_day") -
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
          .as("gap_days"))
      // weighted percentile over (pri, gap) counts — the q17 contract:
      // the day-gap domain is tiny, so per-group state is O(domain)
      .groupBy(col("pri"), col("gap_days"))
      .agg(count(lit(1)).as("gn"))
      .groupBy(col("pri"))
      .agg(expr("CAST(sum(gn) AS BIGINT)").as("n"),
        expr("percentile(gap_days, 0.25D, gn)").as("p25_days"),
        expr("percentile(gap_days, 0.5D, gn)").as("p50_days"),
        expr("percentile(gap_days, 0.75D, gn)").as("p75_days"),
        max(col("gap_days")).as("max_days"))
      .orderBy("pri")
  }
}
