package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association mining over the order/lineitem star —
  * the co-occurrence → confidence/lift pipeline behind "frequently
  * bought together" and feature-co-occurrence audits.
  *
  * Scale design (the Apriori shape, minus the iterations):
  *  - items are support-filtered BEFORE the pair self-join — the
  *    classic prune that keeps the candidate fan-out near-linear
  *    instead of quadratic in catalog size;
  *  - pair generation is an equi-join on the basket key, so fan-out
  *    per order is C(k,2) with k = basket size (bounded ≤ ~13 in this
  *    schema; a retail 100 TB log has the same property);
  *  - the filtered basket list is materialized ONCE (localCheckpoint)
  *    and feeds both sides of the self-join;
  *  - confidence is an exact integer ppm floor-div; lift — whose
  *    int64 numerator would overflow at production order counts —
  *    rides the left-associated IEEE double + floor chain (the q108
  *    contract), so the DuckDB oracle stays bit-identical either way.
  *
  * Ref: the reference has no aggregation at all (SURVEY.md §2 "does
  * NOT have" — A1 is `len(df)`); this is north-star surface.
  */
object Association {

  private val MIN_SUPPORT = 10L // orders containing the item
  private val MIN_PAIR = 3L     // orders containing both items

  val q107AssocRules: QueryDef = QueryDef(
    "q107_assoc_rules",
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM b),
       |ic AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b
       |       GROUP BY p HAVING count(*) >= $MIN_SUPPORT),
       |f AS (SELECT b.o, b.p FROM b JOIN ic ON b.p = ic.p),
       |pr AS (SELECT f1.p AS a, f2.p AS b2, CAST(count(*) AS BIGINT) AS n_ab
       |       FROM f f1 JOIN f f2 ON f1.o = f2.o AND f1.p < f2.p
       |       GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR)
       |SELECT pr.a AS item_a, pr.b2 AS item_b, pr.n_ab,
       |  (1000000 * pr.n_ab) // ca.c AS conf_ppm,
       |  CAST(floor(1000000.0 * pr.n_ab * n.n_orders /
       |       (1.0 * ca.c * cb.c)) AS BIGINT) AS lift_ppm
       |FROM pr JOIN ic ca ON pr.a = ca.p JOIN ic cb ON pr.b2 = cb.p, n
       |ORDER BY lift_ppm DESC, item_a, item_b""".stripMargin) { (s, dir) =>
    // the distinct (order, item) list feeds the order count, the item
    // supports, and the basket build — identical subtrees, so
    // ReuseExchange materializes the distinct's shuffle once
    val b = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val n = b.agg(countDistinct(col("o")).as("n_orders"))
    val ic = b.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= MIN_SUPPORT)
    // pair generation WITHOUT a self-join: collapse each order to its
    // sorted item array (one shuffle) and emit the C(k,2) ordered
    // pairs map-side with codegen'd array lambdas — the self-join
    // formulation shuffles the basket list twice and probes a join
    // for what is a purely order-local expansion
    val f = b.join(ic.select("p"), Seq("p"))
    val pr = f.groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), y -> " +
          "struct(x AS a, y AS b2))))")).as("pp"))
      .select(col("pp.a").as("a"), col("pp.b2").as("b2"))
      .groupBy(col("a"), col("b2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MIN_PAIR)
    pr
      .join(broadcast(ic.select(col("p").as("a"), col("c").as("ca"))), Seq("a"))
      .join(broadcast(ic.select(col("p").as("b2"), col("c").as("cb"))), Seq("b2"))
      .crossJoin(n)
      .select(col("a").as("item_a"), col("b2").as("item_b"), col("n_ab"),
        expr("(1000000 * n_ab) div ca").as("conf_ppm"),
        // int64 lift (1000000 * n_ab * n_orders) overflows once order
        // counts reach ~10^6-10^7 (DuckDB errors, Spark wraps) — the
        // left-associated IEEE double chain + floor (q108 contract) is
        // bit-portable at any magnitude; conf keeps the exact int path
        // (1e6 * n_ab tops out ~1e17, inside int64 at any plausible SF)
        expr("CAST(floor(1000000.0 * n_ab * n_orders / (1.0 * ca * cb)) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))
  }

  /** q274 — next-purchase recommendation evaluation: train a
    * co-occurrence recommender on pre-1999 baskets, recommend each
    * customer the top-5 NEW parts scored by Σ co-purchases with
    * their training basket, and measure hit-rate@5 against the first
    * part actually purchased in 1999+ — side by side with the
    * global-popularity top-5 baseline a recommender must beat to
    * justify itself. This is the offline eval harness for the q107
    * association surface: the temporal split (model fitted strictly
    * before the cutoff) is what makes the number honest — scoring on
    * the training period would leak every answer.
    *
    * Exactness: all scores are integer co-occurrence counts with
    * (score desc, part) tiebreaks; the per-customer top-5 is a
    * per-customer window (unbounded key); the target pick is
    * (min date, min part) — fully deterministic; rates are
    * non-negative integer ppm floor-divs.
    *
    * Scale design (100 TB): the pair matrix is the q107 shape
    * (support-pruned equi-join on the basket key, pair counts
    * partial-aggregable); the scoring join fans each user's train
    * part into its pair row — both sides hash-partitioned on the
    * part key; everything per-customer stays windowed on the
    * customer id. One 1-row report. */
  val q274NextPurchaseEval: QueryDef = QueryDef(
    "q274_next_purchase_eval",
    """WITH tr AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS p, o.o_orderkey AS ok
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderdate < TIMESTAMP '1999-01-01'),
      |tb AS (SELECT DISTINCT ok, p FROM tr),
      |up AS (SELECT DISTINCT cust, p FROM tr),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS c
      |  FROM tb a JOIN tb b ON a.ok = b.ok AND a.p <> b.p
      |  GROUP BY 1, 2),
      |tgt AS (
      |  SELECT cust, p AS target FROM (
      |    SELECT o.o_custkey AS cust, l.l_partkey AS p,
      |      row_number() OVER (PARTITION BY o.o_custkey
      |        ORDER BY o.o_orderdate, l.l_partkey) AS rn
      |    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01')
      |  WHERE rn = 1),
      |ev AS (SELECT t.cust, t.target FROM tgt t
      |       JOIN (SELECT DISTINCT cust FROM up) u ON t.cust = u.cust),
      |score AS (
      |  SELECT up.cust, pr.pb AS cand, CAST(sum(pr.c) AS BIGINT) AS s
      |  FROM up JOIN pairs pr ON up.p = pr.pa
      |  WHERE NOT EXISTS (SELECT 1 FROM up u2
      |    WHERE u2.cust = up.cust AND u2.p = pr.pb)
      |  GROUP BY 1, 2),
      |rec AS (
      |  SELECT cust, cand FROM (
      |    SELECT cust, cand,
      |      row_number() OVER (PARTITION BY cust ORDER BY s DESC, cand) AS rn
      |    FROM score) WHERE rn <= 5),
      |pop AS (
      |  SELECT p AS cand FROM (
      |    SELECT p, CAST(count(*) AS BIGINT) AS c FROM tb GROUP BY p
      |    ORDER BY c DESC, p LIMIT 5)),
      |hits AS (
      |  SELECT ev.cust,
      |    CASE WHEN EXISTS (SELECT 1 FROM rec
      |      WHERE rec.cust = ev.cust AND rec.cand = ev.target)
      |      THEN 1 ELSE 0 END AS h_cooc,
      |    CASE WHEN EXISTS (SELECT 1 FROM pop WHERE pop.cand = ev.target)
      |      THEN 1 ELSE 0 END AS h_pop
      |  FROM ev)
      |SELECT CAST(count(*) AS BIGINT) AS n_eval,
      |  CAST(sum(h_cooc) AS BIGINT) AS hits_cooc,
      |  CAST(sum(h_pop) AS BIGINT) AS hits_pop,
      |  (1000000 * CAST(sum(h_cooc) AS BIGINT)) // greatest(count(*), 1)
      |    AS rate_cooc_ppm,
      |  (1000000 * CAST(sum(h_pop) AS BIGINT)) // greatest(count(*), 1)
      |    AS rate_pop_ppm
      |FROM hits""".stripMargin) { (s, dir) =>
    val cut = lit("1999-01-01").cast("timestamp")
    val ol = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey"))
    val tr = ol.filter(col("o_orderdate") < cut)
      .select(col("o_custkey").as("cust"), col("l_partkey").as("p"),
        col("o_orderkey").as("ok"))
      .distinct()
      .ckpt() // feeds baskets, user profiles, and the matrix
    val tb = tr.select(col("ok"), col("p")).distinct()
    val up = tr.select(col("cust"), col("p")).distinct()
    val pairs = tb.as("a")
      .join(tb.select(col("ok"), col("p").as("pb")),
        Seq("ok"))
      .filter(col("p") =!= col("pb"))
      .groupBy(col("p").as("pa"), col("pb"))
      .agg(count(lit(1)).as("c"))
    val wTgt = Window.partitionBy(col("cust"))
      .orderBy(col("o_orderdate"), col("p"))
    val tgt = ol.filter(col("o_orderdate") >= cut)
      .select(col("o_custkey").as("cust"), col("l_partkey").as("p"),
        col("o_orderdate"))
      .withColumn("rn", row_number().over(wTgt))
      .filter(col("rn") === 1)
      .select(col("cust"), col("p").as("target"))
    val ev = tgt.join(up.select(col("cust")).distinct(), Seq("cust"))
    val score = up.join(pairs, col("p") === col("pa"))
      .join(up.select(col("cust"), col("p").as("pb")),
        Seq("cust", "pb"), "anti") // never recommend an owned part
      .groupBy(col("cust"), col("pb").as("cand"))
      .agg(sum(col("c")).as("s"))
    val wRec = Window.partitionBy(col("cust")).orderBy(col("s").desc, col("cand"))
    val rec = score.withColumn("rn", row_number().over(wRec))
      .filter(col("rn") <= 5).select(col("cust"), col("cand"))
    val pop = tb.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("p")).limit(5)
      .select(col("p").as("cand"))
    val hits = ev
      .join(rec.withColumnRenamed("cand", "target").withColumn("hc", lit(1L)),
        Seq("cust", "target"), "left")
      .join(broadcast(pop.withColumnRenamed("cand", "target")
          .withColumn("hp", lit(1L))),
        Seq("target"), "left")
      .select(col("cust"), coalesce(col("hc"), lit(0L)).as("h_cooc"),
        coalesce(col("hp"), lit(0L)).as("h_pop"))
    hits
      .agg(count(lit(1)).as("n_eval"),
        sum(col("h_cooc")).as("hits_cooc"), sum(col("h_pop")).as("hits_pop"))
      .select(col("n_eval"), col("hits_cooc"), col("hits_pop"),
        expr("(1000000 * hits_cooc) div greatest(n_eval, 1)")
          .as("rate_cooc_ppm"),
        expr("(1000000 * hits_pop) div greatest(n_eval, 1)")
          .as("rate_pop_ppm"))
  }

  /** q294 — sequential pattern rules (A then B): across each
    * customer's CONSECUTIVE order pairs, how often does part A in
    * order k precede part B in order k+1 — support, antecedent
    * window count, and confidence. q107 mines CO-occurrence inside
    * one basket; this is its temporal sibling (the 2-sequence core
    * of SPADE/PrefixSpan-style mining, bounded to adjacent
    * transitions so fan-out stays linear), and the statistic behind
    * "customers who bought A come back for B".
    *
    * Exactness: pure integer counting over distinct
    * (customer, transition, part) triples — order ranks come from a
    * row_number over the unique (o_orderdate, o_orderkey) pair;
    * confidence is a non-negative integer floor-div to ppm.
    *
    * Scale design (100 TB): order ranks ride a window PARTITIONED by
    * customer; the transition join is an EQUI-join on
    * (customer, rank) — per-key fan-out is basket_k × basket_{k+1}
    * (≤ ~13² here; bounded by basket size, not corpus); supports are
    * partial-aggregable counts; top-25 is a TakeOrdered heap. */
  val q294SeqPatterns: QueryDef = {
    val MINSUP = 3
    QueryDef(
      "q294_seq_patterns",
      s"""WITH ranked AS (
         |  SELECT o_custkey AS cust, o_orderkey,
         |    row_number() OVER (PARTITION BY o_custkey
         |                       ORDER BY o_orderdate, o_orderkey) AS rk
         |  FROM orders),
         |bi AS (
         |  SELECT DISTINCT r.cust, r.rk, l.l_partkey AS part
         |  FROM ranked r JOIN lineitem l ON r.o_orderkey = l.l_orderkey),
         |pairs AS (
         |  SELECT a.cust, a.rk, a.part AS ante, b.part AS cons
         |  FROM bi a JOIN bi b ON a.cust = b.cust AND b.rk = a.rk + 1),
         |sup AS (
         |  SELECT ante, cons, CAST(count(*) AS BIGINT) AS s
         |  FROM pairs GROUP BY 1, 2),
         |aw AS (
         |  SELECT a.part AS ante, CAST(count(*) AS BIGINT) AS windows
         |  FROM bi a JOIN (SELECT DISTINCT cust, rk FROM bi) n
         |    ON a.cust = n.cust AND n.rk = a.rk + 1
         |  GROUP BY 1)
         |SELECT sup.ante, sup.cons, sup.s AS support, aw.windows,
         |  (1000000 * sup.s) // aw.windows AS conf_ppm
         |FROM sup JOIN aw ON sup.ante = aw.ante
         |WHERE sup.s >= $MINSUP
         |ORDER BY support DESC, sup.ante, cons LIMIT 25""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val ranked = Tables.orders(s, dir)
        .select(col("o_custkey").as("cust"), col("o_orderkey"),
          row_number().over(w).as("rk"))
      val bi = ranked
        .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("cust"), col("rk"), col("l_partkey").as("part"))
        .distinct()
        .ckpt() // feeds three join sides
      val pairs = bi
        .join(bi.select(col("cust").as("bcust"), col("rk").as("brk"),
          col("part").as("cons")),
          col("cust") === col("bcust") && col("brk") === col("rk") + 1)
        .select(col("cust"), col("rk"), col("part").as("ante"), col("cons"))
      val sup = pairs.groupBy(col("ante"), col("cons"))
        .agg(count(lit(1)).as("s"))
      val aw = bi
        .join(bi.select(col("cust").as("wcust"), col("rk").as("wrk")).distinct(),
          col("cust") === col("wcust") && col("wrk") === col("rk") + 1)
        .groupBy(col("part").as("awante"))
        .agg(count(lit(1)).as("windows"))
      sup.filter(col("s") >= MINSUP)
        .join(aw, col("ante") === col("awante"))
        .select(col("ante"), col("cons"), col("s").as("support"), col("windows"),
          expr("(1000000 * s) div windows").as("conf_ppm"))
        .orderBy(col("support").desc, col("ante"), col("cons"))
        .limit(25)
    }
  }

  val all: Seq[QueryDef] = Seq(q107AssocRules, q274NextPurchaseEval,
    q294SeqPatterns)
}
