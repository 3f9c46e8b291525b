package graft.operators

import graft.{QueryDef, Tables}
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

  val all: Seq[QueryDef] = Seq(q107AssocRules)
}
