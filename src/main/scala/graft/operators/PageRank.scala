package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over the customer–part purchase graph
  * (customer —bought→ part edges from orders ⋈ lineitem, mirrored so
  * rank flows both ways in the bipartite graph).
  *
  * Exactness: ranks are INTEGER-scaled (1e6 = rank 1.0) and every
  * update is integer arithmetic — `contrib = rank div outdeg`,
  * `rank' = 0.15·S + 0.85·Σcontrib` via integer div — so the result
  * is independent of summation order, partitioning, and engine: the
  * DuckDB oracle's recursive CTE reproduces it bit-for-bit, which a
  * floating-point PageRank never could (FP sums reorder under
  * parallelism).
  *
  * Scale design (the Pregel shape on DataFrames): the |V|-row rank
  * frontier is BROADCAST against the |E|-row static edge list each
  * iteration (|V| ≪ |E| in purchase/link graphs), so the edges are
  * never shuffled or sorted and the only per-round exchange is the
  * partial-aggregable groupBy(dst) contrib sum. If the node set
  * outgrows broadcast, drop the hint and bucket the edge list by src
  * ([[graft.etl.Bucketing]]) so the join stays edge-side
  * shuffle-free.
  * A fixed iteration count (not convergence polling) keeps the plan
  * finite; `localCheckpoint` per round truncates lineage like
  * [[ConnectedComponents]].
  */
object PageRank {

  private val SCALE = 1000000L // integer rank scale: 1e6 == rank 1.0
  private val ITERS = 5
  private val PART_OFFSET = 1000000000L // disjoint id spaces in one graph

  /** Undirected-as-two-arcs edge list: customer ↔ part. orders and
    * lineitem are both fact-sized (1:4) — no broadcast hint; the
    * equi-join shuffles on the order key (or rides a bucketed layout,
    * [[graft.etl.Bucketing]]) and AQE may still choose broadcast when
    * a filtered side turns out small. */
  private def edges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val bought = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_partkey") + PART_OFFSET).as("p"))
      .distinct()
    bought.select(col("c").as("src"), col("p").as("dst"))
      .unionAll(bought.select(col("p").as("src"), col("c").as("dst")))
  }

  def compute(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val e = edges(orders, lineitem)
    // outdeg rides ON the edge row: one static (src, dst, outdeg) list
    // materialized once, so each round is ONE join + one agg — not a
    // second outdeg join per iteration. Computed via a window over
    // src: ONE shuffle and ONE pass over the edge derivation (a
    // self-join e ⋈ groupBy(e) would execute the whole
    // orders⋈lineitem→distinct lineage twice, once per side).
    val eDeg = e.withColumn("outdeg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint()
    var ranks = eDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(SCALE).as("rank"))
    for (_ <- 1 to ITERS) {
      // no per-round checkpoint: 5 rounds make a fine single DAG, and
      // skipping the eager materialization lets the rounds pipeline
      // (ConnectedComponents checkpoints because its round count is
      // unbounded; this one is a fixed small constant)
      // the rank frontier is |V| rows against |E| edge rows — in this
      // bipartite purchase graph (and most web/link graphs) |V| ≪ |E|,
      // so BROADCAST the frontier: the big static edge list is never
      // shuffled or sorted, and the only exchange per round is the
      // partial-aggregated contrib sum (bounded by |V|). When the node
      // set itself outgrows broadcast, drop the hint and bucket the
      // edge list by src instead ([[graft.etl.Bucketing]]).
      ranks = broadcast(ranks)
        .join(eDeg, col("node") === col("src"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(expr(s"${SCALE * 15 / 100} + (85 * sum(contrib)) div 100").as("rank"))
    }
    ranks
  }

  /** Oracle twin: the same integer iteration as a bounded recursive
    * CTE. Every engine computes identical BIGINTs. */
  private def oracleSql: String = {
    val s15 = SCALE * 15 / 100
    s"""WITH RECURSIVE bought AS (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + $PART_OFFSET AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (
       |  SELECT c AS src, p AS dst FROM bought
       |  UNION ALL SELECT p, c FROM bought),
       |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |pr(iter, node, rank) AS (
       |  SELECT 0, src, CAST($SCALE AS BIGINT) FROM outdeg
       |  UNION ALL
       |  SELECT pr.iter + 1, e.dst,
       |    CAST($s15 + (85 * sum(pr.rank // o.outdeg)) // 100 AS BIGINT)
       |  FROM pr JOIN edges e ON pr.node = e.src JOIN outdeg o ON o.src = pr.node
       |  WHERE pr.iter < $ITERS
       |  GROUP BY pr.iter + 1, e.dst),
       |final AS (SELECT node, rank FROM pr WHERE iter = $ITERS)
       |SELECT node, rank,
       |  CASE WHEN node >= $PART_OFFSET THEN 'part' ELSE 'customer' END AS node_type
       |FROM final ORDER BY rank DESC, node LIMIT 25""".stripMargin
  }

  val q65PageRank: QueryDef = QueryDef("q65_pagerank", oracleSql) { (s, dir) =>
    compute(Tables.orders(s, dir), Tables.lineitem(s, dir))
      .select(col("node"), col("rank"),
        when(col("node") >= PART_OFFSET, "part").otherwise("customer").as("node_type"))
      .orderBy(col("rank").desc, col("node"))
      .limit(25)
  }

  val all: Seq[QueryDef] = Seq(q65PageRank)
}
