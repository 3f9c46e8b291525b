package graft.operators

import graft.CkptOps

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

  /** The checkpointed bipartite edge list, memoized per (session,
    * dir): q65, q241 and q270 all derive this identical frame in one
    * Verify/Bench process — share it like a materialized view. */
  private[operators] def ckptEdges(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.FrameCache.getOrBuild(s, s"prBipartiteEdges:$dir") {
      edges(Tables.orders(s, dir), Tables.lineitem(s, dir)).ckpt()
    }

  def compute(orders: DataFrame, lineitem: DataFrame): DataFrame =
    computeFrom(withOutdeg(edges(orders, lineitem)).ckpt())

  // outdeg rides ON the edge row: one static (src, dst, outdeg) list
  // materialized once, so each round is ONE join + one agg — not a
  // second outdeg join per iteration. Computed via a window over
  // src: ONE shuffle and ONE pass over the edge derivation (a
  // self-join e ⋈ groupBy(e) would execute the whole
  // orders⋈lineitem→distinct lineage twice, once per side).
  private def withOutdeg(e: DataFrame): DataFrame =
    e.withColumn("outdeg",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))

  private def computeFrom(eDeg: DataFrame): DataFrame = {
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
    computeFrom(graft.FrameCache.getOrBuild(s, s"prEdgesDeg:$dir") {
      withOutdeg(ckptEdges(s, dir)).ckpt()
    })
      .select(col("node"), col("rank"),
        when(col("node") >= PART_OFFSET, "part").otherwise("customer").as("node_type"))
      .orderBy(col("rank").desc, col("node"))
      .limit(25)
  }

  private val HITS_ITERS = 4

  /** Oracle twin of [[q239Hits]]: the identical integer iteration
    * unrolled into MATERIALIZED CTE rounds (plain CTEs would re-expand
    * the chain multiplicatively — the q150 lesson). */
  private def hitsOracleSql: String = {
    val rounds = (1 to HITS_ITERS).map { r =>
      val hPrev = if (r == 1) "h0" else s"h${r - 1}"
      s"""a${r}r AS MATERIALIZED (
         |  SELECT p, CAST(sum(h) AS BIGINT) AS ar
         |  FROM e JOIN $hPrev USING (c) GROUP BY p),
         |a$r AS MATERIALIZED (
         |  SELECT p, (ar * $SCALE) // (SELECT max(ar) FROM a${r}r) AS a
         |  FROM a${r}r),
         |h${r}r AS MATERIALIZED (
         |  SELECT c, CAST(sum(a) AS BIGINT) AS hr
         |  FROM e JOIN a$r USING (p) GROUP BY c),
         |h$r AS MATERIALIZED (
         |  SELECT c, (hr * $SCALE) // (SELECT max(hr) FROM h${r}r) AS h
         |  FROM h${r}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |h0 AS (SELECT DISTINCT c, CAST($SCALE AS BIGINT) AS h FROM e),
       |$rounds,
       |ta AS (SELECT 'auth' AS side,
       |         CAST(row_number() OVER (ORDER BY a DESC, p) AS BIGINT) AS rk,
       |         p AS id, a AS score FROM a$HITS_ITERS),
       |th AS (SELECT 'hub' AS side,
       |         CAST(row_number() OVER (ORDER BY h DESC, c) AS BIGINT) AS rk,
       |         c AS id, h AS score FROM h$HITS_ITERS)
       |SELECT side, rk, id, score FROM ta WHERE rk <= 10
       |UNION ALL SELECT side, rk, id, score FROM th WHERE rk <= 10
       |ORDER BY side, rk""".stripMargin
  }

  /** q239 — HITS hubs & authorities (Kleinberg JACM'99) on the
    * DIRECTED customer→part purchase graph: a part's authority is the
    * summed hub weight of its buyers, a customer's hub weight the
    * summed authority of their basket — the mutually-reinforcing
    * eigenpair that surfaces "curator" customers and "canonical"
    * parts, where PageRank's single random walk (q65) conflates the
    * two roles. Four alternating rounds, then the top-10 of each side.
    *
    * Exactness: integer scores normalized each half-round by the
    * CURRENT MAX (L∞) instead of the L2 norm — same fixed point
    * direction, but max+truncating-div is exact integer arithmetic in
    * both engines, where an L2 norm would couple the gate to sqrt
    * rounding. Headroom: score ≤ 1e6, so a sum is ≤ 1e6·deg and the
    * ×1e6 rescale stays under int64 to deg ≈ 9e6; past that, rescale
    * by `div` before multiply (documented, not needed at any shipped
    * scale).
    *
    * Scale design (100 TB): identical Pregel shape to q65 — static
    * distinct edge list checkpointed once; the frontier (≤|V| rows,
    * one side at a time) BROADCASTS into the edge join each
    * half-round, so edges never shuffle; each max is a 1-row
    * broadcast. Top-10s plan as TakeOrdered (per-partition heaps) and
    * the rank window runs over 10 collected rows. */
  val q239Hits: QueryDef = QueryDef("q239_hits", hitsOracleSql) { (s, dir) =>
    val e = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .ckpt()
    var h = e.select(col("c")).distinct()
      .select(col("c"), lit(SCALE).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to HITS_ITERS) {
      // checkpoint each half-round frontier: the normalize step consumes
      // its input twice (sum + max), so an unbroken lineage would
      // re-execute every earlier round multiplicatively per branch
      val ar = broadcast(h).join(e, Seq("c"))
        .groupBy(col("p")).agg(sum(col("h")).as("ar"))
        .ckpt()
      val am = ar.agg(max(col("ar")).as("am"))
      a = ar.crossJoin(broadcast(am))
        .select(col("p"), expr(s"(ar * $SCALE) div nullif(am, 0)").as("a"))
      val hr = broadcast(a).join(e, Seq("p"))
        .groupBy(col("c")).agg(sum(col("a")).as("hr"))
        .ckpt()
      val hm = hr.agg(max(col("hr")).as("hm"))
      h = hr.crossJoin(broadcast(hm))
        .select(col("c"), expr(s"(hr * $SCALE) div nullif(hm, 0)").as("h"))
    }
    def top(df: DataFrame, idCol: String, scoreCol: String,
        side: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol))
      df.orderBy(col(scoreCol).desc, col(idCol)).limit(10)
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .select(lit(side).as("side"), col("rk"), col(idCol).as("id"),
          col(scoreCol).as("score"))
    }
    top(a, "p", "a", "auth").unionByName(top(h, "c", "h", "hub"))
      .orderBy("side", "rk")
  }

  private val LPA_ITERS = 3

  /** Oracle twin of [[q241LabelProp]]: the same synchronous rounds
    * unrolled as MATERIALIZED CTEs, with the argmax spelled as the
    * max-count ⋈ min-label join both engines execute identically. */
  private def lpaOracleSql: String =
    s"""WITH $lpaCtePrefix
       |SELECT lab, count(*) AS n_members,
       |  CAST(sum(CASE WHEN node < $PART_OFFSET THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_cust,
       |  CAST(sum(CASE WHEN node >= $PART_OFFSET THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_parts
       |FROM l$LPA_ITERS GROUP BY lab
       |ORDER BY n_members DESC, lab LIMIT 25""".stripMargin

  /** q241 — label-propagation communities (Raghavan et al. PRE'07) on
    * the purchase graph: every node adopts the most frequent label
    * among its neighbors AND itself each synchronous round (the
    * self-vote damps the oscillation sync-LPA suffers on bipartite
    * graphs), ties to the MIN label so the fixpoint is deterministic.
    * Communities are co-purchase market baskets — the graph-native
    * complement of q37's connected components (which merge on ANY
    * path) and q95's k-means (which needs a k and a metric space).
    *
    * Exactness: labels are node ids, votes are integer counts, and
    * the argmax is the max-count ⋈ min-label join — no floats, no
    * window, identical in both engines; a fixed round count keeps the
    * plan finite (the q65 discipline).
    *
    * Scale design (100 TB): the |V|-row label frontier BROADCASTS
    * into the static checkpointed edge list each round (edges never
    * shuffle); vote counts are partial-aggregable on (node, cand);
    * the max-count frame is |V| rows, broadcast back. Top-25 output
    * is a TakeOrdered heap. */
  val q241LabelProp: QueryDef = QueryDef("q241_label_prop", lpaOracleSql) {
    (s, dir) =>
    val e = ckptEdges(s, dir)
    lpaLabels(e).groupBy(col("lab"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("node") < PART_OFFSET, 1L).otherwise(0L)).as("n_cust"),
        sum(when(col("node") >= PART_OFFSET, 1L).otherwise(0L)).as("n_parts"))
      .orderBy(col("n_members").desc, col("lab"))
      .limit(25)
  }

  /** The q241 synchronous LPA loop, shared with q270's modularity
    * audit: fixed rounds, self-vote damping, max-count ⋈ min-label
    * argmax. Returns the final (node, lab) assignment. */
  private def lpaLabels(e: DataFrame): DataFrame = {
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .ckpt()
    for (_ <- 1 to LPA_ITERS) {
      val nbr = e.join(broadcast(labels.withColumnRenamed("node", "dst")),
          Seq("dst"))
        .select(col("src").as("node"), col("lab").as("cand"))
      val votes = nbr.unionAll(
        labels.select(col("node"), col("lab").as("cand")))
      val vc = votes.groupBy(col("node"), col("cand"))
        .agg(count(lit(1)).as("c"))
      // argmax(count) ⋈ argmin(label) fused as one lexicographic
      // struct-max: (c, -cand) max picks the largest count, then the
      // smallest candidate label — same fully-tie-broken result as
      // the oracle's mx-join-min chain, one partial-aggregable pass
      // instead of a second shuffle + broadcast join per round
      labels = vc
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("cand")).as("nc"))).as("m"))
        .select(col("node"), (-col("m.nc")).as("lab"))
        .ckpt()
    }
    labels
  }

  /** The shared SQL prefix for the LPA oracles: purchase edges, the
    * identity labeling, and the unrolled synchronous rounds. The
    * final labeling lives in CTE `l$LPA_ITERS`. */
  private def lpaCtePrefix: String = {
    val rounds = (1 to LPA_ITERS).map { r =>
      s"""v$r AS MATERIALIZED (
         |  SELECT e.src AS node, l.lab AS cand
         |  FROM edges e JOIN l${r - 1} l ON e.dst = l.node
         |  UNION ALL SELECT node, lab FROM l${r - 1}),
         |vc$r AS MATERIALIZED (
         |  SELECT node, cand, count(*) AS c FROM v$r GROUP BY node, cand),
         |mx$r AS MATERIALIZED (
         |  SELECT node, max(c) AS mc FROM vc$r GROUP BY node),
         |l$r AS MATERIALIZED (
         |  SELECT vc.node, min(vc.cand) AS lab
         |  FROM vc$r vc JOIN mx$r m ON vc.node = m.node AND vc.c = m.mc
         |  GROUP BY vc.node)""".stripMargin
    }.mkString(",\n")
    s"""bought AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + $PART_OFFSET AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT c AS src, p AS dst FROM bought
       |  UNION ALL SELECT p, c FROM bought),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
       |$rounds""".stripMargin
  }

  /** q270 — Newman modularity audit of the q241-shared LPA
    * communities: Q = Σ_c (e_c/m − (d_c/2m)²) over the same purchase
    * graph, reported per top community (its internal-edge mass,
    * degree mass, and modularity contribution) plus the grand total
    * row (lab = −1), which IS the partition's modularity. q241 finds
    * the communities; this scores whether the partition is actually
    * better than chance — the acceptance gate before anyone ships
    * "baskets" downstream (Q ≈ 0 means the communities are noise).
    *
    * Exactness: internal-edge and degree masses are exact int64
    * counts over the DIRECTED edge list (both identities double, so
    * the ratio is unchanged); each community's contribution is ONE
    * IEEE floor chain to nano units; the total is an integer sum of
    * those nanos (order-free) — deterministic in both engines.
    *
    * Scale design (100 TB): two equi-joins label the edge endpoints
    * (hash-partitioned on node — the label frame is |V| rows, NOT
    * broadcast), then everything is partial-aggregable per-label
    * mass; top-25 is a TakeOrdered heap and the total a 1-row sum. */
  val q270Modularity: QueryDef = QueryDef(
    "q270_modularity",
    s"""WITH $lpaCtePrefix,
       |lab AS MATERIALIZED (SELECT node, lab FROM l$LPA_ITERS),
       |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
       |ind AS (
       |  SELECT a.lab, CAST(count(*) AS BIGINT) AS in_edges
       |  FROM edges e JOIN lab a ON e.src = a.node
       |    JOIN lab b ON e.dst = b.node
       |  WHERE a.lab = b.lab GROUP BY 1),
       |dg AS (
       |  SELECT a.lab, CAST(count(*) AS BIGINT) AS deg_sum
       |  FROM edges e JOIN lab a ON e.src = a.node GROUP BY 1),
       |mem AS (
       |  SELECT lab, CAST(count(*) AS BIGINT) AS n_members
       |  FROM lab GROUP BY 1),
       |comm AS (
       |  SELECT mem.lab, mem.n_members,
       |    coalesce(ind.in_edges, 0) AS in_edges, dg.deg_sum,
       |    CAST(floor(1000000000.0 *
       |      (CAST(coalesce(ind.in_edges, 0) AS DOUBLE) / CAST(m2.m AS DOUBLE)
       |       - (CAST(dg.deg_sum AS DOUBLE) / CAST(m2.m AS DOUBLE))
       |         * (CAST(dg.deg_sum AS DOUBLE) / CAST(m2.m AS DOUBLE))))
       |      AS BIGINT) AS contrib_nano
       |  FROM mem JOIN dg USING (lab) LEFT JOIN ind USING (lab), m2),
       |top AS (SELECT * FROM comm ORDER BY n_members DESC, lab LIMIT 25),
       |tot AS (
       |  SELECT CAST(-1 AS BIGINT) AS lab,
       |    CAST(sum(n_members) AS BIGINT) AS n_members,
       |    CAST(sum(in_edges) AS BIGINT) AS in_edges,
       |    CAST(sum(deg_sum) AS BIGINT) AS deg_sum,
       |    CAST(sum(contrib_nano) AS BIGINT) AS contrib_nano
       |  FROM comm)
       |SELECT * FROM tot UNION ALL SELECT * FROM top
       |ORDER BY n_members DESC, lab""".stripMargin) { (s, dir) =>
    val e = ckptEdges(s, dir)
    val lab = lpaLabels(e).ckpt()
    val m2 = e.agg(count(lit(1)).as("m"))
    val el = e
      .join(lab.select(col("node").as("src"), col("lab").as("ls")), Seq("src"))
      .join(lab.select(col("node").as("dst"), col("lab").as("ld")), Seq("dst"))
    val ind = el.filter(col("ls") === col("ld"))
      .groupBy(col("ls").as("lab")).agg(count(lit(1)).as("in_edges"))
    val dg = e
      .join(lab.select(col("node").as("src"), col("lab")), Seq("src"))
      .groupBy(col("lab")).agg(count(lit(1)).as("deg_sum"))
    val mem = lab.groupBy(col("lab")).agg(count(lit(1)).as("n_members"))
    val md = col("m").cast("double")
    val comm = mem.join(dg, Seq("lab")).join(ind, Seq("lab"), "left")
      .crossJoin(broadcast(m2))
      .select(col("lab"), col("n_members"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"), col("deg_sum"),
        floor(lit(1000000000.0) *
          (coalesce(col("in_edges"), lit(0L)).cast("double") / md -
            (col("deg_sum").cast("double") / md) *
            (col("deg_sum").cast("double") / md)))
          .cast("bigint").as("contrib_nano"))
      .ckpt() // feeds the top-25 heap AND the total row
    val top = comm.orderBy(col("n_members").desc, col("lab")).limit(25)
    val tot = comm.agg(sum(col("n_members")).as("n_members"),
        sum(col("in_edges")).as("in_edges"),
        sum(col("deg_sum")).as("deg_sum"),
        sum(col("contrib_nano")).as("contrib_nano"))
      .select(lit(-1L).as("lab"), col("n_members"), col("in_edges"),
        col("deg_sum"), col("contrib_nano"))
    tot.unionByName(top).orderBy(col("n_members").desc, col("lab"))
  }

  private val SSSP_ROUNDS = 4
  private val SSSP_SOURCE = 1L // customer node 1 (min custkey at every SF)

  /** Oracle twin of [[q242Sssp]]: the same Bellman–Ford relaxations
    * unrolled as MATERIALIZED CTE rounds. */
  private def ssspOracleSql: String = {
    val rounds = (1 to SSSP_ROUNDS).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT e.dst AS node, d.dist + e.w AS dist
         |    FROM e JOIN d${r - 1} d ON e.src = d.node
         |    UNION ALL SELECT node, dist FROM d${r - 1})
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ew AS MATERIALIZED (
       |  SELECT o.o_custkey AS c, l.l_partkey + $PART_OFFSET AS p,
       |    min(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT c AS src, p AS dst, w FROM ew
       |  UNION ALL SELECT p, c, w FROM ew),
       |d0 AS (SELECT CAST($SSSP_SOURCE AS BIGINT) AS node,
       |       CAST(0 AS BIGINT) AS dist),
       |$rounds
       |SELECT node, dist,
       |  CASE WHEN node >= $PART_OFFSET THEN 'part' ELSE 'customer' END
       |    AS node_type
       |FROM d$SSSP_ROUNDS ORDER BY dist, node LIMIT 25""".stripMargin
  }

  /** q242 — Bellman–Ford single-source shortest paths on the purchase
    * graph, edge weight = cheapest line (half-up cents) ever shipped
    * on that customer–part link: the "cost to reach" metric behind
    * related-product distance and supply-path audits. Four synchronous
    * relaxation rounds bound path length at 4 hops (2 customer↔part
    * alternations each way) — the frontier-expansion sibling of q65
    * (fixed-round diffusion) and q37 (unweighted closure).
    *
    * Exactness: weights and distances are int64 cents; each round is
    * min(previous, min(neighbor + w)) — associative mins over exact
    * integers, identical under any execution order; unreachable nodes
    * simply never enter the frontier (no ∞ sentinel to encode).
    *
    * Scale design (100 TB): the distance frontier (≤|V| rows)
    * BROADCASTS into the static checkpointed weighted edge list each
    * round; the relax step is a partial-aggregable min on dst. Top-25
    * output is a TakeOrdered heap. */
  val q242Sssp: QueryDef = QueryDef("q242_sssp", ssspOracleSql) { (s, dir) =>
    val ew = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"),
        (col("l_partkey") + PART_OFFSET).as("p"))
      .agg(min(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .as("w"))
    val e = ew.select(col("c").as("src"), col("p").as("dst"), col("w"))
      .unionAll(ew.select(col("p").as("src"), col("c").as("dst"), col("w")))
      .ckpt()
    var dist = e.sparkSession.range(1)
      .select(lit(SSSP_SOURCE).as("node"), lit(0L).as("dist"))
    for (_ <- 1 to SSSP_ROUNDS) {
      val relaxed = e.join(broadcast(dist.withColumnRenamed("node", "src")),
          Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = relaxed.unionAll(dist)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .ckpt()
    }
    dist.select(col("node"), col("dist"),
        when(col("node") >= PART_OFFSET, "part").otherwise("customer")
          .as("node_type"))
      .orderBy(col("dist"), col("node"))
      .limit(25)
  }

  /** q373 — personalized PageRank (Jeh–Widom '03) from the
    * minimum-id customer: q65's teleport mass goes to ONE seed node
    * instead of uniformly, turning global importance into
    * seed-relative relevance — the similarity behind "customers like
    * you bought" recommendations and local graph exploration, and the
    * standard ANN-free candidate generator over interaction graphs.
    * Same integer-exact iteration as q65 (rank' = 15%·SCALE·[seed] +
    * 85%·Σ(rank div outdeg), all integer div), so the oracle's
    * recursive CTE is bit-identical; same broadcast-frontier Pregel
    * shape (the |V|-row frontier against the static memoized edge
    * list, one partial-aggregable contrib sum per round). Output: the
    * top-25 nodes by personalized rank — the seed's recommendation
    * neighborhood. */
  val q373Ppr: QueryDef = {
    val s15 = SCALE * 15 / 100
    QueryDef(
      "q373_ppr",
      s"""WITH RECURSIVE bought AS (
         |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + $PART_OFFSET AS p
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |edges AS (
         |  SELECT c AS src, p AS dst FROM bought
         |  UNION ALL SELECT p, c FROM bought),
         |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |seed AS (SELECT min(c) AS sd FROM bought),
         |pr(iter, node, rank) AS (
         |  SELECT 0, src,
         |    CAST(CASE WHEN src = seed.sd THEN $SCALE ELSE 0 END AS BIGINT)
         |  FROM outdeg, seed
         |  UNION ALL
         |  SELECT pr.iter + 1, e.dst,
         |    CAST(CASE WHEN e.dst = seed.sd THEN $s15 ELSE 0 END +
         |      (85 * sum(pr.rank // o.outdeg)) // 100 AS BIGINT)
         |  FROM pr JOIN edges e ON pr.node = e.src
         |  JOIN outdeg o ON o.src = pr.node, seed
         |  WHERE pr.iter < $ITERS
         |  GROUP BY pr.iter + 1, e.dst, seed.sd),
         |final AS (SELECT node, rank FROM pr WHERE iter = $ITERS)
         |SELECT node, rank,
         |  CASE WHEN node >= $PART_OFFSET THEN 'part' ELSE 'customer' END
         |    AS node_type
         |FROM final WHERE rank > 0 ORDER BY rank DESC, node
         |LIMIT 25""".stripMargin) { (s, dir) =>
      val eDeg = graft.FrameCache.getOrBuild(s, s"prEdgesDeg:$dir") {
        withOutdeg(ckptEdges(s, dir)).ckpt()
      }
      val seed = eDeg.filter(col("src") < PART_OFFSET)
        .agg(min(col("src")).as("sd"))
      var ranks = eDeg.select(col("src").as("node")).distinct()
        .crossJoin(broadcast(seed))
        .select(col("node"),
          when(col("node") === col("sd"), SCALE).otherwise(0L).as("rank"))
      for (_ <- 1 to ITERS) {
        ranks = broadcast(ranks)
          .join(eDeg, col("node") === col("src"))
          .select(col("dst"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("dst").as("node"))
          .agg(expr("(85 * sum(contrib)) div 100").as("r85"))
          .crossJoin(broadcast(seed))
          .select(col("node"),
            (when(col("node") === col("sd"), s15).otherwise(0L) + col("r85"))
              .as("rank"))
      }
      ranks.filter(col("rank") > 0)
        .select(col("node"), col("rank"),
          when(col("node") >= PART_OFFSET, "part").otherwise("customer")
            .as("node_type"))
        .orderBy(col("rank").desc, col("node"))
        .limit(25)
    }
  }

  val all: Seq[QueryDef] = Seq(q65PageRank, q239Hits, q241LabelProp, q242Sssp,
    q270Modularity, q373Ppr)
}
