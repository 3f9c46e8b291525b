package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics beyond the iterative operators ([[PageRank]],
  * [[ConnectedComponents]]): one-shot relational graph queries. */
object Graph {

  /** Canonical co-purchase edge list (parts co-occurring in ≥ minPair
    * distinct orders, edges oriented a < b) — the shared graph under
    * q150's k-core peel and q155's link prediction.
    *
    * Built WITHOUT a self-join on the basket table: per-order sorted
    * item arrays expand map-side into C(k,2) canonical pairs (q107's
    * structure), so the only shuffles are the basket distinct and the
    * pair count. Checkpointed because every caller reuses it on
    * multiple join sides, and memoized per (session, dir, minPair)
    * because FOUR separate queries (q150/q155/q238/q275) derive this
    * identical frame in one Verify/Bench process — the cluster
    * equivalent of a shared materialized view. */
  private[graft] def coPurchaseEdges(
      s: org.apache.spark.sql.SparkSession, dir: String, minPair: Int) =
    coPurchaseEdgesW(s, dir, minPair).select(col("a"), col("b2"))

  /** Weighted variant: (a, b2, n) with n = co-purchase count. The
    * MEMOIZED frame carries the count so q284's maximum-affinity
    * forest shares the same materialization instead of re-deriving
    * the identical pair counts through its own basket self-join (the
    * unweighted callers just project it away — same cache entry). */
  private[graft] def coPurchaseEdgesW(
      s: org.apache.spark.sql.SparkSession, dir: String, minPair: Int) =
    graft.FrameCache.getOrBuild(s, s"coPurchaseEdges:$dir:$minPair") {
      coPurchaseEdgesBuild(s, dir, minPair)
    }

  private def coPurchaseEdgesBuild(
      s: org.apache.spark.sql.SparkSession, dir: String, minPair: Int) =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), y -> " +
          "struct(x AS a, y AS b2))))")).as("pp"))
      .select(col("pp.a").as("a"), col("pp.b2").as("b2"))
      .groupBy(col("a"), col("b2"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPair)
      .ckpt()

  /** q104 — triangle counting over the token co-occurrence graph
    * (nodes = tokens, edge when two tokens are adjacent in ≥ T
    * documents' text): the classic "is it really distributed?" graph
    * benchmark, because the naive path explodes on high-degree nodes.
    *
    * The relational form: canonicalize every edge to (a < b), then
    * count ordered wedges closed by a third edge — each triangle
    * {a,b,c} with a<b<c is counted exactly once as
    * e(a,b) ⋈ e(b,c) ⋈ e(a,c). Both joins are equi-joins over the
    * (deduplicated, thresholded) edge list, which is materialized
    * ONCE and reused on all three sides.
    *
    * Scale note: lexicographic orientation is exact and fine below
    * ~1B edges; at web scale the standard refinement is ordering by
    * (degree, id) instead (Suri & Vassilvitskii's MR triangle
    * counting) so wedge fan-out is bounded by the SMALLER endpoint's
    * degree — same plan shape, different orientation key, which is
    * why the orientation lives in one place here. */
  val q104Triangles: QueryDef = {
    val T = 25 // co-occurrence threshold: denoise rare adjacencies
    QueryDef(
      "q104_triangles",
      s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
         |p0 AS (
         |  SELECT tk[CAST(i AS INT)] AS x, tk[CAST(i AS INT)+1] AS y
         |  FROM t, unnest(range(1, len(tk))) AS u(i)),
         |p AS (SELECT least(x, y) AS a, greatest(x, y) AS b FROM p0 WHERE x <> y),
         |e AS (SELECT a, b FROM p GROUP BY a, b HAVING count(*) >= $T),
         |n AS (SELECT count(DISTINCT node) AS n_nodes FROM
         |  (SELECT a AS node FROM e UNION SELECT b FROM e)),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         |tr AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT n.n_nodes, m.n_edges, tr.n_triangles FROM n, m, tr""".stripMargin) { (s, dir) =>
      val tk = col("tk")
      val pairs = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
        .select(split(col("text"), " ").as("tk"))
        .filter(size(tk) >= 2)
        .select(explode(zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
        .filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      // materialize ONCE: the thresholded edge list feeds the node
      // count and all THREE sides of the triangle join
      val edges = pairs.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= T)
        .select(col("a"), col("b"))
        .ckpt()
      val nodes = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node")))
        .agg(countDistinct(col("node")).as("n_nodes"))
      val m = edges.agg(count(lit(1)).as("n_edges"))
      val tri = edges.select(col("a").as("e1a"), col("b").as("e1b"))
        .join(edges.select(col("a").as("e2a"), col("b").as("e2b")),
          col("e1b") === col("e2a"))
        .join(edges.select(col("a").as("e3a"), col("b").as("e3b")),
          col("e3a") === col("e1a") && col("e3b") === col("e2b"))
        .agg(count(lit(1)).as("n_triangles"))
      nodes.crossJoin(m).crossJoin(tri)
    }
  }

  /** q132 — hierarchy explosion (BOM / org-chart transitive closure):
    * walk a parent→child graph from a set of roots, multiplying edge
    * quantities along each path, and report per root the component
    * count and total effective quantity. The recursive query family —
    * the one shape a single SQL SELECT cannot express and warehouses
    * reach for WITH RECURSIVE.
    *
    * The hierarchy is derived deterministically from the part table
    * (heap edges p → 2p+1, 2p+2 with qty 1+(child mod 3)), so both
    * engines build the identical graph. Spark executes the closure as
    * a frontier LOOP: each level is one equi-join of the (checkpointed
    * once) edge list against the previous frontier — depth is
    * log₂(parts), each level is a bounded shuffle, and lineage is cut
    * per level (the q37/q65 iterative contract). The oracle is the
    * recursive CTE, so the gate proves loop ≡ recursion.
    *
    * Products stay int64: qty ≤ 3 per edge, depth ≤ log₂(n). */
  val q132BomExplosion: QueryDef = QueryDef(
    "q132_bom_explosion",
    """WITH RECURSIVE e AS (
      |  SELECT p_partkey AS parent, p_partkey * 2 + b AS child,
      |    1 + (p_partkey * 2 + b) % 3 AS qty
      |  FROM part, (SELECT 1 AS b UNION ALL SELECT 2) t
      |  WHERE p_partkey * 2 + b <= (SELECT max(p_partkey) FROM part)),
      |x AS (
      |  SELECT p_partkey AS root, p_partkey AS node, CAST(1 AS BIGINT) AS qty
      |  FROM part WHERE p_partkey < 10
      |  UNION ALL
      |  SELECT x.root, e.child, x.qty * e.qty FROM x JOIN e ON e.parent = x.node)
      |SELECT root, CAST(count(*) AS BIGINT) AS n_components,
      |  CAST(sum(qty) AS BIGINT) AS total_qty
      |FROM x GROUP BY root ORDER BY root""".stripMargin) { (s, dir) =>
    val part = Tables.part(s, dir)
    val mx = part.agg(max(col("p_partkey")).as("mx"))
    val edges = part.select(col("p_partkey").as("parent"),
        explode(array(lit(1L), lit(2L))).as("b"))
      .crossJoin(broadcast(mx))
      .withColumn("child", col("parent") * 2 + col("b"))
      .filter(col("child") <= col("mx"))
      .select(col("parent"), col("child"),
        (lit(1L) + col("child") % 3).as("eqty"))
      .ckpt() // reused by every frontier level
    var frontier = part.filter(col("p_partkey") < 10)
      .select(col("p_partkey").as("root"), col("p_partkey").as("node"),
        lit(1L).as("qty"))
      .ckpt()
    var acc = frontier
    var more = true
    while (more) {
      frontier = frontier.join(edges, col("node") === col("parent"))
        .select(col("root"), col("child").as("node"),
          (col("qty") * col("eqty")).as("qty"))
        .ckpt() // cut lineage per level
      if (frontier.isEmpty) more = false
      else acc = acc.unionByName(frontier)
    }
    acc.groupBy(col("root"))
      .agg(count(lit(1)).as("n_components"), sum(col("qty")).as("total_qty"))
      .orderBy("root")
  }

  /** q150 — k-core peeling trajectory over the co-purchase graph
    * (parts co-occurring in ≥ 2 orders, q107's pair structure):
    * repeatedly drop nodes with degree < K and report, per round, how
    * many nodes still qualify and how many edges survive. The
    * trajectory is the community-density profile behind "which items
    * form a stable co-purchase core" — and the k-core itself is the
    * classic preprocessing prune for dense-subgraph mining.
    *
    * Bounded iteration, the q65/q132 contract: R = 8 fixed rounds
    * (the per-round output is well-defined whether or not the peel
    * has converged by R — no data-dependent loop count), each round
    * one degree aggregate + one semi-join on the current edge list,
    * lineage cut per round. Peeling is order-independent (the set of
    * survivors after each synchronized round is unique), so the
    * output is deterministic at any parallelism. The oracle unrolls
    * the same R rounds as generated CTEs — the gate proves loop ≡
    * unrolled recursion. */
  val q150KcorePeel: QueryDef = {
    val K = 3  // core degree
    val R = 8  // fixed peel rounds
    val MIN_PAIR = 2
    // MATERIALIZED: DuckDB inlines plain CTEs, so an unrolled chain
    // whose every round references the previous one three times would
    // re-expand e0 exponentially (3^R scans — found as an fd blowup)
    val rounds = (1 to R).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node FROM (
         |    SELECT a AS node FROM e${i - 1} UNION ALL SELECT b2 FROM e${i - 1})
         |  GROUP BY node HAVING count(*) >= $K),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b2 FROM e${i - 1} e
         |  JOIN d$i x ON e.a = x.node JOIN d$i y ON e.b2 = y.node)""".stripMargin
    }.mkString(",\n")
    val report = (1 to R).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM d$i) AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS n_edges""".stripMargin
    }.mkString("\nUNION ALL\n")
    QueryDef(
      "q150_kcore_peel",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |$rounds
         |$report
         |ORDER BY round""".stripMargin) { (s, dir) =>
      var edges = coPurchaseEdges(s, dir, MIN_PAIR)
      val out = (1 to R).map { i =>
        val deg = edges.select(col("a").as("node"))
          .unionByName(edges.select(col("b2").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= K)
          .select(col("node"))
        val nNodes = deg.count()
        edges = edges
          .join(deg.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(deg.select(col("node").as("b2")), Seq("b2"), "left_semi")
          .select(col("a"), col("b2"))
          .ckpt()
        (i.toLong, nNodes, edges.count())
      }
      import s.implicits._
      out.toDF("round", "n_nodes", "n_edges").orderBy("round")
    }
  }

  /** q155 — common-neighbor link prediction over the co-purchase
    * graph: for every NON-adjacent part pair, count shared neighbors
    * (the classic common-neighbors score) and its Jaccard form
    * cn / (deg(x) + deg(y) − cn), and report the top-20 recommended
    * links. This is the "customers who bought X also bought things
    * bought with Y" recommender primitive, run as pure relational
    * algebra.
    *
    * Plan shape: the wedge join — adjacency ⋈ adjacency on the shared
    * center with nb₁ < nb₂, so each unordered candidate pair is
    * produced once per common neighbor and a single count gives cn.
    * Then one left-anti join removes already-connected pairs and two
    * broadcast-size degree joins attach the Jaccard denominator. The
    * final top-20 is orderBy().limit() — planned as TakeOrdered
    * (per-partition heaps), never a global sort.
    *
    * Scale design (100 TB): wedge fan-out is Σ_w deg(w)², which one
    * hub can blow up, so wedge CENTERS are capped at degree ≤ DCAP —
    * the standard hub-suppression for distributed common-neighbor
    * scoring (a hub shared by half the catalog carries no signal for
    * a top-k recommender anyway). The cap binds the per-center work
    * at DCAP² and is applied identically in the oracle; at test scale
    * it is inert (max degree 13 at sf0.01, asserted in
    * GraphOpsSpec), so the gate proves the capped plan exact. */
  val q155LinkPredict: QueryDef = {
    val MIN_PAIR = 2 // q150's edge threshold: ≥ 2 shared orders
    val DCAP = 64    // hub cap for wedge centers
    val TOPK = 20
    QueryDef(
      "q155_link_predict",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |adj AS (SELECT a AS n, b2 AS nb FROM e0 UNION ALL SELECT b2, a FROM e0),
         |deg AS MATERIALIZED (SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY n),
         |ctr AS (SELECT n FROM deg WHERE d <= $DCAP),
         |cadj AS (SELECT adj.n, adj.nb FROM adj JOIN ctr USING (n)),
         |wedge AS (
         |  SELECT a1.nb AS x, a2.nb AS y, CAST(count(*) AS BIGINT) AS cn
         |  FROM cadj a1 JOIN cadj a2 ON a1.n = a2.n AND a1.nb < a2.nb
         |  GROUP BY 1, 2),
         |cand AS (
         |  SELECT w.x, w.y, w.cn FROM wedge w
         |  LEFT JOIN e0 e ON e.a = w.x AND e.b2 = w.y
         |  WHERE e.a IS NULL)
         |SELECT c.x, c.y, c.cn,
         |  (1000000 * c.cn) // (dx.d + dy.d - c.cn) AS jaccard_ppm
         |FROM cand c JOIN deg dx ON dx.n = c.x JOIN deg dy ON dy.n = c.y
         |ORDER BY c.cn DESC, c.x, c.y LIMIT $TOPK""".stripMargin) { (s, dir) =>
      val edges = coPurchaseEdges(s, dir, MIN_PAIR)
      val adj = edges.select(col("a").as("n"), col("b2").as("nb"))
        .unionByName(edges.select(col("b2").as("n"), col("a").as("nb")))
      val deg = adj.groupBy(col("n")).agg(count(lit(1)).as("d"))
      val centers = deg.filter(col("d") <= DCAP).select(col("n"))
      val cadj = adj.join(centers, Seq("n"), "left_semi").ckpt()
      val wedges = cadj.select(col("n"), col("nb").as("x"))
        .join(cadj.select(col("n"), col("nb").as("y")), Seq("n"))
        .filter(col("x") < col("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
      val cand = wedges.join(edges,
        wedges("x") === edges("a") && wedges("y") === edges("b2"), "left_anti")
      cand
        .join(deg.select(col("n").as("x"), col("d").as("dx")), Seq("x"))
        .join(deg.select(col("n").as("y"), col("d").as("dy")), Seq("y"))
        .select(col("x"), col("y"), col("cn"),
          expr("(1000000 * cn) div nullif(dx + dy - cn, 0)").as("jaccard_ppm"))
        .orderBy(col("cn").desc, col("x"), col("y"))
        .limit(TOPK)
    }
  }

  /** q260 — Weisfeiler–Lehman color refinement over the co-purchase
    * graph (2 rounds): every node starts colored by its degree, then
    * each round recolors to hash(own color, multiset of neighbor
    * colors); the per-round partition profile (distinct colors, the
    * largest color class, singleton count) is the graph's structural
    * fingerprint — the kernel feature behind WL graph kernels and
    * GNN expressiveness, and operationally the "how role-diverse is
    * this graph" profile that decides whether degree alone is an
    * adequate blocking key (q241 communities group by PROXIMITY; WL
    * colors group by local ROLE — two nodes far apart get the same
    * color iff their neighborhoods look alike).
    *
    * Exactness: the neighbor-color multiset is folded through a
    * COMMUTATIVE hash — Σ over neighbors of the 60-bit md5 prefix of
    * the neighbor's color, accumulated in DECIMAL(38)/HUGEINT
    * (order-free, no overflow at any degree) — so no per-node sort
    * or collect is needed and the result is partition-invariant;
    * recolor = md5(old ‖ ':' ‖ digit string of the sum), identical
    * in both engines.
    *
    * Scale design (100 TB): each round is ONE equi-join (neighbor
    * color lookup on u) + ONE partial-aggregable sum on v — two
    * exchanges per round, R = 2 fixed rounds, lineage cut per round;
    * the sum-fold means a 10⁶-degree hub costs the combiner, not a
    * sort. Reports are bounded 1-row aggregates per round. */
  val q260WlRefinement: QueryDef = {
    val R = 2
    val MIN_PAIR = 2
    val rounds = (1 to R).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT a.v, md5(p.c || ':' || CAST(
         |      sum(('0x' || substring(md5(n.c), 1, 15))::BIGINT)
         |      AS VARCHAR)) AS c
         |  FROM adj a JOIN c${i - 1} n ON a.u = n.v
         |    JOIN c${i - 1} p ON p.v = a.v
         |  GROUP BY a.v, p.c)""".stripMargin
    }.mkString(",\n")
    val report = (0 to R).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
         |  CAST(count(*) AS BIGINT) AS n_colors,
         |  CAST(max(m) AS BIGINT) AS max_class,
         |  CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_singletons
         |FROM (SELECT c, count(*) AS m FROM c$i GROUP BY c)""".stripMargin
    }.mkString("\nUNION ALL\n")
    QueryDef(
      "q260_wl_refinement",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |adj AS MATERIALIZED (
         |  SELECT a AS v, b2 AS u FROM e0
         |  UNION ALL SELECT b2 AS v, a AS u FROM e0),
         |c0 AS MATERIALIZED (
         |  SELECT v, md5(CAST(count(*) AS VARCHAR)) AS c
         |  FROM adj GROUP BY v),
         |$rounds
         |$report
         |ORDER BY round""".stripMargin) { (s, dir) =>
      val e = coPurchaseEdges(s, dir, MIN_PAIR)
      val adj = e.select(col("a").as("v"), col("b2").as("u"))
        .unionByName(e.select(col("b2").as("v"), col("a").as("u")))
        .ckpt()
      def summarize(r: Int, cdf: org.apache.spark.sql.DataFrame) =
        cdf.groupBy(col("c")).agg(count(lit(1)).as("m"))
          .agg(count(lit(1)).as("n_colors"), max(col("m")).as("max_class"),
            sum(when(col("m") === 1, 1L).otherwise(0L)).as("n_singletons"))
          .select(lit(r.toLong).as("round"), col("n_colors"),
            col("max_class"), col("n_singletons"))
      var color = adj.groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .select(col("v"), md5(col("deg").cast("string")).as("c"))
        .ckpt()
      var out = summarize(0, color)
      for (r <- 1 to R) {
        val nh = adj
          .join(color.select(col("v").as("u"), col("c").as("cu")), Seq("u"))
          .groupBy(col("v"))
          .agg(sum(expr(
            "cast(conv(substring(md5(cu), 1, 15), 16, 10) as decimal(38,0))"))
            .as("sh"))
        color = color.join(nh, Seq("v"))
          .select(col("v"),
            md5(concat(col("c"), lit(":"), col("sh").cast("string"))).as("c"))
          .ckpt()
        out = out.unionByName(summarize(r, color))
      }
      out.orderBy("round")
    }
  }

  /** q275 — hub-removal robustness audit (targeted-attack
    * percolation): remove the top-k highest-degree nodes from the
    * co-purchase graph for k ∈ {0, 10, 25, 50} and report how the
    * edge mass, component count, and giant-component size degrade —
    * the scale-free-network fragility curve ("how much of the basket
    * graph survives losing its hub products") that decides whether
    * graph-derived features are robust to catalog churn. Complements
    * q150 (k-core peels by LOCAL density; this attacks GLOBAL hubs).
    *
    * Exactness: hub picks are (degree desc, node) TakeOrdered —
    * fully tie-broken; components come from the shared
    * [[ConnectedComponents]] contract (min reachable node), whose
    * recursive-CTE oracle is spliced once per k with suffixed
    * identifiers; all stats are exact counts.
    *
    * Scale design (100 TB): the degree pass and each filtered edge
    * set are partial-aggregable / anti-joins against a broadcast
    * ≤50-row hub list; components ride the dual-path CC operator
    * (driver union-find under the gate, distributed min-label
    * above); four fixed k values = four bounded passes over the
    * checkpointed edge list. */
  val q275HubRobustness: QueryDef = {
    val KS = Seq(0, 10, 25, 50)
    def ccFor(sfx: String): String = ConnectedComponents.oracleCte
      .replaceAll("\\bnodes\\b", s"nodes$sfx")
      .replaceAll("\\bundirected\\b", s"und$sfx")
      .replaceAll("\\breach\\b", s"reach$sfx")
      .replaceAll("\\bcomp\\b", s"comp$sfx")
      .replaceAll("\\bedges\\b", s"kept$sfx")
    val perK = KS.map { k =>
      s"""hubs$k AS (
         |  SELECT node FROM deg ORDER BY d DESC, node LIMIT $k),
         |kept$k AS (
         |  SELECT a, b FROM e0x
         |  WHERE a NOT IN (SELECT node FROM hubs$k)
         |    AND b NOT IN (SELECT node FROM hubs$k)),
         |${ccFor(k.toString)},
         |st$k AS (
         |  SELECT CAST($k AS BIGINT) AS k,
         |    (SELECT CAST(count(*) AS BIGINT) FROM comp$k) AS n_nodes,
         |    (SELECT CAST(count(*) AS BIGINT) FROM kept$k) AS n_edges,
         |    (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp$k)
         |      AS n_components,
         |    coalesce((SELECT CAST(max(m) AS BIGINT) FROM (
         |      SELECT count(*) AS m FROM comp$k GROUP BY component)),
         |      CAST(0 AS BIGINT)) AS gcc_size)""".stripMargin
    }.mkString(",\n")
    val report = KS.map(k => s"SELECT * FROM st$k").mkString("\nUNION ALL\n")
    QueryDef(
      "q275_hub_robustness",
      s"""WITH RECURSIVE b AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0x AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |deg AS MATERIALIZED (
         |  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT a AS node FROM e0x UNION ALL SELECT b FROM e0x)
         |  GROUP BY node),
         |$perK
         |$report
         |ORDER BY k""".stripMargin) { (s, dir) =>
      val e = coPurchaseEdges(s, dir, 2)
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
        .ckpt()
      import s.implicits._
      // per-k job budget (the r7 1.7x bench variance was checkpoint/
      // job count, not plan shape): k=0 reuses the memoized edge frame
      // (no anti-join, no re-checkpoint); k>0 checkpoints the pruned
      // edge set ONCE and shares it with the CC dispatch via
      // computeCkpt (compute() would re-checkpoint + re-count); the
      // node/component/gcc stats collapse into a single aggregation
      // over the component-size frame instead of three actions.
      val rows = KS.map { k =>
        val kept =
          if (k == 0) e.select(col("a").cast("long"), col("b2").cast("long").as("b"))
          else {
            val hubs = deg.orderBy(col("d").desc, col("node")).limit(k)
              .select(col("node"))
            e.join(broadcast(hubs.select(col("node").as("a"))), Seq("a"), "anti")
              .join(broadcast(hubs.select(col("node").as("b2"))), Seq("b2"), "anti")
              .select(col("a").cast("long"), col("b2").cast("long").as("b"))
              .ckpt()
          }
        val nEdges = kept.count()
        val comp = ConnectedComponents.computeCkpt(s, kept, nEdges)
        val st = comp.groupBy(col("component")).agg(count(lit(1)).as("m"))
          .agg(coalesce(sum(col("m")), lit(0L)).as("nn"),
            count(lit(1)).as("nc"),
            coalesce(max(col("m")), lit(0L)).as("g"))
          .head()
        (k.toLong, st.getLong(0), nEdges, st.getLong(1), st.getLong(2))
      }
      rows.toDF("k", "n_nodes", "n_edges", "n_components", "gcc_size")
        .orderBy("k")
    }
  }

  /** q284 — Borůvka maximum-affinity spanning forest of the
    * co-purchase graph: every component simultaneously grabs its
    * strongest incident tie (largest co-purchase count; encoded as
    * min weight w = −count with (w, a, b) tiebreaks), components
    * merge, repeat — 3 synchronous rounds, each followed by 3
    * min-label pointer-jump contractions. The surviving forest is
    * the affinity BACKBONE of the basket graph (the edges a
    * single-linkage clustering would cut last), and Borůvka is THE
    * distributed MST algorithm — every step is a per-component
    * argmin, embarrassingly parallel, unlike Prim (sequential
    * frontier) or Kruskal (global sort + serial union-find). Per
    * round the report shows components before, edges picked, and
    * the cumulative forest weight. Certificates in the spec: every
    * round satisfies the exact forest identity (edges = nodes −
    * components — cycle-free by the consistent (w, a, b) total
    * order), every picked edge belongs to the true maximum spanning
    * forest (the Borůvka cut property), and at full convergence the
    * weight equals driver-side Kruskal's exactly.
    *
    * Exactness: weights are integer counts; every argmin is one
    * lexicographic struct-min over (w, a, b2, oc) — identical to the
    * oracle's staged wmin → amin → bmin → ocmin chain, no windows,
    * fully tie-broken; contraction is synchronous min-label propagation —
    * deterministic under any partitioning; the oracle unrolls the
    * identical rounds as MATERIALIZED CTEs (loop ≡ unrolled, the
    * q150 contract).
    *
    * Scale design (100 TB): labels are an equi-join per edge side
    * (hash-partitioned on node — never broadcast at |V| scale);
    * per-component argmins are partial-aggregable; the pointer-jump
    * inner rounds run on the COMPONENT graph, which shrinks
    * geometrically (Borůvka halves components per round); fixed
    * 3×3 rounds keep the plan finite, with lineage cuts per
    * round. */
  val q284Boruvka: QueryDef = {
    val R = 3  // Boruvka rounds
    val J = 12 // pointer-jump contraction rounds per Boruvka round
               // (2^12 covers any merge-chain depth; at petabyte scale
               // size it as ceil(log2 components) — the frame is tiny)
    val MIN_PAIR = 2
    def roundSql(r: Int): String = {
      val prevLab = if (r == 1) "lab0" else s"lab${r - 1}"
      val prevForest = if (r == 1)
        "SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b2, CAST(NULL AS BIGINT) AS w WHERE false"
        else s"SELECT a, b2, w FROM forest${r - 1}"
      val jumps = (1 to J).map { j =>
        val prev = if (j == 1) s"cl${r}_0" else s"cl${r}_${j - 1}"
        s"""cl${r}_$j AS MATERIALIZED (
           |  SELECT c.c, least(c.l, coalesce(n.ml, c.l)) AS l
           |  FROM $prev c LEFT JOIN (
           |    SELECT ce.c, min(p.l) AS ml
           |    FROM cg$r ce JOIN $prev p ON ce.oc = p.c
           |    GROUP BY ce.c) n ON c.c = n.c)""".stripMargin
      }.mkString(",\n")
      s"""el$r AS MATERIALIZED (
         |  SELECT la.l AS c, lb.l AS oc, e.w, e.a, e.b2
         |  FROM e0b e JOIN $prevLab la ON e.a = la.node
         |    JOIN $prevLab lb ON e.b2 = lb.node
         |  WHERE la.l <> lb.l),
         |es$r AS MATERIALIZED (
         |  SELECT c, oc, w, a, b2 FROM el$r
         |  UNION ALL SELECT oc, c, w, a, b2 FROM el$r),
         |w1_$r AS MATERIALIZED (SELECT c, min(w) AS w FROM es$r GROUP BY c),
         |w2_$r AS MATERIALIZED (
         |  SELECT s.c, s.w, min(s.a) AS a FROM es$r s
         |  JOIN w1_$r m ON s.c = m.c AND s.w = m.w GROUP BY s.c, s.w),
         |pick$r AS MATERIALIZED (
         |  SELECT s.c, s.w, s.a, min(s.b2) AS b2 FROM es$r s
         |  JOIN w2_$r m ON s.c = m.c AND s.w = m.w AND s.a = m.a
         |  GROUP BY s.c, s.w, s.a),
         |po$r AS MATERIALIZED (
         |  SELECT p.c, min(s.oc) AS oc, p.a, p.b2, p.w
         |  FROM pick$r p JOIN es$r s
         |    ON s.c = p.c AND s.w = p.w AND s.a = p.a AND s.b2 = p.b2
         |  GROUP BY p.c, p.a, p.b2, p.w),
         |forest$r AS MATERIALIZED (
         |  SELECT DISTINCT a, b2, w FROM (
         |    SELECT a, b2, w FROM po$r UNION ALL $prevForest)),
         |cg$r AS MATERIALIZED (
         |  SELECT c, oc FROM po$r UNION ALL SELECT oc, c FROM po$r),
         |cl${r}_0 AS MATERIALIZED (
         |  SELECT DISTINCT l AS c, l FROM $prevLab),
         |$jumps,
         |lab$r AS MATERIALIZED (
         |  SELECT p.node, c.l FROM $prevLab p
         |  JOIN cl${r}_$J c ON p.l = c.c)""".stripMargin
    }
    val report = (1 to R).map { r =>
      val prevLab = if (r == 1) "lab0" else s"lab${r - 1}"
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(count(DISTINCT l) AS BIGINT) FROM $prevLab)
         |    AS n_comp_before,
         |  (SELECT CAST(count(DISTINCT l) AS BIGINT) FROM lab$r)
         |    AS n_comp_after,
         |  (SELECT CAST(count(*) AS BIGINT) FROM forest$r) AS n_forest_edges,
         |  (SELECT CAST(coalesce(sum(-w), 0) AS BIGINT) FROM forest$r)
         |    AS forest_affinity""".stripMargin
    }.mkString("\nUNION ALL\n")
    QueryDef(
      "q284_boruvka",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0b AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2, -CAST(count(*) AS BIGINT) AS w
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |lab0 AS MATERIALIZED (
         |  SELECT node, node AS l FROM (
         |    SELECT DISTINCT a AS node FROM e0b
         |    UNION SELECT DISTINCT b2 FROM e0b)),
         |${(1 to R).map(roundSql).mkString(",\n")}
         |$report
         |ORDER BY round""".stripMargin) { (s, dir) =>
      // shared memoized weighted co-purchase frame (same pair counts
      // as the oracle's basket self-join; the array expansion build
      // shuffles only the basket distinct + the pair count)
      val e = coPurchaseEdgesW(s, dir, MIN_PAIR)
        .select(col("a"), col("b2"), (-col("n")).as("w"))
      var lab = e.select(col("a").as("node"))
        .unionByName(e.select(col("b2").as("node")))
        .distinct()
        .select(col("node"), col("node").as("l"))
        .ckpt()
      var forest: DataFrame = null
      var nBefore = lab.select(col("l")).distinct().count()
      val rows = (1 to R).map { r =>
        val el = e
          .join(lab.select(col("node").as("a"), col("l").as("c")), Seq("a"))
          .join(lab.select(col("node").as("b2"), col("l").as("oc")), Seq("b2"))
          .filter(col("c") =!= col("oc"))
        val es = el.select(col("c"), col("oc"), col("w"), col("a"), col("b2"))
          .unionByName(el.select(col("oc").as("c"), col("c").as("oc"),
            col("w"), col("a"), col("b2")))
        // per-component argmin: the oracle's staged w1→w2→pick→po min
        // chain (min w; then min a given w; then min b2; then min oc)
        // IS the lexicographic minimum of (w, a, b2, oc) — one
        // partial-aggregable struct-min instead of four join+agg
        // passes over a checkpointed es (r7 paid 2 ckpts + 3 joins
        // per round here; the fused agg needs es only once, so es
        // stays lazy and only po materializes)
        val po = es.groupBy(col("c"))
          .agg(min(struct(col("w"), col("a"), col("b2"), col("oc"))).as("m"))
          .select(col("c"), col("m.w").as("w"), col("m.a").as("a"),
            col("m.b2").as("b2"), col("m.oc").as("oc"))
          .ckpt()
        val picked = po.select(col("a"), col("b2"), col("w")).distinct()
        forest = (if (forest == null) picked
          else forest.unionByName(picked).distinct()).ckpt()
        val cg = po.select(col("c"), col("oc"))
          .unionByName(po.select(col("oc").as("c"), col("c").as("oc")))
        // contraction = connected components of the COMPONENT graph:
        // the oracle's J=12 pointer jumps reach the same min-label
        // fixpoint (2^12 exceeds any possible chain length at gate
        // scale, where components < 4096 — so jump-limit ≡ fixpoint),
        // while Spark rides the shared dual-path CC operator (gated
        // driver union-find / distributed min-label above). Components
        // untouched by any pick keep their own label via the left
        // join.
        val merged = ConnectedComponents.compute(s,
            cg.select(col("c").as("a"), col("oc").as("b")))
          .select(col("component").as("l2"), col("node").as("c"))
        // cl is consumed exactly once (the lab relabel) and lab's own
        // checkpoint cuts the lineage right after — no cl ckpt needed
        val cl = lab.select(col("l").as("c")).distinct()
          .join(merged, Seq("c"), "left")
          .select(col("c"), coalesce(col("l2"), col("c")).as("l"))
        lab = lab.select(col("node"), col("l").as("c"))
          .join(cl, Seq("c"))
          .select(col("node"), col("l"))
          .ckpt()
        val nAfter = lab.select(col("l")).distinct().count()
        // one action for both forest stats; nAfter feeds the next
        // round's nBefore (was a second distinct-count per round)
        val fstat = forest
          .agg(count(lit(1)).as("n"), coalesce(sum(-col("w")), lit(0L)).as("wt"))
          .head()
        val row = (r.toLong, nBefore, nAfter, fstat.getLong(0), fstat.getLong(1))
        nBefore = nAfter
        row
      }
      import s.implicits._
      rows.toDF("round", "n_comp_before", "n_comp_after", "n_forest_edges",
          "forest_affinity")
        .orderBy("round")
    }
  }

  /** q302 — BFS reachability profile: hop-distance histogram from the
    * smallest co-purchase node over 5 synchronous frontier rounds —
    * "how small is the world around a product", the
    * neighborhood-growth curve that sizes graph-sampling fan-outs and
    * detects fragmented catalogs (a flat curve = disconnected
    * islands; q37/q275 count components, this measures their RADIUS).
    * Unweighted sibling of q242's Bellman–Ford (hops, not cents).
    *
    * Exactness: hop counts are associative integer mins over exact
    * rounds — identical under any execution order; the seed is the
    * deterministic min node id.
    *
    * Scale design (100 TB): rides the MEMOIZED checkpointed
    * co-purchase edge list (shared with q150/q155/q238/q275); each
    * round BROADCASTS the ≤|V|-row frontier into the static edge
    * list (edges never shuffle) and checkpoints (the frontier is
    * consumed twice per round — join + union — an unbroken lineage
    * would re-execute 2^R times). Output is ≤ R+1 rows. */
  val q302BfsHops: QueryDef = {
    val MIN_PAIR = 2
    val HOPS = 5
    val rounds = (1 to HOPS).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, min(hop) AS hop FROM (
         |    SELECT ed.dst AS node, d.hop + 1 AS hop
         |    FROM ed JOIN d${r - 1} d ON ed.src = d.node
         |    UNION ALL SELECT node, hop FROM d${r - 1})
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    QueryDef(
      "q302_bfs_hops",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |ed AS MATERIALIZED (
         |  SELECT a AS src, b2 AS dst FROM e0 UNION ALL SELECT b2, a FROM e0),
         |d0 AS (SELECT min(a) AS node, CAST(0 AS BIGINT) AS hop FROM e0),
         |$rounds
         |SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM d$HOPS GROUP BY hop ORDER BY hop""".stripMargin) { (s, dir) =>
      val e0 = coPurchaseEdges(s, dir, MIN_PAIR)
      val ed = e0.select(col("a").as("src"), col("b2").as("dst"))
        .unionByName(e0.select(col("b2").as("src"), col("a").as("dst")))
        .ckpt()
      var d = e0.agg(min(col("a")).as("node"))
        .select(col("node"), lit(0L).as("hop"))
      for (_ <- 1 to HOPS) {
        d = broadcast(d).join(ed, col("node") === col("src"))
          .select(col("dst").as("node"), (col("hop") + 1).as("hop"))
          .unionByName(d.select(col("node"), col("hop")))
          .groupBy(col("node")).agg(min(col("hop")).as("hop"))
          .ckpt()
      }
      d.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes")).orderBy("hop")
    }
  }

  /** Shared DuckDB CTE prefix for the co-purchase graph at
    * minPair = 2: canonical undirected edges `e0(a, b2)` and the
    * directed doubling `ed(src, dst)` — the oracle twin of
    * [[coPurchaseEdges]]. */
  private def edgeCte(minPair: Int): String =
    s"""b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT f1.p AS a, f2.p AS b2
       |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
       |  GROUP BY 1, 2 HAVING count(*) >= $minPair),
       |ed AS MATERIALIZED (
       |  SELECT a AS src, b2 AS dst FROM e0 UNION ALL SELECT b2, a FROM e0)""".stripMargin

  /** q323 — degree assortativity of the co-purchase graph: the
    * Pearson correlation of endpoint degrees over all directed edges
    * (Newman 2002) — positive means hubs buy with hubs (a
    * core-periphery catalog), negative means hubs bridge long-tail
    * parts (the typical retail shape); the sign decides whether
    * q275's hub-removal robustness audit is even the right threat
    * model, and predicts how badly q79-style join skew concentrates.
    *
    * Exactness: degrees are exact integers; all five moments ride
    * DECIMAL(38)/HUGEINT; r is ONE mirrored IEEE chain over their
    * DOUBLE casts, floored to milli (floor is sign-portable).
    *
    * Scale design (100 TB): rides the MEMOIZED checkpointed edge
    * list; the degree table is one partial-aggregable collapse,
    * joined back equi on each endpoint; moments collapse to 1 row.
    * No windows, no broadcast of anything data-sized. */
  val q323Assortativity: QueryDef = {
    val MIN_PAIR = 2
    val rMilli =
      "CAST(floor(1e3 * (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /" +
        " sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *" +
        " (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)" +
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)"
    QueryDef(
      "q323_assortativity",
      s"""WITH ${edgeCte(MIN_PAIR)},
         |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY src),
         |p AS (
         |  SELECT da.deg AS x, db.deg AS y
         |  FROM ed JOIN d da ON ed.src = da.src JOIN d db ON ed.dst = db.src),
         |m AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS m,
         |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM p)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_nodes,
         |  CAST(m // 2 AS BIGINT) AS n_edges,
         |  $rMilli AS r_milli
         |FROM m""".stripMargin) { (s, dir) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e0 = coPurchaseEdges(s, dir, MIN_PAIR)
      val ed = e0.select(col("a").as("src"), col("b2").as("dst"))
        .unionByName(e0.select(col("b2").as("src"), col("a").as("dst")))
      val d = ed.groupBy(col("src")).agg(count(lit(1)).as("deg")).ckpt()
      val p = ed
        .join(d.select(col("src"), col("deg").as("x")), Seq("src"))
        .join(d.select(col("src").as("dst"), col("deg").as("y")), Seq("dst"))
      val nn = d.agg(count(lit(1)).as("n_nodes"))
      p.agg(count(lit(1)).cast("decimal(38,0)").as("m"),
          sum(dec(col("x"))).cast("decimal(38,0)").as("sx"),
          sum(dec(col("y"))).cast("decimal(38,0)").as("sy"),
          sum(dec(col("x")) * col("x")).cast("decimal(38,0)").as("sxx"),
          sum(dec(col("y")) * col("y")).cast("decimal(38,0)").as("syy"),
          sum(dec(col("x")) * col("y")).cast("decimal(38,0)").as("sxy"))
        .crossJoin(broadcast(nn))
        .select(col("n_nodes"),
          expr("CAST(m div 2 AS BIGINT)").as("n_edges"),
          expr(rMilli).as("r_milli"))
    }
  }

  /** q324 — rich-club coefficient at three degree thresholds:
    * φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of nodes with
    * degree > k (Colizza et al. 2006) — "do the best-connected parts
    * preferentially co-occur with each other", the density view that
    * complements q323's correlation view (a graph can be
    * disassortative yet still have a dense rich club). Rising φ(k)
    * justifies caching hub–hub edges hot, and predicts q104's
    * triangle concentration.
    *
    * Exactness: degrees, memberships, and edge counts are exact
    * integers; φ is one cross-multiplied ppm floor-div on
    * non-negative counts; thresholds with fewer than 2 rich nodes
    * are excluded by predicate in both engines.
    *
    * Scale design (100 TB): degree collapse once (shared shape with
    * q323); per threshold the rich set is a filter of the degree
    * table and E_k is two semi-joins of the canonical edge list
    * against it — the edge list scans three times but never
    * shuffles wider than its keys. Output ≤ 3 rows. */
  val q324RichClub: QueryDef = {
    val MIN_PAIR = 2
    val KS = Seq(2, 3, 4)
    QueryDef(
      "q324_rich_club",
      s"""WITH ${edgeCte(MIN_PAIR)},
         |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY src),
         |ks AS (SELECT CAST(unnest([${KS.mkString(", ")}]) AS BIGINT) AS k),
         |rich AS (
         |  SELECT ks.k, d.src FROM ks JOIN d ON d.deg > ks.k),
         |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM rich GROUP BY k),
         |ek AS (
         |  SELECT r1.k, CAST(count(*) AS BIGINT) AS e_k
         |  FROM e0 JOIN rich r1 ON e0.a = r1.src
         |          JOIN rich r2 ON e0.b2 = r2.src AND r1.k = r2.k
         |  GROUP BY r1.k)
         |SELECT nk.k, nk.n_k, coalesce(ek.e_k, 0) AS e_k,
         |  (2000000 * coalesce(ek.e_k, 0)) // (nk.n_k * (nk.n_k - 1))
         |    AS phi_ppm
         |FROM nk LEFT JOIN ek ON nk.k = ek.k
         |WHERE nk.n_k >= 2 ORDER BY nk.k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e0 = coPurchaseEdges(s, dir, MIN_PAIR)
      val ed = e0.select(col("a").as("src"), col("b2").as("dst"))
        .unionByName(e0.select(col("b2").as("src"), col("a").as("dst")))
      val d = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val ks = KS.map(_.toLong).toDF("k")
      val rich = broadcast(ks).join(d, col("deg") > col("k"))
        .select(col("k"), col("src")).ckpt() // ≤3 joins read it
      val nk = rich.groupBy(col("k")).agg(count(lit(1)).as("n_k"))
      val ek = e0
        .join(rich.select(col("k"), col("src").as("a")), Seq("a"))
        .join(rich.select(col("k").as("k2"), col("src").as("rb")),
          col("b2") === col("rb") && col("k") === col("k2"))
        .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
      nk.join(ek.select(col("k").as("ek_k"), col("e_k")),
          col("k") === col("ek_k"), "left")
        .filter(col("n_k") >= 2)
        .select(col("k"), col("n_k"),
          coalesce(col("e_k"), lit(0L)).as("e_k"))
        .select(col("k"), col("n_k"), col("e_k"),
          expr("(2000000 * e_k) div (n_k * (n_k - 1))").as("phi_ppm"))
        .orderBy("k")
    }
  }

  /** q325 — hash-partition quality of the co-purchase graph at the
    * session's parallelism (P = 32): the fraction of edges whose
    * endpoints land in different `pmod(node, P)` partitions (the
    * communication volume of every Pregel superstep in this repo —
    * q65/q239/q241/q242 all pay it), plus the node-balance skew of
    * the partitioning. Near-(1−1/P) cut means hash placement is as
    * bad as random and a locality-aware repartition (METIS-style or
    * q93's z-order on community id) would pay; balance skew prices
    * the straggler risk.
    *
    * Exactness: partition ids, cut flags, and balance counts are
    * exact integers; ratios are cross-multiplied ppm floor-divs.
    *
    * Scale design (100 TB): one projection over the memoized edge
    * list computes cut flags (no join at all — both endpoint mods
    * are per-row expressions); the balance side is one degree-table
    * collapse to P rows. Output 1 row. */
  val q325PartitionQuality: QueryDef = {
    val MIN_PAIR = 2
    val P = 32
    QueryDef(
      "q325_partition_quality",
      s"""WITH ${edgeCte(MIN_PAIR)},
         |cut AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |    CAST(sum(CASE WHEN a % $P <> b2 % $P THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cut_edges
         |  FROM e0),
         |nodes AS (SELECT DISTINCT src FROM ed),
         |parts AS (
         |  SELECT src % $P AS pid, CAST(count(*) AS BIGINT) AS n
         |  FROM nodes GROUP BY 1),
         |bal AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
         |    CAST(max(n) AS BIGINT) AS max_nodes,
         |    CAST(sum(n) AS BIGINT) AS n_nodes
         |  FROM parts)
         |SELECT c.n_edges, c.cut_edges,
         |  (1000000 * c.cut_edges) // c.n_edges AS cut_ppm,
         |  b.n_nodes, b.max_nodes,
         |  (1000000 * b.max_nodes * b.n_parts) // b.n_nodes AS skew_ppm
         |FROM cut c, bal b""".stripMargin) { (s, dir) =>
      val e0 = coPurchaseEdges(s, dir, MIN_PAIR)
      val cut = e0.agg(count(lit(1)).as("n_edges"),
        sum(when(expr(s"a % $P") =!= expr(s"b2 % $P"), 1L).otherwise(0L))
          .as("cut_edges"))
      val nodes = e0.select(col("a").as("src"))
        .unionByName(e0.select(col("b2").as("src"))).distinct()
      val bal = nodes.select(expr(s"src % $P").as("pid"))
        .groupBy(col("pid")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_parts"), max(col("n")).as("max_nodes"),
          sum(col("n")).as("n_nodes"))
      cut.crossJoin(broadcast(bal))
        .select(col("n_edges"), col("cut_edges"),
          expr("(1000000 * cut_edges) div n_edges").as("cut_ppm"),
          col("n_nodes"), col("max_nodes"),
          expr("(1000000 * max_nodes * n_parts) div n_nodes").as("skew_ppm"))
    }
  }

  /** q346 — clustering spectrum C(k): the mean local clustering
    * coefficient of co-purchase nodes at each degree, cc(v) =
    * 2·T(v)/(deg(v)·(deg(v)−1)) — the curve whose ~k⁻¹ decay is the
    * standard hierarchical-modularity signature (Ravasz–Barabási
    * 2003); flat-and-low means the graph is locally tree-like and
    * q104's global triangle count came from a few dense pockets.
    * Together with q323 (assortativity) and q324 (rich club) this
    * completes the three classic structure curves over the SAME
    * memoized edge list.
    *
    * Exactness: per-node triangle counts come from the q104
    * lexicographic enumeration (each triangle credited to its three
    * corners exactly once); cc is floored to ppm PER NODE (integer
    * cross-multiplied), then averaged as an integer floor-div per
    * degree bucket.
    *
    * Scale design (100 TB): rides the MEMOIZED checkpointed edge
    * list; the wedge join + closing join are the q104 equi-join
    * shapes; the per-node credit explode is 3 rows per triangle;
    * degrees collapse partial-aggregably. Output ≤ max-degree
    * rows. */
  val q346ClusteringSpectrum: QueryDef = {
    val MIN_PAIR = 2
    QueryDef(
      "q346_clustering_spectrum",
      s"""WITH ${edgeCte(MIN_PAIR)},
         |tri AS (
         |  SELECT e1.a AS x, e1.b2 AS y, e2.b2 AS z
         |  FROM e0 e1 JOIN e0 e2 ON e1.b2 = e2.a
         |  JOIN e0 e3 ON e3.a = e1.a AND e3.b2 = e2.b2),
         |tn AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
         |    SELECT x AS node FROM tri
         |    UNION ALL SELECT y FROM tri
         |    UNION ALL SELECT z FROM tri)
         |  GROUP BY node),
         |d AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |      FROM ed GROUP BY src),
         |cc AS (
         |  SELECT d.node, d.deg,
         |    (2000000 * coalesce(tn.t, 0)) // (d.deg * (d.deg - 1)) AS cc_ppm
         |  FROM d LEFT JOIN tn ON d.node = tn.node
         |  WHERE d.deg >= 2)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(cc_ppm) AS BIGINT) // count(*) AS avg_cc_ppm
         |FROM cc GROUP BY deg ORDER BY deg""".stripMargin) { (s, dir) =>
      val e0 = coPurchaseEdges(s, dir, MIN_PAIR)
      val tri = e0.select(col("a").as("x"), col("b2").as("y"))
        .join(e0.select(col("a").as("y"), col("b2").as("z")), Seq("y"))
        .join(e0.select(col("a").as("x"), col("b2").as("z")), Seq("x", "z"))
      val tn = tri.select(col("x").as("node"))
        .unionByName(tri.select(col("y").as("node")))
        .unionByName(tri.select(col("z").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("t"))
      val ed = e0.select(col("a").as("node"))
        .unionByName(e0.select(col("b2").as("node")))
      val d = ed.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      d.filter(col("deg") >= 2)
        .join(tn, Seq("node"), "left")
        .select(col("deg"),
          expr("(2000000 * coalesce(t, 0)) div (deg * (deg - 1))")
            .as("cc_ppm"))
        .groupBy(col("deg"))
        .agg(count(lit(1)).as("n_nodes"),
          expr("CAST(sum(cc_ppm) AS BIGINT) div count(*)").as("avg_cc_ppm"))
        .orderBy("deg")
    }
  }

  /** q361 — densest-subgraph search by parallel greedy peeling
    * (Charikar '00 objective ρ = |E|/|V|; the Bahmani–Kumar–
    * Vassilvitskii '12 MapReduce variant at ε = 0): each round
    * removes EVERY node whose degree ≤ 2ρ (the average) — an integer
    * cross-multiplied test deg·|V| ≤ 2·|E| — so the peel runs in few
    * parallel rounds instead of Charikar's |V| sequential steps, at
    * the guaranteed 2-approximation of the optimum (ε = 0 trades the
    * formal O(log n) round bound for the tightest factor; the
    * 12-round cap is asserted sufficient by the driver replay). The
    * round with the highest surviving density IS the answer (and the
    * published proof point: the densest subgraph survives intact
    * until some round whose density is within the factor). q150
    * peels to a FIXED degree (k-core); this peels to a RELATIVE one —
    * the community-core extraction a recommender mines before q107's
    * association rules.
    *
    * Exactness: degrees, node/edge counts, and the peel test are pure
    * integers; density is reported as (1000·|E|) div |V| (NULL once
    * the graph is empty).
    *
    * Scale design (100 TB): the memoized co-purchase edge list is the
    * one fact-derived frame; every round is a degree aggregate + two
    * semi joins, checkpointed (the q150/q284 bounded-lineage
    * discipline); counts per round are driver loop-control scalars
    * (the q150 precedent). Output 13 rows. */
  val q361DensestSubgraph: QueryDef = {
    val R = 12
    val MIN_PAIR = 2
    val rounds = (1 to R).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT node FROM (
         |    SELECT a AS node FROM e${i - 1} UNION ALL SELECT b2 FROM e${i - 1})
         |  GROUP BY node
         |  HAVING count(*) * (SELECT count(*) FROM (
         |      SELECT DISTINCT a AS n FROM e${i - 1}
         |      UNION SELECT DISTINCT b2 FROM e${i - 1}))
         |    > 2 * (SELECT count(*) FROM e${i - 1})),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b2 FROM e${i - 1} e
         |  JOIN s$i x ON e.a = x.node JOIN s$i y ON e.b2 = y.node)"""
        .stripMargin
    }.mkString(",\n")
    val report = (0 to R).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (
         |     SELECT DISTINCT a AS n FROM e$i
         |     UNION SELECT DISTINCT b2 FROM e$i)) AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS n_edges"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    QueryDef(
      "q361_densest_subgraph",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         |           FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |$rounds,
         |rep AS ($report)
         |SELECT round, n_nodes, n_edges,
         |  CASE WHEN n_nodes > 0 THEN (1000 * n_edges) // n_nodes
         |       ELSE NULL END AS density_milli
         |FROM rep ORDER BY round""".stripMargin) { (s, dir) =>
      var edges = coPurchaseEdges(s, dir, MIN_PAIR)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var i = 0
      while (i <= R) {
        val deg = edges.select(col("a").as("node"))
          .unionByName(edges.select(col("b2").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        val v = deg.count()
        val e = edges.count()
        out += ((i.toLong, v, e))
        if (i < R) {
          // survivors: deg·|V| > 2·|E| (integer cross-multiplied)
          val surv = deg.filter(col("deg") * v > lit(2L) * e)
            .select(col("node"))
          edges = edges
            .join(surv.select(col("node").as("a")), Seq("a"), "left_semi")
            .join(surv.select(col("node").as("b2")), Seq("b2"), "left_semi")
            .select(col("a"), col("b2"))
            .ckpt()
        }
        i += 1
      }
      import s.implicits._
      out.toSeq.toDF("round", "n_nodes", "n_edges")
        .select(col("round"), col("n_nodes"), col("n_edges"),
          when(col("n_nodes") > 0,
            expr("(1000 * n_edges) div n_nodes")).as("density_milli"))
        .orderBy("round")
    }
  }

  /** q381 — k-truss peeling of the co-purchase graph (Cohen '08), at
    * k=3: the maximal subgraph where every surviving edge closes ≥ 1 triangle
    * WITH OTHER SURVIVORS — the triangle-reinforced community core
    * that k-core (q150, degree-based) overcounts: a hub with many
    * weak one-off neighbors survives a degree peel but not a truss
    * peel. Per round, edge support comes from the q104 oriented
    * triangle listing (a<b<c counted once, each supporting all three
    * edges) and under-supported edges drop; the per-round
    * (edges, triangles, survivors) trajectory is the output, and the
    * spec checks the fixpoint property on the final round.
    *
    * Exactness: pure integer set arithmetic end to end; the oracle
    * unrolls the identical R rounds as MATERIALIZED CTEs (the
    * q150/q284 loop ≡ unrolled contract).
    *
    * Scale design (100 TB): each round is the lexicographic triangle
    * join over the CURRENT (shrinking) edge set — all equi-joins over
    * the memoized, checkpointed edge frame; supports are
    * partial-aggregable; round counts are driver loop-report scalars
    * only. Fixed R keeps the plan finite; sf0.01 converges in 3. */
  val q381Ktruss: QueryDef = {
    val MIN_PAIR = 2
    val R = 5
    val K = 3 // 3-truss: every edge closes >= 1 surviving triangle
    val rounds = (1 to R).map { r =>
      val prev = if (r == 1) "e0" else s"e${r - 1}"
      s"""tri$r AS MATERIALIZED (
         |  SELECT e1.a, e1.b2 AS b, e2.b2 AS c
         |  FROM $prev e1 JOIN $prev e2 ON e2.a = e1.b2
         |  JOIN $prev e3 ON e3.a = e1.a AND e3.b2 = e2.b2),
         |sup$r AS (
         |  SELECT ea, eb, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT a AS ea, b AS eb FROM tri$r
         |    UNION ALL SELECT b, c FROM tri$r
         |    UNION ALL SELECT a, c FROM tri$r)
         |  GROUP BY 1, 2),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b2 FROM $prev e
         |  JOIN sup$r s ON s.ea = e.a AND s.eb = e.b2
         |  WHERE s.cnt >= ${K - 2})""".stripMargin
    }.mkString(",\n")
    val report = (1 to R).map { r =>
      val prev = if (r == 1) "e0" else s"e${r - 1}"
      s"SELECT CAST($r AS BIGINT) AS round, (SELECT CAST(count(*) AS BIGINT) FROM $prev) " +
        s"AS n_edges, (SELECT CAST(count(*) AS BIGINT) FROM tri$r) " +
        s"AS n_triangles, (SELECT CAST(count(*) AS BIGINT) FROM e$r) " +
        "AS n_survivors"
    }.mkString("\nUNION ALL ")
    QueryDef(
      "q381_ktruss",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |$rounds
         |SELECT * FROM ($report)
         |ORDER BY round""".stripMargin) { (s, dir) =>
      import s.implicits._
      var e = coPurchaseEdges(s, dir, MIN_PAIR)
      val rows = (1 to R).map { r =>
        val nE = e.count()
        val tri = e.as("e1")
          .join(e.select(col("a").as("ta"), col("b2").as("tb")),
            col("ta") === col("b2"))
          .select(col("a"), col("b2").as("b"), col("tb").as("c"))
          .join(e.select(col("a").as("xa"), col("b2").as("xc")),
            col("xa") === col("a") && col("xc") === col("c"), "leftsemi")
          .ckpt() // the oriented triangle list of this round
        val nT = tri.count()
        val sup = tri.select(col("a").as("ea"), col("b").as("eb"))
          .unionByName(tri.select(col("b").as("ea"), col("c").as("eb")))
          .unionByName(tri.select(col("a").as("ea"), col("c").as("eb")))
          .groupBy("ea", "eb").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= K - 2)
        e = e.join(sup.select(col("ea").as("a"), col("eb").as("b2")),
          Seq("a", "b2"), "leftsemi").ckpt()
        (r.toLong, nE, nT, e.count())
      }
      rows.toDF("round", "n_edges", "n_triangles", "n_survivors")
        .orderBy("round")
    }
  }

  /** q448 — HyperANF neighborhood function (Boldi–Rosa–Vigna '11):
    * the number of reachable pairs within distance t for t = 0..3 on
    * the co-purchase graph, via per-node HyperLogLog counters
    * advanced by t rounds of neighbor-register merges. q302 runs ONE
    * exact BFS from one source; HyperANF estimates ALL sources at
    * once — THE practical big-graph distance-distribution/effective-
    * diameter algorithm (exact all-pairs is O(V·E) and dead at any
    * scale; register merges are one equi join per round).
    *
    * Exactness: registers are the q369 HLL layout (md5 60-bit hash,
    * m=64, rank ≤ 55) — deterministic by construction; merges are
    * max-aggregates; each node's estimate is the q369 correction
    * chain floored to an int BEFORE the global sum (floor-before-sum
    * — raw double sums are partition-order-dependent); both engines
    * run identical text.
    *
    * Scale design (100 TB): state is (node, bucket, maxrank) — ≤64
    * rows per node; each round is one edge-keyed equi join + one
    * max-aggregate (map-side combinable), checkpointed per round
    * (the q150/q302 iterative contract, MATERIALIZED in the oracle
    * against DuckDB's CTE re-expansion). Round count is literal.
    * Output 4 rows. */
  val q448Hyperanf: QueryDef = {
    val MIN_PAIR = 2
    val T = 3
    val ALPHA = 0.709 // α for m = 64 (Flajolet '07 Table 1 regime)
    val estD = s"($ALPHA" + "e0 * 64.0e0 * 64.0e0 * 36028797018963968.0e0)" +
      " / CAST(num AS DOUBLE)"
    val corrD = s"CASE WHEN ($estD) <= 160.0e0 AND v > 0 " +
      s"THEN 64.0e0 * ln(64.0e0 / CAST(v AS DOUBLE)) ELSE ($estD) END"
    val rounds = (1 to T).map { t =>
      s"""r$t AS MATERIALIZED (
         |  SELECT node, bucket, max(m) AS m FROM (
         |    SELECT ed.src AS node, r.bucket, r.m
         |    FROM ed JOIN r${t - 1} r ON r.node = ed.dst
         |    UNION ALL SELECT node, bucket, m FROM r${t - 1})
         |  GROUP BY node, bucket)""".stripMargin
    }.mkString(",\n")
    val estRounds = (0 to T).map { t =>
      s"""est$t AS (
         |  SELECT CAST($t AS BIGINT) AS t,
         |    CAST(sum(ball) AS BIGINT) AS n_pairs_est FROM (
         |    SELECT CAST(floor($corrD) AS BIGINT) AS ball FROM (
         |      SELECT node,
         |        CAST(sum(1::BIGINT << (55 - m)) +
         |          (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS num,
         |        CAST(64 - count(*) AS BIGINT) AS v
         |      FROM r$t GROUP BY node)))""".stripMargin
    }.mkString(",\n")
    QueryDef(
      "q448_hyperanf",
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT f1.p AS a, f2.p AS b2
         |  FROM b f1 JOIN b f2 ON f1.o = f2.o AND f1.p < f2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_PAIR),
         |ed AS MATERIALIZED (
         |  SELECT a AS src, b2 AS dst FROM e0 UNION ALL SELECT b2, a FROM e0),
         |nodes AS (SELECT DISTINCT src AS node FROM ed),
         |r0 AS MATERIALIZED (
         |  SELECT node, h // 18014398509481984 AS bucket,
         |    CASE WHEN h % 18014398509481984 = 0 THEN 55
         |         ELSE 55 - length(bin(h % 18014398509481984)) END AS m
         |  FROM (SELECT node,
         |    ('0x' || substring(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS h
         |    FROM nodes)),
         |$rounds,
         |$estRounds
         |SELECT * FROM (
         |  ${(0 to T).map(t => s"SELECT t, n_pairs_est FROM est$t")
             .mkString("\n  UNION ALL ")}
         |) ORDER BY t""".stripMargin) { (s, dir) =>
      val e0 = coPurchaseEdges(s, dir, MIN_PAIR)
      val ed = e0.select(col("a").as("src"), col("b2").as("dst"))
        .unionByName(e0.select(col("b2").as("src"), col("a").as("dst")))
        .ckpt() // both directions feed every round's merge
      var r = ed.select(col("src").as("node")).distinct()
        .select(col("node"),
          conv(substring(md5(col("node").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .select(col("node"), expr("h div 18014398509481984").as("bucket"),
          when(col("h") % 18014398509481984L === 0, lit(55))
            .otherwise(lit(55) -
              length(bin(col("h") % 18014398509481984L))).as("m"))
        .ckpt()
      def estOf(regs: DataFrame, t: Int): DataFrame =
        regs.groupBy(col("node"))
          .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")) +
            (lit(64) - count(lit(1))) * lit(36028797018963968L))
            .cast("bigint").as("num"),
            (lit(64) - count(lit(1))).cast("bigint").as("v"))
          .select(expr(s"CAST(floor($corrD) AS BIGINT)").as("ball"))
          .agg(sum(col("ball")).cast("bigint").as("n_pairs_est"))
          .select(lit(t.toLong).as("t"), col("n_pairs_est"))
      val ests = collection.mutable.ArrayBuffer(estOf(r, 0))
      for (t <- 1 to T) {
        r = ed.join(r.withColumnRenamed("node", "dst"), Seq("dst"))
          .select(col("src").as("node"), col("bucket"), col("m"))
          .unionByName(r.select(col("node"), col("bucket"), col("m")))
          .groupBy(col("node"), col("bucket")).agg(max(col("m")).as("m"))
          .ckpt() // per-round register state (the q302 contract)
        ests += estOf(r, t)
      }
      ests.reduce(_ unionAll _).orderBy("t")
    }
  }

  val all: Seq[QueryDef] =
    Seq(q104Triangles, q132BomExplosion, q150KcorePeel, q155LinkPredict,
      q260WlRefinement, q275HubRobustness, q284Boruvka, q302BfsHops,
      q323Assortativity, q324RichClub, q325PartitionQuality,
      q346ClusteringSpectrum, q361DensestSubgraph, q381Ktruss,
      q448Hyperanf)
}
