package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an (a, b) long-keyed edge list.
  *
  * Two execution paths, picked by edge count:
  *
  *  - `driverUnionFind` — near-dup edge lists are orders of magnitude
  *    smaller than the corpus (LSH + verification already pruned
  *    them); tens of millions of edges fit driver-side, where
  *    union-find closes the graph in one pass with zero extra Spark
  *    jobs. This is the default path and what any production graph
  *    library does for post-pruning component closure.
  *  - `distributed` — past the threshold, Pregel-style min-label
  *    propagation with pointer jumping (label(v) ← label(label(v))):
  *    one join+aggregate round per O(log diameter) step, driver sees
  *    only a convergence boolean, localCheckpoint truncates lineage.
  *
  * Both return (node, component) with component = min node id of the
  * component — identical output, property-tested against each other.
  */
object ConnectedComponents {

  val DefaultDriverLimit = 5000000L

  /** DuckDB oracle twin: recursive reachability closure over a CTE
    * named `edges` (columns a, b), yielding `comp(node, component)`
    * with component = min reachable node — the exact contract of
    * [[compute]]. Splice into a `WITH RECURSIVE` list after `edges`. */
  val oracleCte: String =
    """nodes AS (SELECT DISTINCT x AS node FROM (SELECT a AS x FROM edges UNION SELECT b FROM edges)),
      |undirected AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach(src, dst) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT r.src, u.b FROM reach r JOIN undirected u ON r.dst = u.a),
      |comp AS (SELECT src AS node, min(dst) AS component FROM reach GROUP BY src)""".stripMargin

  def compute(spark: SparkSession, edges: DataFrame,
      driverLimit: Long = DefaultDriverLimit): DataFrame = {
    val cached = edges.select(col("a").cast("long"), col("b").cast("long")).ckpt()
    computeCkpt(spark, cached, cached.count(), driverLimit)
  }

  /** Variant for callers that already hold a materialized (a, b)
    * long-keyed frame AND its row count (e.g. a loop that needs the
    * edge count for its own report row): skips the extra checkpoint +
    * count pass [[compute]] would pay. Same dual-path dispatch. */
  def computeCkpt(spark: SparkSession, cachedEdges: DataFrame, nEdges: Long,
      driverLimit: Long = DefaultDriverLimit): DataFrame =
    if (nEdges <= driverLimit) driverUnionFind(spark, cachedEdges)
    else distributed(cachedEdges)

  /** Path-compressed, size-united union-find over collected edges. */
  def driverUnionFind(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // union by min id keeps component = min node with no extra pass
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "component")
  }

  /** Distributed min-label propagation with pointer jumping. */
  def distributed(edges: DataFrame): DataFrame = {
    val undirected = edges
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .ckpt()
    var labels = undirected.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
      .ckpt()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val neighborMin = undirected
        .join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min(col("component")).as("ncomp"))
      val stepped = labels
        .join(neighborMin, col("node") === col("a"), "left")
        .select(col("node"), col("component").as("old"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("c1"))
      val jump = labels.select(col("node").as("jn"), col("component").as("jc"))
      val next = stepped
        .join(jump, col("c1") === col("jn"), "left")
        .select(col("node"), col("old"),
          least(col("c1"), coalesce(col("jc"), col("c1"))).as("component"))
        .ckpt()
      converged = next.filter(col("component") < col("old")).isEmpty
      labels = next.select(col("node"), col("component"))
      rounds += 1
    }
    labels
  }
}
