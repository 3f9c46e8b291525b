package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed "training" operators over the embedding corpus — the
  * model-fitting half of a data pipeline (cluster for semantic dedup /
  * IVF index builds, nearest-centroid classification for quality
  * routing). Complements [[Similarity]] (which consumes fixed
  * centroids) by actually FITTING them with Lloyd iterations.
  *
  * Exactness across engines (the q65 PageRank discipline): embeddings
  * are floor-quantized to integer micro-units once
  * (`floor(v*1e6)` as BIGINT), and every distance, centroid mean
  * (truncating integer division — Spark `div` ≡ DuckDB `//`), and
  * inertia sum is integer arithmetic — order-independent, so the
  * result is identical under any partitioning and bit-exact against
  * the DuckDB oracle. A floating-point Lloyd's would drift between
  * engines (FP sums reorder under parallelism) and between cluster
  * sizes.
  *
  * Scale design: the points frame explodes to (vec_id, pos, q) rows —
  * the layout a 100 TB corpus would already be columnar in — and is
  * localCheckpointed ONCE (every iteration re-reads it without
  * re-deriving). Centroids are k·dim rows (tiny at any corpus size) —
  * BROADCAST into the assignment join, so points are never shuffled
  * for assignment; the only exchanges are the partial-aggregable
  * (vec_id, cid) distance sum and the (cid, pos) centroid update,
  * both map-side combinable. Iteration count is a fixed constant
  * (finite plan; convergence polling would put a collect in the loop).
  */
object Learn {

  /** Integer micro-unit scale for quantized embedding coordinates. */
  private val SCALE = 1000000L
  private val DIM = VectorOps.DIM
  private val K = 4 // q95 cluster count
  private val ITERS = 2 // q95 Lloyd iterations

  // ---------------------------------------------------------------- shared

  /** Quantized long coordinates: (vec_id, pos ∈ 1..DIM, q). */
  private[graft] def points(emb: DataFrame): DataFrame =
    emb.repartition(col("vec_id")) // single-file scan -> use every core
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p0", "v")))
      .select(col("vec_id"), (col("p0") + 1).as("pos"),
        floor(col("v").cast("double") * SCALE).cast("long").as("q"))

  private[graft] val ptsCte: String =
    s"""pts AS (
       |  SELECT vec_id, i AS pos,
       |    CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * $SCALE) AS BIGINT) AS q
       |  FROM embeddings, unnest(range(1, ${DIM + 1})) AS t(i))""".stripMargin

  /** Squared-distance assignment of each point to its nearest centroid
    * (tie → smaller centroid id). `cent` is (cid, pos, c) — broadcast:
    * the corpus side never shuffles for the join. Returns
    * (vec_id, cid, dist). */
  private[graft] def assign(pts: DataFrame, cent: DataFrame): DataFrame = {
    val d = pts.join(broadcast(cent), Seq("pos"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("dist"))
  }

  /** Oracle twin of [[assign]]: dN/aN CTE pair over `centCte`. */
  private[graft] def assignSql(n: Int, from: String, cent: String): String =
    s"""d$n AS (
       |  SELECT p.vec_id, c.cid,
       |    CAST(sum((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist
       |  FROM $from p JOIN $cent c ON p.pos = c.pos
       |  GROUP BY 1, 2),
       |a$n AS (
       |  SELECT vec_id, cid, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d$n) WHERE rn = 1)""".stripMargin

  /** Centroid update: per-(cid, pos) truncating-integer mean of member
    * coordinates. Empty clusters simply vanish (deterministic in both
    * engines). */
  private[graft] def update(asg: DataFrame, pts: DataFrame): DataFrame =
    asg.select(col("vec_id"), col("cid")).join(pts, Seq("vec_id"))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("sum(q) div count(1)").as("c"))

  private def updateSql(n: Int): String =
    s"""c$n AS (
       |  SELECT a.cid, p.pos, CAST(sum(p.q) // count(*) AS BIGINT) AS c
       |  FROM a$n a JOIN pts p USING (vec_id)
       |  GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q95

  /** q95: integer-exact k-means (k=$K, $ITERS Lloyd iterations) over
    * the embeddings; init = the k smallest vec_ids' quantized vectors.
    * Per cluster: member count, integer inertia, centroid checksum. */
  val q95Kmeans: QueryDef = {
    val steps = (1 to ITERS).map { t =>
      val cent = if (t == 1) "c0" else s"c${t - 1}"
      s"${assignSql(t, "pts", cent)},\n${updateSql(t)}"
    }.mkString(",\n")
    val oracle =
      s"""WITH $ptsCte,
         |c0 AS (SELECT vec_id AS cid, pos, q AS c FROM pts WHERE vec_id < $K),
         |$steps
         |SELECT a.cid, CAST(count(*) AS BIGINT) AS n_points,
         |  CAST(sum(a.dist) AS BIGINT) AS inertia, cs.centroid_sum
         |FROM a$ITERS a JOIN (
         |  SELECT cid, CAST(sum(c) AS BIGINT) AS centroid_sum
         |  FROM c$ITERS GROUP BY cid) cs USING (cid)
         |GROUP BY a.cid, cs.centroid_sum
         |ORDER BY a.cid""".stripMargin
    QueryDef("q95_kmeans", oracle) { (s, dir) =>
      // materialize ONCE: every assign/update round re-reads these rows
      val pts = points(Tables.embeddings(s, dir)).localCheckpoint()
      var cent = pts.filter(col("vec_id") < K)
        .select(col("vec_id").as("cid"), col("pos"), col("q").as("c"))
      var asg: DataFrame = null
      for (_ <- 1 to ITERS) {
        // tiny frames (k·dim and N rows) — checkpoint to truncate the
        // per-round lineage, the q37/q65/q94 iterative pattern
        asg = assign(pts, cent).localCheckpoint()
        cent = update(asg, pts).localCheckpoint()
      }
      asg.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_points"), sum(col("dist")).as("inertia"))
        .join(cent.groupBy(col("cid")).agg(sum(col("c")).as("centroid_sum")), Seq("cid"))
        .select(col("cid"), col("n_points"), col("inertia"), col("centroid_sum"))
        .orderBy(col("cid"))
    }
  }

  // ---------------------------------------------------------------- q96

  /** q96: nearest-centroid (Rocchio) classification — fit per-label
    * integer centroids on the even-vec_id half, classify the odd half
    * by nearest centroid, emit the confusion matrix. Train and apply
    * are both pure relational passes: the fitted model is k·dim rows,
    * broadcast into the scoring join exactly like a saved model would
    * be at 100 TB. */
  val q96CentroidClassify: QueryDef = {
    val oracle =
      s"""WITH $ptsCte,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |ctrain AS (
         |  SELECT l.label AS cid, p.pos, CAST(sum(p.q) // count(*) AS BIGINT) AS c
         |  FROM pts p JOIN lab l USING (vec_id)
         |  WHERE p.vec_id % 2 = 0
         |  GROUP BY 1, 2),
         |test AS (SELECT * FROM pts WHERE vec_id % 2 = 1),
         |${assignSql(1, "test", "ctrain")}
         |SELECT l.label, a.cid AS pred, CAST(count(*) AS BIGINT) AS n
         |FROM a1 a JOIN lab l USING (vec_id)
         |GROUP BY 1, 2
         |ORDER BY l.label, pred""".stripMargin
    QueryDef("q96_centroid_classify", oracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val pts = points(emb).localCheckpoint()
      val lab = emb.select(col("vec_id"), col("label"))
      val ctrain = pts.filter(col("vec_id") % 2 === 0)
        .join(lab, Seq("vec_id"))
        .groupBy(col("label").as("cid"), col("pos"))
        .agg(expr("sum(q) div count(1)").as("c"))
      assign(pts.filter(col("vec_id") % 2 === 1), ctrain)
        .join(lab, Seq("vec_id"))
        .groupBy(col("label"), col("cid").as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("pred"))
    }
  }

  /** q159 — cluster-purity audit: q95's k-means assignment scored
    * against the embeddings' ground-truth labels. Per cluster: size,
    * number of distinct labels present, the majority label (ties →
    * smaller label) and its share in ppm — the "did unsupervised
    * blocking recover the real classes?" check run before trusting a
    * clustering as a dedup/sampling key (the q100 SemDeDup premise).
    *
    * Integer-exact end to end: the assignment is q95's integer Lloyd
    * chain, counts are int64, purity is a non-negative ppm floor-div.
    *
    * Scale design (100 TB): attaching labels is a fact-sized equi-join
    * on vec_id; everything after is over the (cluster × label) count
    * table — K·|labels| rows, so the majority-pick window runs on a
    * bounded aggregate frame (the documented exception to the
    * no-bounded-key-window rule), never on fact rows. */
  val q159ClusterPurity: QueryDef = {
    val steps = (1 to ITERS).map { t =>
      val cent = if (t == 1) "c0" else s"c${t - 1}"
      s"${assignSql(t, "pts", cent)},\n${updateSql(t)}"
    }.mkString(",\n")
    val oracle =
      s"""WITH $ptsCte,
         |c0 AS (SELECT vec_id AS cid, pos, q AS c FROM pts WHERE vec_id < $K),
         |$steps,
         |lab AS (
         |  SELECT a.cid, e.label, CAST(count(*) AS BIGINT) AS cnt
         |  FROM a$ITERS a JOIN embeddings e USING (vec_id)
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT cid, label AS top_label, cnt AS top_n FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, label) AS rn
         |    FROM lab) WHERE rn = 1),
         |tot AS (
         |  SELECT cid, CAST(sum(cnt) AS BIGINT) AS n_points,
         |    CAST(count(*) AS BIGINT) AS n_labels
         |  FROM lab GROUP BY cid)
         |SELECT t.cid, tot.n_points, tot.n_labels, t.top_label, t.top_n,
         |  (1000000 * t.top_n) // tot.n_points AS purity_ppm
         |FROM top t JOIN tot USING (cid) ORDER BY t.cid""".stripMargin
    QueryDef("q159_cluster_purity", oracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val pts = points(emb).localCheckpoint()
      var cent = pts.filter(col("vec_id") < K)
        .select(col("vec_id").as("cid"), col("pos"), col("q").as("c"))
      var asg: DataFrame = null
      for (_ <- 1 to ITERS) {
        asg = assign(pts, cent).localCheckpoint()
        cent = update(asg, pts).localCheckpoint()
      }
      val lab = asg.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
        .groupBy(col("cid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("cid")).orderBy(col("cnt").desc, col("label"))
      val top = lab.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("cid"), col("label").as("top_label"), col("cnt").as("top_n"))
      val tot = lab.groupBy(col("cid"))
        .agg(sum(col("cnt")).as("n_points"), count(lit(1)).as("n_labels"))
      top.join(tot, Seq("cid"))
        .select(col("cid"), col("n_points"), col("n_labels"),
          col("top_label"), col("top_n"),
          expr("(1000000 * top_n) div n_points").as("purity_ppm"))
        .orderBy(col("cid"))
    }
  }

  val all: Seq[QueryDef] = Seq(q95Kmeans, q96CentroidClassify, q159ClusterPurity)
}
