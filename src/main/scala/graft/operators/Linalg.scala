package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational sparse linear algebra — SpMM as join + aggregate, the
  * way a Spark engine multiplies a (docs × terms) matrix by a dense
  * factor without ever building a matrix: topic scoring, feature
  * projection, and graph propagation all reduce to this kernel.
  *
  * Scale design: the sparse side stays (doc, term, tf) triples and
  * shuffles ONCE on term to meet the factor matrix; the factor is
  * vocabulary × topics and broadcast; the product aggregate
  * (doc, topic) combines map-side. The factor weights are md5-derived
  * integers so both engines rebuild the identical matrix and every
  * score is exact int64. */
object Linalg {

  private val TOPICS = 8

  val q122Spmm: QueryDef = QueryDef(
    "q122_spmm",
    s"""WITH tf AS (
       |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id, tok),
       |w AS (
       |  SELECT tok, t,
       |    ('0x' || substring(md5('tw' || CAST(t AS VARCHAR) || ':' || tok), 1, 1))::INT % 10 AS wt
       |  FROM (SELECT DISTINCT tok FROM tf), unnest(range(0, $TOPICS)) AS u(t)),
       |score AS (
       |  SELECT tf.doc_id, w.t AS topic, CAST(sum(tf.tf * w.wt) AS BIGINT) AS score
       |  FROM tf JOIN w ON tf.tok = w.tok GROUP BY 1, 2),
       |top AS (
       |  SELECT doc_id, topic, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, topic) AS rn
       |  FROM score)
       |SELECT CAST(topic AS BIGINT) AS topic,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(score) AS BIGINT) AS total_score
       |FROM top WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val tf = Tables.documents(s, dir)
      .repartition(col("doc_id")) // single-file scan -> use every core
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val w = tf.select(col("tok")).distinct()
      .crossJoin(spark_range(s, TOPICS))
      .select(col("tok"), col("t"),
        (conv(substring(md5(concat(lit("tw"), col("t").cast("string"),
          lit(":"), col("tok"))), 1, 1), 16, 10).cast("int") % 10).as("wt"))
    val score = tf.join(broadcast(w), Seq("tok"))
      .groupBy(col("doc_id"), col("t").as("topic"))
      .agg(sum(col("tf") * col("wt")).as("score"))
    val rn = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("topic"))
    score.withColumn("rn", row_number().over(rn))
      .filter(col("rn") === 1)
      .groupBy(col("topic").cast("bigint").as("topic"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("total_score"))
      .orderBy("topic")
  }

  private def spark_range(s: org.apache.spark.sql.SparkSession, n: Int) =
    s.range(n).select(col("id").cast("int").as("t"))

  /** q124 — group-wise simple linear regression: per event type, the
    * closed-form least-squares slope and intercept of value over time
    * — "is this metric drifting, and how fast", fit for every group in
    * one aggregate pass (the map-side-combinable Σx, Σy, Σxy, Σx²
    * moments; no iteration, no collect).
    *
    * Exactness: x is whole hours from the global min timestamp, y is
    * milli-units — all four moments stay int64 (bounds: |x| ≤ ~10³,
    * |y| ≤ ~10⁶ ⇒ n·Σxy ≤ ~10¹⁸) — and the final slope/intercept
    * ratios are single IEEE divide-floor chains (the q108 contract).
    * Slope unit: milli-value per hour, ppm-scaled. */
  val q124GroupRegression: QueryDef = QueryDef(
    "q124_group_regression",
    """WITH m0 AS (SELECT min(epoch_us(ts) // 1000000) AS t0 FROM events),
      |p AS (
      |  SELECT event_type,
      |    (epoch_us(ts) // 1000000 - m0.t0) // 3600 AS x,
      |    CAST(floor(value * 1000) AS BIGINT) AS y
      |  FROM events, m0),
      |a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM p GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0) /
      |       CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope_ppm,
      |  CAST(floor((CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) * 1000000.0 /
      |       CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS intercept_ppm
      |FROM a WHERE n * sxx - sx * sx > 0 ORDER BY event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val m0 = ev.agg(min(expr("unix_micros(ts) div 1000000")).as("t0"))
    val p = ev.crossJoin(broadcast(m0))
      .select(col("event_type"),
        expr("(unix_micros(ts) div 1000000 - t0) div 3600").as("x"),
        floor(col("value") * 1000).cast("bigint").as("y"))
    val a = p.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    a.filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .select(col("event_type"), col("n"),
        floor(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
          lit(1000000.0)) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .cast("bigint").as("slope_ppm"),
        floor((col("sy").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sxy")) * lit(1000000.0) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .cast("bigint").as("intercept_ppm"))
      .orderBy("event_type")
  }

  /** q169 — PCA top principal direction by distributed Gram + power
    * iteration: the d×d (uncentered) Gram matrix G = Σ x xᵀ is built
    * in ONE corpus pass, then eight power-iteration rounds v ← G·v
    * run entirely on that d²-cell frame, yielding the dominant
    * eigenvector (the first PCA loading) and its explained-variance
    * ratio vᵀGv / (vᵀv · tr G) — the "how 1-dimensional are my
    * embeddings" collapse diagnostic (anisotropy is the standard
    * failure mode of learned embedding spaces).
    *
    * Exactness: coordinates are the q95 floor-quantized micro-units
    * (integer, exact); Gram cells and all matvec/quadratic-form
    * accumulations ride DECIMAL(38)/HUGEINT (the q154 contract —
    * order-free integer sums, exact to 10³⁸, so cell magnitude
    * SCALE²·N ≈ 10²² at 10¹⁰ docs still has 16 digits of headroom).
    * Each round renormalizes v to max-abs 1000 through ONE mirrored
    * IEEE chain (floor(1000·u/max|u|)) — correctly-rounded cast, one
    * division, one floor — so the iterate stays a small exact integer
    * vector; degenerate rounds (G·v = 0) pin v to 0 instead of
    * reaching NaN. Start vector e₁·1000 is deterministic; 8 rounds is
    * a fixed budget, not a convergence test.
    *
    * Scale design (100 TB): the N·d² explode-and-aggregate is the
    * single fact-sized stage (map-side combinable into d² = 4096
    * cells); the 4096-cell Gram frame — CONSTANT at any corpus size —
    * then collects once (registered driver compute, the q246/q251
    * dimension-lattice class) and the eight power rounds, trace, and
    * Rayleigh quotient are exact BigInt driver arithmetic: zero
    * further corpus scans, zero windows, no per-round scheduling. */
  lazy val q169PcaPower: QueryDef = {
    val ROUNDS = 8
    val VSCALE = 1000 // per-round max-abs renormalization target
    val iterCtes = (1 to ROUNDS).map { t =>
      s"""u$t AS MATERIALIZED (
         |  SELECT g.i, sum(g.gv * v.val) AS u
         |  FROM g JOIN v${t - 1} v ON v.i = g.j GROUP BY g.i),
         |m$t AS (SELECT CAST(max(abs(u)) AS DOUBLE) AS mx FROM u$t),
         |v$t AS MATERIALIZED (
         |  SELECT i, CASE WHEN mx > 0
         |    THEN CAST(floor($VSCALE.0 * CAST(u AS DOUBLE) / mx) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS val
         |  FROM u$t, m$t)""".stripMargin
    }.mkString(",\n")
    QueryDef(
      "q169_pca_power",
      s"""WITH ${Learn.ptsCte},
         |g AS MATERIALIZED (
         |  SELECT a.pos AS i, b.pos AS j, sum(a.q * b.q) AS gv
         |  FROM pts a JOIN pts b USING (vec_id) GROUP BY 1, 2),
         |v0 AS (SELECT 1 AS i, CAST($VSCALE AS BIGINT) AS val),
         |$iterCtes,
         |tr AS (SELECT sum(gv) AS trace FROM g WHERE i = j),
         |vtv AS (SELECT sum(CAST(val AS HUGEINT) * val) AS vv FROM v$ROUNDS),
         |rq AS (
         |  SELECT sum(va.val * g.gv * vb.val) AS r
         |  FROM g JOIN v$ROUNDS va ON va.i = g.i JOIN v$ROUNDS vb ON vb.i = g.j)
         |SELECT CAST(v.i AS BIGINT) AS d, v.val AS v_milli,
         |  CASE WHEN vtv.vv > 0 AND tr.trace > 0
         |    THEN CAST(floor(1000000.0 * CAST(rq.r AS DOUBLE) /
         |      (CAST(vtv.vv AS DOUBLE) * CAST(tr.trace AS DOUBLE))) AS BIGINT)
         |    END AS evr_ppm
         |FROM v$ROUNDS v, tr, vtv, rq ORDER BY d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      // Gram via the join-free pair explode (r13): one scan, zero
      // pair-stage shuffles — see Learn.pointPairs. Cell values are
      // the identical decimal sums of the identical long products.
      // qi·qj in LONG (|q| ≤ 10⁶ by quantization, product ≤ 10¹² —
      // always exact), ONE decimal conversion feeding the exact sum:
      // halves the per-pair decimal work vs dec(qi)·dec(qj), same value
      val pp = Learn.pointPairs(Tables.embeddings(s, dir))
      val g = pp.groupBy(col("i"), col("j"))
        .agg(sum(dec(col("qi") * col("qj"))).as("gv"))
      // the Gram frame is d² = 4096 cells — CONSTANT at any corpus
      // size — so the eight power rounds are a registered driver fold
      // (the adjudicated q246/q251 class; r11: replaces 8 tiny
      // distributed rounds + per-round checkpoints, ~2.5 s of pure
      // scheduling on a 64-row frame). BigInt mirrors DECIMAL(38)/
      // HUGEINT exactly; BigInteger.doubleValue and Spark's
      // Decimal.toDouble are both correctly rounded, so the mirrored
      // IEEE renormalization chain is unchanged bit for bit.
      val cells = g.collect() // bounded: d*d = 4096 dimension-lattice rows
      val D = graft.operators.VectorOps.DIM
      val G = Array.ofDim[BigInt](D, D)
      for (i <- 0 until D; j <- 0 until D) G(i)(j) = BigInt(0)
      for (r <- cells)
        G(r.getInt(0) - 1)(r.getInt(1) - 1) = BigInt(r.getDecimal(2).toBigInteger)
      var v = Array.tabulate(D)(i => if (i == 0) VSCALE.toLong else 0L)
      for (_ <- 1 to ROUNDS) {
        val u = Array.tabulate(D)(i =>
          (0 until D).map(j => G(i)(j) * v(j)).sum)
        val mx = u.map(_.abs).max.toDouble
        v = u.map(ui =>
          if (mx > 0) math.floor(VSCALE.toDouble * ui.toDouble / mx).toLong
          else 0L)
      }
      val trace = (0 until D).map(i => G(i)(i)).sum
      val vv = v.map(x => BigInt(x) * BigInt(x)).sum
      val r = (for (i <- 0 until D; j <- 0 until D)
        yield BigInt(v(i)) * G(i)(j) * BigInt(v(j))).sum
      val evr: Option[Long] =
        if (vv > 0 && trace > 0)
          Some(math.floor(1000000.0 * r.toDouble /
            (vv.toDouble * trace.toDouble)).toLong)
        else None
      (1 to D).map(i => (i.toLong, v(i - 1), evr))
        .toDF("d", "v_milli", "evr_ppm")
        .orderBy("d")
    }
  }

  /** q283 — per-segment price elasticity of demand: the log-log OLS
    * slope of ln(quantity) on ln(unit price) for every market
    * segment, with R² — the textbook elasticity regression
    * (β = %Δqty per %Δprice), fit in one moment pass per group.
    * q124 regresses a LEVEL on time; the log-log transform is what
    * turns a regression slope into an ELASTICITY, and the per-
    * segment split is the pricing question ("who is price-
    * sensitive") rather than the drift question.
    *
    * Exactness: both logs are quantized to integer nano-nats
    * (floor(10⁹·ln·)) BEFORE aggregation — the q227 trick — so the
    * five moments accumulate exactly in DECIMAL(38)/HUGEINT under
    * any partitioning; slope and R² are ONE IEEE chain each off
    * those integers, with the degenerate zero-variance guard
    * identical in both engines.
    *
    * Scale design (100 TB): lineitem joins orders on the order key
    * (both hash-partitioned), the customer dim broadcasts, and the
    * rest is ONE partial-aggregable moment pass to ≤|segments| rows.
    * No windows, no collect. */
  val q283Elasticity: QueryDef = QueryDef(
    "q283_elasticity",
    """WITH f AS (
      |  SELECT c.c_mktsegment AS seg,
      |    CAST(floor(1000000000.0 * ln(l.l_extendedprice / l.l_quantity))
      |      AS BIGINT) AS x,
      |    CAST(floor(1000000000.0 * ln(l.l_quantity)) AS BIGINT) AS y
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
      |m AS (
      |  SELECT seg, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM f GROUP BY seg)
      |SELECT seg, CAST(n AS BIGINT) AS n,
      |  CAST(floor(1000000.0 *
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
      |    AS elasticity_micro,
      |  CAST(floor(1000000.0 *
      |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
      |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
      |    ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)
      |    AS r2_ppm
      |FROM m
      |WHERE (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      |ORDER BY seg""".stripMargin) { (s, dir) =>
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val f = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      // no broadcast hint: customer is SF-scaled (150k/SF) — AQE
      // chooses broadcast where it fits; pinning it would OOM at 100 TB
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"),
        floor(lit(1000000000.0) *
          log(col("l_extendedprice") / col("l_quantity")))
          .cast("bigint").as("x"),
        floor(lit(1000000000.0) * log(col("l_quantity")))
          .cast("bigint").as("y"))
    val m = f.groupBy(col("seg"))
      .agg(dec(count(lit(1))).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * col("y")).as("sxy"),
        sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("y")) * col("y")).as("syy"))
    val nd = col("n").cast("double")
    val cov = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varx = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vary = nd * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.filter(varx * vary > 0)
      .select(col("seg"), col("n").cast("bigint").as("n"),
        floor(lit(1000000.0) * cov / varx).cast("bigint")
          .as("elasticity_micro"),
        floor(lit(1000000.0) * (cov * cov) / (varx * vary)).cast("bigint")
          .as("r2_ppm"))
      .orderBy("seg")
  }

  /** q312 — effective rank (participation ratio) of the embedding
    * space, per label: PR = (tr C)² / tr(C²) of the covariance matrix
    * — the eigenvalue-free "how many dimensions are really in use"
    * diagnostic (PR = d for isotropic noise, 1 for a collapsed line;
    * Gao et al. 2017's neural-dimensionality measure). Computed
    * WITHOUT any eigendecomposition via the trace identities
    * tr C = Σ_d c_dd and tr C² = Σ_{dd'} c_dd'² — so it runs as pure
    * aggregates where q169's power iteration needs 8 rounds, and it
    * catches per-class representation collapse q169's global top
    * eigenvector can't see (complements q298's fractal intrinsic
    * dimension: PR is a second-moment measure, TwoNN a local-metric
    * one).
    *
    * Exactness: coordinates are the q95/q169 floor-quantized integer
    * micro-units; with A_dd' = n·Q_dd' − S_d·S_d' (all integer,
    * DECIMAL(38)/HUGEINT), PR = (Σ_d A_dd)² / (Σ_{dd'} A_dd'²)
    * exactly — the n² normalizations cancel. The two Σ magnitudes
    * (~10³⁴ at gate scale) exceed int64, so the final milli ratio is
    * ONE mirrored IEEE chain over the correctly-rounded DOUBLE casts
    * of the exact integer sums.
    *
    * Scale design (100 TB): the N·d² explode-and-aggregate is the
    * single fact-sized stage (map-side combinable straight into
    * |labels|·4096 cells — the q169 Gram shape with a label key); the
    * PR fold is a |labels|-row aggregate over that bounded frame. No
    * windows, no broadcast, no iteration. */
  val q312EffectiveRank: QueryDef = QueryDef(
    "q312_effective_rank",
    s"""WITH ${Learn.ptsCte},
       |lab AS (SELECT vec_id, label FROM embeddings),
       |g AS (
       |  SELECT l.label, a.pos AS i, b.pos AS j,
       |    CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS qq,
       |    CAST(sum(CAST(a.q AS HUGEINT)) AS HUGEINT) AS sa,
       |    CAST(sum(CAST(b.q AS HUGEINT)) AS HUGEINT) AS sb
       |  FROM pts a JOIN pts b USING (vec_id) JOIN lab l USING (vec_id)
       |  GROUP BY 1, 2, 3),
       |c AS (
       |  SELECT label, i, j, n, n * qq - sa * sb AS a_cell FROM g),
       |f AS (
       |  SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
       |    sum(CASE WHEN i = j THEN a_cell ELSE 0 END) AS tr_a,
       |    sum(a_cell * a_cell) AS tr_a2
       |  FROM c GROUP BY label)
       |SELECT CAST(label AS BIGINT) AS label, n_vecs,
       |  CASE WHEN tr_a2 > 0
       |    THEN CAST(floor(1e3 * (CAST(tr_a AS DOUBLE) * CAST(tr_a AS DOUBLE))
       |      / CAST(tr_a2 AS DOUBLE)) AS BIGINT) END AS pr_milli
       |FROM f ORDER BY label""".stripMargin) { (s, dir) =>
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val emb = Tables.embeddings(s, dir)
    // per-label Gram via the join-free pair explode (r13): the label
    // rides the scan, so the former pts⋈pts⋈lab three-way join is one
    // Generate chain into the same (label, i, j) cells
    val g = Learn.pointPairs(emb, extra = Seq("label"))
      .groupBy(col("label"), col("i"), col("j"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        // qi·qj in LONG (≤10¹², exact) — one decimal cast per pair
        sum(dec(col("qi") * col("qj"))).cast("decimal(38,0)").as("qq"),
        sum(dec(col("qi"))).cast("decimal(38,0)").as("sa"),
        sum(dec(col("qj"))).cast("decimal(38,0)").as("sb"))
    val c = g.select(col("label"), col("i"), col("j"), col("n"),
      (col("n") * col("qq") - col("sa") * col("sb")).as("a_cell"))
    c.groupBy(col("label"))
      .agg(max(col("n")).cast("bigint").as("n_vecs"),
        sum(when(col("i") === col("j"), col("a_cell")).otherwise(lit(0)))
          .as("tr_a"),
        sum(col("a_cell") * col("a_cell")).as("tr_a2"))
      .select(col("label").cast("bigint").as("label"), col("n_vecs"),
        when(col("tr_a2") > 0,
          floor(lit(1e3) * (col("tr_a").cast("double") *
            col("tr_a").cast("double")) / col("tr_a2").cast("double"))
            .cast("bigint")).as("pr_milli"))
      .orderBy("label")
  }

  /** q340 — quantile regression by slope grid + exact intercept: fit
    * y = m·x + b minimizing pinball loss at p ∈ {0.5, 0.9} for
    * extendedprice on quantity, over a literal 9-slope grid, using
    * the exactness shortcut that for ANY fixed slope the optimal
    * intercept is the p-quantile of the residuals — so the 2-D search
    * collapses to 9 exact 1-D order statistics plus one loss fold
    * (Koenker & Bassett 1978). Reports the chosen line per p; the
    * p=0.9 line is the "90% of line items cost at most THIS much at
    * quantity q" planning curve that q124's OLS (mean regression)
    * cannot provide on heavy-tailed money data.
    *
    * Exactness: residuals r = y_cents − m·x are exact integers per
    * (slope, r) class; intercepts are exact lower order statistics
    * via the distributed running-count frame (no interpolation);
    * pinball terms p·(r−b) / (p−1000)·(r−b) are integer milli,
    * summed in DECIMAL; argmin ties break on slope.
    *
    * Scale design (100 TB): the order statistic rides a HISTOGRAM
    * REFINEMENT instead of a global range sort — pass 1 buckets
    * residuals by arithmetic shift (floor division by 2^16, exact
    * for negatives) into a value-domain-bounded (slope × bucket)
    * count frame that partial-aggregates map-side; the target
    * bucket + within-bucket rank come from a cumulative window over
    * that tiny frame; pass 2 equi-joins the ≤|p|·|slopes| picked
    * buckets back (broadcast) and ranks only the ≤2^16 distinct
    * residuals inside each — so the 9×|rows| expand never shuffles
    * at all (the former grouped range exchange + checkpoint was the
    * whole query cost: 5.2 s → 3.5 s warm at sf0.1). The loss fold is a
    * map-side broadcast join + partial aggregate; the final argmin
    * is a window over 9·|p| rows. Output |p| rows. */
  val q340QuantileRegression: QueryDef = {
    val slopes = (-4 to 4).map(_ * 10000L) // cents per quantity unit
    val ps = Seq(500L, 900L)
    QueryDef(
      "q340_quantile_regression",
      s"""WITH f AS (
         |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
         |  FROM lineitem),
         |vc AS (
         |  SELECT m, y - m * x AS r, CAST(count(*) AS BIGINT) AS cnt
         |  FROM f, unnest([${slopes.mkString(", ")}]) AS s(m)
         |  GROUP BY 1, 2),
         |cum AS (
         |  SELECT m, r, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY m ORDER BY r) AS BIGINT) AS cum
         |  FROM vc),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
         |tgt AS (
         |  SELECT CAST(m AS BIGINT) AS m, CAST(p AS BIGINT) AS p,
         |    1 + ((n - 1) * p) // 1000 AS rk
         |  FROM nn, unnest([${slopes.mkString(", ")}]) AS s(m),
         |    unnest([${ps.mkString(", ")}]) AS pp(p)),
         |icept AS (
         |  SELECT t.m, t.p, min(c.r) AS b
         |  FROM tgt t JOIN cum c ON c.m = t.m AND c.cum >= t.rk
         |  GROUP BY 1, 2),
         |loss AS (
         |  SELECT i.m, i.p, i.b,
         |    CAST(sum(v.cnt * (CASE WHEN v.r - i.b >= 0
         |      THEN i.p * (v.r - i.b)
         |      ELSE (i.p - 1000) * (v.r - i.b) END)) AS HUGEINT) AS l
         |  FROM vc v JOIN icept i ON v.m = i.m
         |  GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT p, m, b, l,
         |    row_number() OVER (PARTITION BY p ORDER BY l, m) AS rn
         |  FROM loss)
         |SELECT p AS p_milli, m AS slope_cents, b AS icept_cents,
         |  CAST(l AS BIGINT) AS loss_milli
         |FROM best WHERE rn = 1 ORDER BY p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val f = Tables.lineitem(s, dir)
        .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"))
      // per-row residuals under the 9-slope expand; recomputed per
      // pass (a 2-column parquet scan + map-side explode is cheaper
      // than persisting the 9× frame)
      def resid(df: DataFrame): DataFrame = df
        .select(col("x"), col("y"),
          explode(array(slopes.map(lit): _*)).as("m"))
        .select(col("m"), (col("y") - col("m") * col("x")).as("r"))
      val BW = 16 // bucket = floor(r / 2^16); shiftright is exact floor
      val dec = (c: Column) => c.cast("decimal(38,0)")
      // pass 1: (slope, bucket) histogram — value-domain bounded
      // (residual range / 2^16 buckets per slope), partial-agg map-side.
      // r13: also carries Σr per bucket (exact DECIMAL), so the loss
      // fold below is CLOSED-FORM prefix arithmetic instead of a third
      // full resid pass: for pinball loss at intercept b,
      //   l(m,p,b) = p·[(S−S_<b) − b·(N−C_<b)] + (p−1000)·[S_<b − b·C_<b]
      // with S/N per slope and S_<b/C_<b split into below-bucket
      // (histogram prefix) + within-bucket (pass-2 running sums) parts
      // — the identical integer value the row-wise sum produced
      // (oracle unchanged, hash-green).
      val hist = resid(f)
        .groupBy(col("m"), shiftright(col("r"), BW).as("bk"))
        .agg(count(lit(1)).as("cnt"), sum(dec(col("r"))).as("sr"))
      val wBk = Window.partitionBy(col("m")).orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val histCum = hist
        .withColumn("cum", sum(col("cnt")).over(wBk))
        .withColumn("scum", sum(col("sr")).over(wBk))
      val st = broadcast(hist.groupBy(col("m"))
        .agg(sum(col("cnt")).as("ntot"), sum(col("sr")).as("stot"))
        .withColumnRenamed("m", "sm"))
      val nn = f.agg(count(lit(1)).as("n"))
      val tgt = broadcast(nn
        .crossJoin(slopes.toDF("m"))
        .crossJoin(ps.toDF("p"))
        .select(col("m"), col("p"),
          expr("1 + ((n - 1) * p) div 1000").as("rk")))
      // smallest bucket whose cumulative count reaches the rank, plus
      // the residual rank inside that bucket (both frames tiny); the
      // struct min compares bk first (unique per slope), the carried
      // prefix fields don't participate in the ordering
      val pick = broadcast(tgt
        .join(histCum, tgt("m") === histCum("m") && col("cum") >= col("rk"))
        .groupBy(tgt("m").as("im"), col("p"), col("rk"))
        .agg(min(struct(col("bk"), col("cum"), col("cnt"),
          col("scum"), col("sr"))).as("s"))
        .select(col("im"), col("p"), col("s.bk").as("bk"),
          (col("rk") - (col("s.cum") - col("s.cnt"))).as("wrk"),
          (col("s.cum") - col("s.cnt")).as("cb0"),
          (col("s.scum") - col("s.sr")).as("sb0")))
      // pass 2: refine only the picked buckets — ≤ 2^16 distinct
      // residuals per (slope, p) by construction, so the rank window
      // below is bounded by a literal, not by data
      val inBucket = resid(f)
        .withColumn("bk", shiftright(col("r"), BW))
        .join(pick, Seq("bk")).filter(col("m") === col("im"))
        .groupBy(col("im"), col("p"), col("wrk"), col("cb0"), col("sb0"),
          col("r"))
        .agg(count(lit(1)).as("c"))
      val wIn = Window.partitionBy(col("im"), col("p")).orderBy(col("r"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val icept = broadcast(inBucket
        .withColumn("c2", sum(col("c")).over(wIn))
        .withColumn("s2", sum(dec(col("c")) * col("r")).over(wIn))
        .filter(col("c2") >= col("wrk"))
        .groupBy(col("im"), col("p"), col("cb0"), col("sb0"))
        .agg(min(struct(col("r"), col("c2"), col("c"), col("s2"))).as("t"))
        .select(col("im"), col("p"),
          col("t.r").as("b"),
          (col("cb0") + (col("t.c2") - col("t.c"))).as("cbelow"),
          (col("sb0") + (col("t.s2") - dec(col("t.c")) * col("t.r")))
            .as("sbelow")))
      val loss = icept
        .join(st, col("im") === col("sm"))
        .select(col("im").as("m"), col("p"), col("b"),
          (dec(col("p")) * ((col("stot") - col("sbelow")) -
            dec(col("b")) * (col("ntot") - col("cbelow"))) +
            dec(col("p") - 1000) *
              (col("sbelow") - dec(col("b")) * col("cbelow")))
            .cast("decimal(38,0)").as("l"))
      val w = Window.partitionBy(col("p")).orderBy(col("l"), col("m"))
      loss.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("p").as("p_milli"), col("m").as("slope_cents"),
          col("b").as("icept_cents"), col("l").cast("bigint").as("loss_milli"))
        .orderBy("p_milli")
    }
  }

  /** q348 — RANSAC consensus line fit (Fischler & Bolles '81) of
    * price vs quantity: 16 candidate lines, each through an
    * md5-chosen pair of lineitem rows, scored by how many raw rows
    * fall within a ±$3000 vertical band of the line; every candidate
    * then gets an exact least-squares refit over ITS OWN inlier set.
    * The consensus ranking is the robust complement to q187's
    * Theil–Sen (which medians pairwise slopes over a bounded axis)
    * and q124's OLS (breakdown point 0%): here the model is voted on
    * by the raw corpus, so a minority of wild part-price regimes
    * cannot move the winner.
    *
    * Determinism: the "random" sample is the 32 rows with the
    * smallest md5(orderkey|linenumber) prefix (the q36 portable-RNG
    * contract), paired consecutively in hash order; degenerate pairs
    * (x1 = x2, vertical line) are dropped. Inlier test is pure
    * integer: |(y−y1)(x2−x1) − (y2−y1)(x−x1)| ≤ TOL·|x2−x1| — the
    * vertical-residual form, every product < 2³² · 2³⁰ so int64 is
    * safe. Refit slope/intercept ride ONE shared SQL chain on
    * all-DOUBLE casts of the exact conditional sums (the q286
    * contract: both engines parse the identical string, so
    * cross-engine agreement is by construction); a zero variance
    * denominator yields NULL.
    *
    * Scale design (100 TB): seeding is TakeOrdered (per-partition
    * heaps, 32 rows out) + a 32-row single-partition window; the
    * candidate table (≤16 rows) broadcasts into ONE corpus pass that
    * computes consensus counts AND all five refit sums per candidate
    * as conditional aggregates — map-side partial, 16× row expand
    * only inside the projection, no shuffle of expanded rows. Output
    * ≤16 rows. Sums accumulate in DECIMAL(38,0) (int64 would
    * overflow Σxy at production volume). */
  val q348RansacConsensus: QueryDef = {
    val TOL = 300000L // vertical tolerance, cents ($3000)
    // inlier predicate over a candidate (x1,y1,x2,y2) and point (x,y)
    def inl(px: String, py: String): String =
      s"abs(($py - y1) * (x2 - x1) - (y2 - y1) * ($px - x1)) " +
        s"<= $TOL * abs(x2 - x1)"
    // shared IEEE refit chains on the exact aggregates (n,sx,sy,sxy,sxx)
    val denom = "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    val num = "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    val lsSlope = s"CASE WHEN $denom = 0.0 THEN NULL ELSE " +
      s"CAST(floor((1000.0 * ($num)) / ($denom)) AS BIGINT) END"
    val lsIcept = s"CASE WHEN $denom = 0.0 THEN NULL ELSE " +
      s"CAST(floor((CAST(sy AS DOUBLE) - (($num) / ($denom)) * " +
      s"CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) END"
    QueryDef(
      "q348_ransac_consensus",
      s"""WITH pts AS (
         |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
         |    CAST(l_orderkey AS VARCHAR) || '|'
         |      || CAST(l_linenumber AS VARCHAR) AS k
         |  FROM lineitem),
         |seed AS (
         |  SELECT x, y, row_number() OVER (ORDER BY
         |      ('0x' || substring(md5(k), 1, 15))::BIGINT, k, x, y) AS rn
         |  FROM pts
         |  ORDER BY ('0x' || substring(md5(k), 1, 15))::BIGINT, k, x, y
         |  LIMIT 32),
         |cand AS (
         |  SELECT CAST((rn + 1) // 2 AS BIGINT) AS cand,
         |    CAST(max(CASE WHEN rn % 2 = 1 THEN x END) AS BIGINT) AS x1,
         |    CAST(max(CASE WHEN rn % 2 = 1 THEN y END) AS BIGINT) AS y1,
         |    CAST(max(CASE WHEN rn % 2 = 0 THEN x END) AS BIGINT) AS x2,
         |    CAST(max(CASE WHEN rn % 2 = 0 THEN y END) AS BIGINT) AS y2
         |  FROM seed GROUP BY 1
         |  HAVING max(CASE WHEN rn % 2 = 1 THEN x END)
         |      <> max(CASE WHEN rn % 2 = 0 THEN x END)),
         |cons AS (
         |  SELECT c.cand, c.x1, c.y1, c.x2, c.y2,
         |    CAST(floor((1000.0 * (c.y2 - c.y1)) / (c.x2 - c.x1)) AS BIGINT)
         |      AS pair_slope_milli,
         |    CAST(sum(CASE WHEN ${inl("p.x", "p.y")} THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n,
         |    sum(CASE WHEN ${inl("p.x", "p.y")} THEN p.x END) AS sx,
         |    sum(CASE WHEN ${inl("p.x", "p.y")} THEN p.y END) AS sy,
         |    sum(CASE WHEN ${inl("p.x", "p.y")} THEN p.x * p.y END) AS sxy,
         |    sum(CASE WHEN ${inl("p.x", "p.y")} THEN p.x * p.x END) AS sxx,
         |    CAST(count(*) AS BIGINT) AS n_total
         |  FROM cand c, pts p GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT cand, x1, y1, x2, y2, pair_slope_milli, n AS n_inliers,
         |  (1000000 * n) // n_total AS inlier_ppm,
         |  $lsSlope AS ls_slope_milli,
         |  $lsIcept AS ls_icept_cents
         |FROM cons ORDER BY n_inliers DESC, cand""".stripMargin) { (s, dir) =>
      val pts = Tables.lineitem(s, dir).select(
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"),
        expr("concat(CAST(l_orderkey AS STRING), '|', " +
          "CAST(l_linenumber AS STRING))").as("k"))
      val hashed = pts.withColumn("h",
        expr("CAST(conv(substring(md5(k), 1, 15), 16, 10) AS BIGINT)"))
      // TakeOrdered slice, then a 32-row single-partition window —
      // the q112/q130 adjudicated shape
      // (orderkey, linenumber) is NOT unique in the driver testdata —
      // x, y join the tiebreak so hash-tied rows order identically in
      // both engines
      val seed = hashed.orderBy(col("h"), col("k"), col("x"), col("y"))
        .limit(32)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("h"), col("k"), col("x"), col("y"))))
      val cand = broadcast(seed
        .groupBy(expr("CAST((rn + 1) div 2 AS BIGINT)").as("cand"))
        .agg(max(when(col("rn") % 2 === 1, col("x"))).as("x1"),
          max(when(col("rn") % 2 === 1, col("y"))).as("y1"),
          max(when(col("rn") % 2 === 0, col("x"))).as("x2"),
          max(when(col("rn") % 2 === 0, col("y"))).as("y2"))
        .filter(col("x1") =!= col("x2")))
      val isInl = expr(inl("x", "y"))
      val cons = pts.crossJoin(cand)
        .groupBy(col("cand"), col("x1"), col("y1"), col("x2"), col("y2"))
        .agg(
          sum(when(isInl, 1L).otherwise(0L)).cast("bigint").as("n"),
          sum(when(isInl, col("x")).cast("decimal(38,0)")).as("sx"),
          sum(when(isInl, col("y")).cast("decimal(38,0)")).as("sy"),
          sum(when(isInl, col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum(when(isInl, col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          count(lit(1)).as("n_total"))
      cons.select(col("cand"), col("x1"), col("y1"), col("x2"), col("y2"),
        expr("CAST(floor((1000.0 * (y2 - y1)) / (x2 - x1)) AS BIGINT)")
          .as("pair_slope_milli"),
        col("n").as("n_inliers"),
        expr("(1000000 * n) div n_total").as("inlier_ppm"),
        expr(lsSlope).as("ls_slope_milli"),
        expr(lsIcept).as("ls_icept_cents"))
        .orderBy(col("n_inliers").desc, col("cand"))
    }
  }

  /** q389 — Cook's distance regression diagnostics (Cook '77) on the
    * daily-revenue-vs-time OLS fit: leverage hᵢ, studentized
    * residual, and Dᵢ = e²ᵢhᵢ/(p·s²(1−hᵢ)²) per day, top-10 most
    * influential days out — the "which observations OWN this fit"
    * audit that belongs next to q124's group regressions (a trend
    * read off daily revenue can hinge on a handful of
    * quarter-close spikes; this names them).
    *
    * Exactness: all OLS moments are exact integers/DECIMAL(38)
    * (day-index x is small, revenue is cents); slope, intercept,
    * SSE, and every per-day hᵢ/eᵢ/Dᵢ ride SHARED floor-quantized
    * double chains built once and parsed by both engines (the q286
    * one-string contract); the top-10 cut is TakeOrdered with the
    * day as tiebreaker.
    *
    * Scale design (100 TB): one fact collapse to the calendar-bounded
    * day axis, one moments aggregate broadcast back, one map-side
    * per-day chain, one top-k heap. Output 10 rows. */
  val q389CooksDistance: QueryDef = {
    // shared double chains from exact integer moments (n, sx, sy,
    // sxx, sxy) and per-row (x, y); beta/alpha inlined
    val beta = "(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) " +
      "/ CAST(n * sxx - sx * sx AS DOUBLE))"
    val resid = s"(CAST(y AS DOUBLE) - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" - ($beta) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) - " +
      s"($beta) * CAST(x AS DOUBLE))"
    val lev = "(1.0e0 / CAST(n AS DOUBLE) + " +
      "CAST((n * x - sx) * (n * x - sx) AS DOUBLE) / " +
      "(CAST(n AS DOUBLE) * CAST(n * sxx - sx * sx AS DOUBLE)))"
    // every chain saturates at +/-1e15 BEFORE the BIGINT cast: a fuzz
    // corpus with extreme money outliers pushes D (and residuals) past
    // int64 nano-scale — the capped statistic stays exact, portable,
    // and deterministic (beyond the cap "infinitely influential" days
    // tie-break by day)
    val clamp = (x: String) =>
      s"CAST(floor(least(greatest($x, -1.0e15), 1.0e15)) AS BIGINT)"
    val eMicro = clamp(s"1000000.0e0 * ($resid)")
    val hNano = clamp(s"1000000000.0e0 * ($lev)")
    // nullif: a zero-residual fit (constant zero revenue) zeroes the
    // MSE and Cook's D is undefined; ANSI Spark would throw where
    // DuckDB natively NULLs (shared string; degenerate-corpus probe)
    val dNano = clamp(s"1000000000.0e0 * ($resid) * ($resid) * ($lev) " +
      s"/ nullif(2.0e0 * (CAST(sse AS DOUBLE) / 1000000.0e0 / " +
      s"CAST(n - 2 AS DOUBLE)) * (1.0e0 - ($lev)) * (1.0e0 - ($lev)), 0)")
    val sseTerm = clamp(s"($resid) * ($resid) / 1000000.0e0")
    QueryDef(
      "q389_cooks_distance",
      s"""WITH daily AS (
         |  SELECT CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy
         |  FROM daily),
         |sse0 AS (
         |  SELECT CAST(sum($sseTerm) AS BIGINT) AS sse FROM daily, m),
         |dd AS (
         |  SELECT x, y, $eMicro AS e_micro, $hNano AS h_nano,
         |    $dNano AS d_nano
         |  FROM daily, m, sse0),
         |top AS (
         |  SELECT x, y, e_micro, h_nano, d_nano,
         |    row_number() OVER (ORDER BY d_nano DESC, x) AS rk
         |  FROM dd)
         |SELECT CAST(rk AS BIGINT) AS rank, x AS day_epoch, y AS rev_cents,
         |  e_micro, h_nano, d_nano
         |FROM top WHERE rk <= 10 ORDER BY rank""".stripMargin) { (s, dir) =>
      val daily = DayAxis.revCentsEpoch(s, dir)
        .select(col("d").as("x"), col("rev").as("y"))
      val m = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).cast("bigint").as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      val sse0 = daily.crossJoin(broadcast(m))
        .agg(sum(expr(sseTerm)).cast("bigint").as("sse"))
      val dd = daily.crossJoin(broadcast(m)).crossJoin(broadcast(sse0))
        .select(col("x"), col("y"), expr(eMicro).as("e_micro"),
          expr(hNano).as("h_nano"), expr(dNano).as("d_nano"))
      val w = Window.orderBy(col("d_nano").desc, col("x"))
      dd.orderBy(col("d_nano").desc, col("x")).limit(10)
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .select(col("rank"), col("x").as("day_epoch"), col("y").as("rev_cents"),
          col("e_micro"), col("h_nano"), col("d_nano"))
        .orderBy("rank")
    }
  }

  val all: Seq[QueryDef] = Seq(q122Spmm, q124GroupRegression, q169PcaPower,
    q283Elasticity, q312EffectiveRank, q340QuantileRegression,
    q348RansacConsensus, q389CooksDistance)
}
