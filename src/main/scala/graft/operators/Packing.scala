package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that bins documents into
  * fixed token-budget context windows (greedy first-fit in a
  * deterministic document order, the standard pretraining packer).
  *
  * Packing is inherently SEQUENTIAL within a shard (each placement
  * depends on the running fill), so this is the codebase's one
  * legitimate per-partition imperative loop: repartition by source
  * (the parallel unit — at 100 TB, the shard), sort within partitions
  * by (source, doc_id) — the classic secondary-sort shape, ONE
  * shuffle — then a single forward scan assigns bins with O(1) state.
  * Parallelism is across sources/shards, exactly how production
  * packers shard.
  *
  * The oracle replays the same greedy recurrence as a recursive CTE
  * (row-at-a-time over the per-source rank), so the driver hash gate
  * proves the distributed secondary-sort scan equals the sequential
  * definition. All arithmetic is integer — no float drift anywhere.
  */
object Packing {

  private val CAPACITY = 512 // tokens per context window

  val q87Packing: QueryDef = QueryDef(
    "q87_packing",
    s"""WITH RECURSIVE t AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents
       |  WHERE source IS NOT NULL AND text IS NOT NULL),
       |pack AS (
       |  SELECT source, rn, tok, CAST(1 AS BIGINT) AS bin, tok AS cur
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.source, t.rn, t.tok,
       |    CASE WHEN p.cur + t.tok > $CAPACITY THEN p.bin + 1 ELSE p.bin END,
       |    CASE WHEN p.cur + t.tok > $CAPACITY THEN t.tok ELSE p.cur + t.tok END
       |  FROM pack p JOIN t ON t.source = p.source AND t.rn = p.rn + 1)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS total_toks,
       |  max(bin) AS n_bins,
       |  (1000 * CAST(sum(tok) AS BIGINT)) // (max(bin) * $CAPACITY) AS fill_permille
       |FROM pack GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    // null guard mirrors the oracle's WHERE: a NULL source would slip
    // past the `!=` boundary check (null == null in Scala) and a NULL
    // text would crash the non-nullable tuple encoder
    val toks = Tables.documents(s, dir)
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(
        col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("tok"))
    val packed = toks
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // sequential greedy fill; state resets at each source boundary
        var src: String = null
        var bin = 0L
        var cur = 0L
        it.map { case (source, docId, tok) =>
          if (source != src) { src = source; bin = 1L; cur = tok }
          else if (cur + tok > CAPACITY) { bin += 1; cur = tok }
          else cur += tok
          (source, docId, tok, bin)
        }
      }
      .toDF("source", "doc_id", "tok", "bin")
    packed.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_toks"),
        max(col("bin")).as("n_bins"))
      .withColumn("fill_permille",
        expr(s"(1000 * total_toks) div (n_bins * $CAPACITY)"))
      .orderBy("source")
  }

  /** q126 — clamped running balance (floor-at-zero ledger): per user,
    * purchases deposit value, every other event withdraws it, and the
    * balance can never go negative — report each user's final balance,
    * clamp count, and peak. The inventory/credit pattern that a plain
    * window CANNOT express: the clamp makes each step depend on the
    * clamped previous state, so there is no prefix-sum closed form.
    *
    * Same legitimacy argument and same machinery as q87: repartition
    * by user (the parallel unit), secondary-sort by (user, ts,
    * event_id) in the SAME shuffle, one forward scan with O(1) state.
    * The oracle replays the recurrence as a recursive CTE, so the
    * gate proves the distributed scan equals the sequential
    * definition. Integer milli-units end to end. */
  val q126ClampedBalance: QueryDef = QueryDef(
    "q126_clamped_balance",
    """WITH RECURSIVE t AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 1000) AS BIGINT)
      |         ELSE -CAST(floor(value * 1000) AS BIGINT) END AS d,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |bal AS (
      |  SELECT user_id, rn,
      |    greatest(CAST(0 AS BIGINT), d) AS bal,
      |    CAST(CASE WHEN d < 0 THEN 1 ELSE 0 END AS BIGINT) AS clamps,
      |    greatest(CAST(0 AS BIGINT), d) AS peak
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.user_id, t.rn,
      |    greatest(CAST(0 AS BIGINT), b.bal + t.d),
      |    b.clamps + CASE WHEN b.bal + t.d < 0 THEN 1 ELSE 0 END,
      |    greatest(b.peak, b.bal + t.d)
      |  FROM bal b JOIN t ON t.user_id = b.user_id AND t.rn = b.rn + 1),
      |last AS (SELECT user_id, max(rn) AS mr FROM bal GROUP BY user_id)
      |SELECT b.user_id, b.bal AS final_milli, b.clamps AS n_clamps,
      |  b.peak AS peak_milli
      |FROM bal b JOIN last l ON b.user_id = l.user_id AND b.rn = l.mr
      |ORDER BY b.user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val rows = Tables.events(s, dir)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("event_type") === "purchase",
          floor(col("value") * 1000).cast("long"))
          .otherwise(-floor(col("value") * 1000).cast("long")).as("d"))
    clampedBalance(s, rows)
      .select(col("user_id"), col("bal").as("final_milli"),
        col("clamps").as("n_clamps"), col("peak").as("peak_milli"))
      .orderBy("user_id")
  }

  /** The q126 kernel, exposed for the boundary-reset property spec:
    * secondary-sort scan over (user_id, us, event_id, d) rows →
    * one (bal, clamps, peak) row per user. `partitions` forces a
    * specific partition count so tests can exercise multi-key
    * partitions. */
  private[graft] def clampedBalance(
      s: org.apache.spark.sql.SparkSession,
      rows: org.apache.spark.sql.DataFrame,
      partitions: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val rp = partitions
      .map(n => rows.repartition(n, col("user_id")))
      .getOrElse(rows.repartition(col("user_id")))
    rp.sortWithinPartitions("user_id", "us", "event_id")
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var uid = Long.MinValue
        var bal = 0L; var clamps = 0L; var peak = 0L; var rn = 0L
        it.map { case (u, _, _, d) =>
          if (u != uid) { uid = u; bal = 0L; clamps = 0L; peak = 0L; rn = 0L }
          rn += 1
          val nb = bal + d
          if (nb < 0) { clamps += 1; bal = 0L } else bal = nb
          if (bal > peak) peak = bal
          (u, rn, bal, clamps, peak)
        }
      }
      .toDF("user_id", "rn", "bal", "clamps", "peak")
      .groupBy(col("user_id"))
      .agg(
        max_by(col("bal"), col("rn")).as("bal"),
        max(col("clamps")).as("clamps"), // monotone over the scan
        max(col("peak")).as("peak"))
  }

  /** q354 — newsvendor optimal stocking per brand (Arrow–Harris–
    * Marschak '51): from each brand's empirical daily-demand
    * distribution, the critical-fractile stock level
    * S* = min{s : F(s) ≥ cu/(cu+co)} for two cost scenarios
    * (underage:overage 9:1 and 1:1), with the exact expected daily
    * mismatch cost of S* versus the mean-demand and max-demand
    * heuristics. For the DISCRETE empirical distribution the critical
    * fractile is provably optimal over all integer stock levels, so
    * cost(S*) ≤ cost(mean) and ≤ cost(max) are INVARIANTS the spec
    * pins — an end-to-end optimality certificate, not just a
    * computation. Complements q87 (packing — capacity) and q126
    * (clamped balance): this is the stochastic-inventory decision.
    *
    * Exactness: demand day-sums are exact integers; the fractile test
    * is cross-multiplied (cf·(cu+co) ≥ cu·n — no division); expected
    * costs are integer sums scaled to milli via a non-negative floor
    * div; the mean heuristic is a non-negative div.
    *
    * Scale design (100 TB): facts collapse once to (brand, day)
    * demand, then to the (brand, demand-value) distribution — both
    * partial-aggregable; cumulative F rides a PER-BRAND window
    * (brands unbounded, values-per-brand bounded by active days); the
    * scenario axis is a 2-row literal; the cost pass is ONE equi join
    * of the ≤|brands|·2 candidate frame back to the distribution with
    * three conditional sums — the three candidate levels are columns,
    * not rows, so no extra fan-out. Output |brands|·2 rows. */
  val q354Newsvendor: QueryDef = {
    val scen = Seq((9L, 1L), (1L, 1L))
    val scenSql = scen.map { case (cu, co) => s"($cu, $co)" }.mkString(", ")
    QueryDef(
      "q354_newsvendor",
      s"""WITH dem AS (
         |  SELECT p.p_brand AS brand,
         |    CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d,
         |    CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
         |      AS q
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  GROUP BY 1, 2),
         |dist AS (
         |  SELECT brand, q, CAST(count(*) AS BIGINT) AS c
         |  FROM dem GROUP BY 1, 2),
         |cum AS (
         |  SELECT brand, q, c,
         |    CAST(sum(c) OVER (PARTITION BY brand ORDER BY q
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cf,
         |    CAST(sum(c) OVER (PARTITION BY brand) AS BIGINT) AS n
         |  FROM dist),
         |sc AS (SELECT CAST(s.cu AS BIGINT) AS cu, CAST(s.co AS BIGINT) AS co
         |       FROM (VALUES $scenSql) s(cu, co)),
         |sstar AS (
         |  SELECT cum.brand, sc.cu, sc.co, min(cum.q) AS s_star,
         |    min(cum.n) AS n_days
         |  FROM cum, sc WHERE cum.cf * (sc.cu + sc.co) >= sc.cu * cum.n
         |  GROUP BY 1, 2, 3),
         |heur AS (
         |  SELECT brand, CAST(sum(q * c) // sum(c) AS BIGINT) AS s_mean,
         |    max(q) AS s_max
         |  FROM dist GROUP BY 1),
         |cand AS (
         |  SELECT s.brand, s.cu, s.co, s.s_star, s.n_days, h.s_mean, h.s_max
         |  FROM sstar s JOIN heur h ON s.brand = h.brand),
         |cost AS (
         |  SELECT cand.brand, cand.cu, cand.co, cand.s_star, cand.s_mean,
         |    cand.s_max, cand.n_days,
         |    CAST(sum(d.c * (cand.cu * greatest(d.q - cand.s_star, 0)
         |      + cand.co * greatest(cand.s_star - d.q, 0))) AS BIGINT) AS x1,
         |    CAST(sum(d.c * (cand.cu * greatest(d.q - cand.s_mean, 0)
         |      + cand.co * greatest(cand.s_mean - d.q, 0))) AS BIGINT) AS x2,
         |    CAST(sum(d.c * (cand.cu * greatest(d.q - cand.s_max, 0)
         |      + cand.co * greatest(cand.s_max - d.q, 0))) AS BIGINT) AS x3
         |  FROM cand JOIN dist d ON cand.brand = d.brand
         |  GROUP BY 1, 2, 3, 4, 5, 6, 7)
         |SELECT brand, cu, co, s_star, s_mean, s_max, n_days,
         |  (1000 * x1) // n_days AS cost_star_milli,
         |  (1000 * x2) // n_days AS cost_mean_milli,
         |  (1000 * x3) // n_days AS cost_max_milli
         |FROM cost ORDER BY brand, cu""".stripMargin) { (s, dir) =>
      val dem = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          datediff(col("l_shipdate").cast("date"), lit("1970-01-01"))
            .cast("bigint").as("d"))
        .agg(sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)"))
          .cast("bigint").as("q"))
      val dist = dem.groupBy(col("brand"), col("q"))
        .agg(count(lit(1)).as("c"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("brand")).orderBy(col("q"))
      val cum = dist
        .withColumn("cf", sum(col("c")).over(
          wB.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)).cast("bigint"))
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("brand")))
          .cast("bigint"))
      import s.implicits._
      val sc = scen.toDF("cu", "co")
      val sstar = cum.crossJoin(broadcast(sc))
        .filter(col("cf") * (col("cu") + col("co")) >= col("cu") * col("n"))
        .groupBy(col("brand"), col("cu"), col("co"))
        .agg(min(col("q")).as("s_star"), min(col("n")).as("n_days"))
      val heur = dist.groupBy(col("brand"))
        .agg(expr("CAST(sum(q * c) div sum(c) AS BIGINT)").as("s_mean"),
          max(col("q")).as("s_max"))
      val cand = sstar.join(heur, Seq("brand"))
      def mism(sCol: String) =
        s"sum(c * (cu * greatest(q - $sCol, 0) + co * greatest($sCol - q, 0)))"
      cand.join(dist, Seq("brand"))
        .groupBy(col("brand"), col("cu"), col("co"), col("s_star"),
          col("s_mean"), col("s_max"), col("n_days"))
        .agg(expr(s"CAST(${mism("s_star")} AS BIGINT)").as("x1"),
          expr(s"CAST(${mism("s_mean")} AS BIGINT)").as("x2"),
          expr(s"CAST(${mism("s_max")} AS BIGINT)").as("x3"))
        .select(col("brand"), col("cu"), col("co"), col("s_star"),
          col("s_mean"), col("s_max"), col("n_days"),
          expr("(1000 * x1) div n_days").as("cost_star_milli"),
          expr("(1000 * x2) div n_days").as("cost_mean_milli"),
          expr("(1000 * x3) div n_days").as("cost_max_milli"))
        .orderBy("brand", "cu")
    }
  }

  val all: Seq[QueryDef] = Seq(q87Packing, q126ClampedBalance, q354Newsvendor)
}
