package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Privacy / governance audits over the customer dimension — the
  * re-identification checks a training-data pipeline runs before a
  * table (or the text derived from it) is released: k-anonymity
  * (how small do quasi-identifier groups get), l-diversity (do small
  * groups leak the sensitive attribute), and the generalization
  * ladder (how much coarsening buys how much anonymity).
  *
  * Quasi-identifiers here are (nation, market segment, account-balance
  * bucket) — the classic "public attributes an attacker can join on".
  * The sensitive attribute is the balance bucket itself in the
  * l-diversity view.
  *
  * Exactness: balances ride the q01 decimal-cast cents contract;
  * balance BUCKETS shift cents by +10^7 (balances are > -$100k by
  * generator construction, pinned in OracleInvariantsSpec) before the
  * integral division so the numerator is non-negative — the domain
  * where Spark's truncating `div` and DuckDB's flooring `//` agree —
  * then unshift. Every other number is a count or a non-negative ppm
  * floor-div.
  */
object Privacy {

  /** The shifted-bucket expression, shared by all three audits:
    * $500-wide balance buckets, exact over negative balances. */
  private val bucketSql =
    "((CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 10000000) %s 50000) - 200"

  /** q201 — k-anonymity risk report: group customers by the full
    * quasi-identifier (nation, segment, $500 balance bucket) and, for
    * the standard thresholds k ∈ {2, 5, 10}, count the groups and rows
    * that fail them. A row in a group smaller than k is re-identifiable
    * to within k−1 candidates by anyone who knows those three public
    * attributes.
    *
    * Scale design (100 TB): the QI group-by is one partial-aggregable
    * pass on an unbounded key; everything after runs on the GROUP SIZE
    * table (|groups| rows, ≪ rows); the three thresholds come from a
    * 3-row literal cross join (broadcast); the report is a 3-row
    * aggregate. No windows, no fact-sized joins. */
  val q201KAnonymity: QueryDef = QueryDef(
    "q201_k_anonymity",
    s"""WITH g AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS seg,
      |    ${bucketSql.format("//")} AS bal_bucket,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |             CAST(sum(n) AS BIGINT) AS n_rows,
      |             CAST(min(n) AS BIGINT) AS min_group FROM g),
      |ks AS (SELECT CAST(unnest([2, 5, 10]) AS BIGINT) AS k)
      |SELECT ks.k, t.n_groups, t.min_group,
      |  CAST(count(CASE WHEN g.n < ks.k THEN 1 END) AS BIGINT) AS groups_below,
      |  CAST(coalesce(sum(CASE WHEN g.n < ks.k THEN g.n END), 0) AS BIGINT) AS rows_at_risk,
      |  CAST((1000000 * CAST(coalesce(sum(CASE WHEN g.n < ks.k THEN g.n END), 0) AS BIGINT))
      |       // t.n_rows AS BIGINT) AS risk_ppm
      |FROM g CROSS JOIN ks CROSS JOIN t
      |GROUP BY ks.k, t.n_groups, t.min_group, t.n_rows
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val g = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
        expr(bucketSql.format("div")).as("bal_bucket"))
      .agg(count(lit(1)).as("n"))
    val t = g.agg(count(lit(1)).as("n_groups"), sum("n").as("n_rows"),
      min("n").as("min_group"))
    val ks = s.range(1).select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"))
    g.crossJoin(broadcast(ks)).crossJoin(broadcast(t))
      .groupBy(col("k"), col("n_groups"), col("min_group"), col("n_rows"))
      .agg(count(when(col("n") < col("k"), 1)).as("groups_below"),
        coalesce(sum(when(col("n") < col("k"), col("n"))), lit(0L))
          .as("rows_at_risk"))
      .select(col("k"), col("n_groups"), col("min_group"),
        col("groups_below"), col("rows_at_risk"),
        expr("(1000000 * rows_at_risk) div n_rows").as("risk_ppm"))
      .orderBy("k")
  }

  /** q202 — l-diversity audit: for each (nation, segment) group, how
    * many DISTINCT balance buckets it contains. A group that is
    * k-anonymous but holds only one sensitive value still leaks it to
    * anyone who can place a target in the group — the homogeneity
    * attack k-anonymity alone misses. Flags groups below l = 3.
    *
    * Scale design (100 TB): the distinct count pre-collapses to
    * (nation, segment, bucket) grain FIRST — partial-aggregable, no
    * count-distinct expansion over the fact — then rolls up to the
    * bounded (nation, segment) key. Output ≤ |nations|·|segments|. */
  val q202LDiversity: QueryDef = QueryDef(
    "q202_l_diversity",
    s"""WITH sv AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS seg,
      |    ${bucketSql.format("//")} AS bal_bucket,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT nation, seg,
      |  CAST(sum(n) AS BIGINT) AS group_size,
      |  CAST(count(*) AS BIGINT) AS l_distinct,
      |  count(*) >= 3 AS meets_l3
      |FROM sv GROUP BY nation, seg
      |ORDER BY nation, seg""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
        expr(bucketSql.format("div")).as("bal_bucket"))
      .agg(count(lit(1)).as("n"))
      .groupBy("nation", "seg")
      .agg(sum("n").as("group_size"), count(lit(1)).as("l_distinct"),
        (count(lit(1)) >= 3).as("meets_l3"))
      .orderBy("nation", "seg")
  }

  /** q203 — generalization ladder: the k-anonymity risk (at k = 5) of
    * four release schemas, from fully detailed to fully generalized —
    * the curve a data steward walks down until the risk clears policy,
    * trading analytic utility (finer QI) for anonymity:
    * L0 = (nation, segment, $100 bucket), L1 = (nation, segment,
    * $10k bucket), L2 = (nation, segment), L3 = (segment).
    *
    * Scale design (100 TB): four independent partial-aggregable
    * group-bys (each ONE pass, and Spark schedules them off one shared
    * scan), each collapsing to its group-size table before the 1-row
    * risk aggregate; the union is 4 rows. Risk is monotonically
    * non-increasing down the ladder — pinned by the fuzz invariants. */
  val q203GeneralizationLadder: QueryDef = QueryDef(
    "q203_generalization_ladder",
    s"""WITH c AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS seg,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 10000000 AS sc
      |  FROM customer),
      |l0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c
      |       GROUP BY nation, seg, sc // 10000),
      |l1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c
      |       GROUP BY nation, seg, sc // 1000000),
      |l2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c GROUP BY nation, seg),
      |l3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c GROUP BY seg),
      |r AS (
      |  SELECT 0 AS level, CAST(count(*) AS BIGINT) AS n_groups,
      |    CAST(min(n) AS BIGINT) AS min_group,
      |    CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT) AS rows_at_risk,
      |    CAST(sum(n) AS BIGINT) AS n_rows FROM l0
      |  UNION ALL
      |  SELECT 1, CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
      |    CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
      |    CAST(sum(n) AS BIGINT) FROM l1
      |  UNION ALL
      |  SELECT 2, CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
      |    CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
      |    CAST(sum(n) AS BIGINT) FROM l2
      |  UNION ALL
      |  SELECT 3, CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
      |    CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
      |    CAST(sum(n) AS BIGINT) FROM l3)
      |SELECT CAST(level AS BIGINT) AS level, n_groups, min_group, rows_at_risk,
      |  CAST((1000000 * rows_at_risk) // n_rows AS BIGINT) AS risk_ppm
      |FROM r ORDER BY level""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
        ((col("c_acctbal").cast("decimal(12,2)") * 100).cast("bigint")
          + 10000000L).as("sc"))
    def risk(level: Int, keys: Seq[org.apache.spark.sql.Column]) = {
      c.groupBy(keys: _*)
        .agg(count(lit(1)).as("n"))
        .agg(lit(level.toLong).as("level"),
          count(lit(1)).as("n_groups"), min("n").as("min_group"),
          coalesce(sum(when(col("n") < 5, col("n"))), lit(0L))
            .as("rows_at_risk"),
          sum("n").as("n_rows"))
    }
    risk(0, Seq(col("nation"), col("seg"), expr("sc div 10000")))
      .unionAll(risk(1, Seq(col("nation"), col("seg"), expr("sc div 1000000"))))
      .unionAll(risk(2, Seq(col("nation"), col("seg"))))
      .unionAll(risk(3, Seq(col("seg"))))
      .select(col("level"), col("n_groups"), col("min_group"),
        col("rows_at_risk"),
        expr("(1000000 * rows_at_risk) div n_rows").as("risk_ppm"))
      .orderBy("level")
  }

  /** q217 — deterministic pseudonymization audit: re-key the customer
    * dimension and the order fact with md5-derived pseudonyms (the
    * tokenization a privacy-preserving data release applies to direct
    * identifiers) and PROVE the release still joins: the same salted
    * hash on both sides must preserve the join cardinality exactly,
    * and the pseudonym space must stay collision-free. One row per
    * property with original-vs-pseudonymized counts — a release gate,
    * not a transformation demo.
    *
    * Exactness: pseudonyms are the md5-prefix 60-bit integers (the
    * q36 contract, bit-identical in both engines); every check is an
    * integer count.
    *
    * Scale design (100 TB): the pseudonym is a per-row codegen'd
    * expression (no lookup table to shuffle or leak — the salt is the
    * secret); the join-preservation check is the SAME equi hash join
    * shape as production; collision detection is count vs
    * count-distinct on each side — all partial-aggregable. */
  val q217Pseudonymize: QueryDef = QueryDef(
    "q217_pseudonymize",
    """WITH ck AS (
      |  SELECT c_custkey AS k,
      |    ('0x' || substring(md5('s4lt' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS p
      |  FROM customer),
      |ok AS (
      |  SELECT o_custkey AS k,
      |    ('0x' || substring(md5('s4lt' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS p
      |  FROM orders),
      |r AS (
      |  SELECT 'orig_join' AS prop, CAST(count(*) AS BIGINT) AS n
      |  FROM ok JOIN ck ON ck.k = ok.k
      |  UNION ALL
      |  SELECT 'pseudo_join', CAST(count(*) AS BIGINT)
      |  FROM ok JOIN ck ON ck.p = ok.p
      |  UNION ALL
      |  SELECT 'cust_collisions',
      |    CAST(count(*) - count(DISTINCT p) AS BIGINT) FROM ck
      |  UNION ALL
      |  SELECT 'orders_rekeyed', CAST(count(*) AS BIGINT) FROM ok)
      |SELECT prop, n FROM r ORDER BY prop""".stripMargin) { (s, dir) =>
    def pseudo(c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("s4lt"), c.cast("string"))), 1, 15), 16, 10)
        .cast("long")
    val ck = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), pseudo(col("c_custkey")).as("p"))
    val ok = Tables.orders(s, dir)
      .select(col("o_custkey").as("ok_k"), pseudo(col("o_custkey")).as("ok_p"))
    val origJoin = ok.join(ck, col("k") === col("ok_k"))
      .agg(count(lit(1)).as("n")).select(lit("orig_join").as("prop"), col("n"))
    val pseudoJoin = ok.join(ck, col("p") === col("ok_p"))
      .agg(count(lit(1)).as("n")).select(lit("pseudo_join").as("prop"), col("n"))
    val collisions = ck
      .agg((count(lit(1)) - countDistinct(col("p"))).as("n"))
      .select(lit("cust_collisions").as("prop"), col("n"))
    val rekeyed = ok.agg(count(lit(1)).as("n"))
      .select(lit("orders_rekeyed").as("prop"), col("n"))
    origJoin.unionAll(pseudoJoin).unionAll(collisions).unionAll(rekeyed)
      .orderBy("prop")
  }

  /** q223 — t-closeness audit, completing the k-anonymity (q201) /
    * l-diversity (q202) privacy triad: for each (nation, segment)
    * group, the Earth Mover's Distance between the group's sensitive-
    * attribute (balance-bucket) distribution and the GLOBAL one. A
    * group can be k-anonymous and l-diverse yet still leak — if its
    * bucket mix skews far from the corpus-wide mix, membership alone
    * shifts an attacker's posterior (the skewness attack). For the
    * ordered bucket attribute, EMD is the mean absolute difference of
    * the two CDFs (Li/Li/Venkatasubramanian's ordered-distance form).
    *
    * Exactness: buckets ride the shared shifted-div expression; the
    * per-bucket CDF gap is the integer cross-product
    * |cum_g·N − cum_global·n_g| (common denominator n_g·N — the q224
    * trick), summed exactly; emd_ppm is ONE non-negative floor-div by
    * (|buckets|−1)·n_g·N. Headroom: Σ|gap|·10⁶ ≤ |buckets|·n_g·N·10⁶
    * — int64-safe through ~10⁸ customers; past that, lift the gap sum
    * to DECIMAL(38) (q154 contract).
    *
    * Scale design (100 TB): one QI pass to (group, bucket) grain, then
    * everything runs on group-size tables; the bucket axis is value-
    * domain-bounded, so the densifying cross join broadcasts |buckets|
    * rows and the per-group CDF window sees ≤ |buckets| rows per
    * partition. Output ≤ |nations|·|segments| rows. */
  val q223TCloseness: QueryDef = QueryDef(
    "q223_t_closeness",
    s"""WITH g AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS seg,
      |    ${bucketSql.format("//")} AS bucket,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3),
      |gt AS (SELECT nation, seg, CAST(sum(n) AS BIGINT) AS ng FROM g
      |       GROUP BY nation, seg),
      |gl AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS m FROM g GROUP BY bucket),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS mcnt,
      |               CAST(sum(m) AS BIGINT) AS nn FROM gl),
      |grid AS (
      |  SELECT gt.nation, gt.seg, gt.ng, gl.bucket, gl.m,
      |    coalesce(g.n, 0) AS n
      |  FROM gt CROSS JOIN gl
      |  LEFT JOIN g ON g.nation = gt.nation AND g.seg = gt.seg
      |             AND g.bucket = gl.bucket),
      |cdf AS (
      |  SELECT nation, seg, ng, m,
      |    CAST(sum(n) OVER (PARTITION BY nation, seg ORDER BY bucket
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
      |    CAST(sum(m) OVER (PARTITION BY nation, seg ORDER BY bucket
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_m
      |  FROM grid)
      |SELECT nation, seg, ng AS group_size, tot.mcnt AS n_buckets,
      |  CAST((1000000 * CAST(sum(abs(cum_n * tot.nn - cum_m * ng)) AS BIGINT))
      |       // ((tot.mcnt - 1) * ng * tot.nn) AS BIGINT) AS emd_ppm,
      |  (1000000 * CAST(sum(abs(cum_n * tot.nn - cum_m * ng)) AS BIGINT))
      |       // ((tot.mcnt - 1) * ng * tot.nn) <= 200000 AS meets_t_20
      |FROM cdf, tot
      |GROUP BY nation, seg, ng, tot.mcnt, tot.nn
      |ORDER BY nation, seg""".stripMargin) { (s, dir) =>
    val g = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
        expr(bucketSql.format("div")).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .ckpt() // feeds group totals, global histogram, grid
    val gt = g.groupBy("nation", "seg").agg(sum("n").as("ng"))
    val gl = g.groupBy("bucket").agg(sum("n").as("m"))
    val tot = gl.agg(count(lit(1)).as("mcnt"), sum("m").as("nn"))
    val grid = gt.crossJoin(broadcast(gl))
      .join(g, Seq("nation", "seg", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("nation", "seg").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cdf = grid
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_m", sum("m").over(w))
    cdf.crossJoin(broadcast(tot))
      .groupBy(col("nation"), col("seg"), col("ng"), col("mcnt"), col("nn"))
      .agg(sum(abs(col("cum_n") * col("nn") - col("cum_m") * col("ng")))
        .as("gapsum"))
      .select(col("nation"), col("seg"), col("ng").as("group_size"),
        col("mcnt").as("n_buckets"),
        // nullif: an all-equal-balance corpus collapses the histogram
        // to ONE bucket (mcnt = 1) and EMD over a single bin is
        // undefined; ANSI would throw where the oracle's // natively
        // NULLs (degenerate-corpus probe)
        expr("(1000000 * gapsum) div nullif((mcnt - 1) * ng * nn, 0)")
          .as("emd_ppm"),
        (expr("(1000000 * gapsum) div nullif((mcnt - 1) * ng * nn, 0)")
          <= 200000L).as("meets_t_20"))
      .orderBy("nation", "seg")
  }

  private val RR_CATS = Seq("click", "error", "purchase", "signup", "view")

  /** q247 — k-ary randomized response (Warner'65; the RAPPOR
    * primitive): each event reports its type truthfully with
    * probability 3/4, otherwise a uniformly drawn category — the
    * LOCAL differential-privacy mechanism (ε = ln(p·k/(1−p)) =
    * ln 15 ≈ 2.7 per report) under which the collector can still
    * estimate POPULATION frequencies: E[obs] = p·π + (1−p)/k, so
    * π̂ = (obs − (1−p)/k)/p. The audit reports true, observed,
    * debiased, and residual-error shares per category — debiased
    * must track true while observed is pulled toward uniform.
    *
    * Determinism: the mechanism's coins are md5-prefix integers of
    * the event id (q36 contract) — the REPLAYABLE stand-in for the
    * mechanism's RNG, so both engines flip identical coins and the
    * gate pins the exact debias arithmetic, not a statistical
    * tolerance. Negative debiased shares clamp at 0 BEFORE the
    * truncating div (`greatest` on both sides — the signed-div
    * portability rule).
    *
    * Scale design (100 TB): one map-side expression pair per row
    * (two md5s + a CASE against a broadcast 5-row category axis),
    * two partial-aggregable count passes, a 1-row total broadcast —
    * nothing downstream of the scan exceeds |categories| rows. */
  val q247RandomizedResponse: QueryDef = QueryDef(
    "q247_randomized_response",
    s"""WITH base AS (
      |  SELECT event_type AS true_cat,
      |    ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      |      % 4 AS coin,
      |    ('0x' || substring(md5('r|' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      |      % ${RR_CATS.size} AS ri
      |  FROM events),
      |cats AS (
      |  SELECT unnest([${RR_CATS.map(c => s"'$c'").mkString(", ")}]) AS cat,
      |    CAST(unnest(range(${RR_CATS.size})) AS BIGINT) AS idx),
      |rep AS (
      |  SELECT CASE WHEN b.coin < 3 THEN b.true_cat ELSE c.cat END AS rep_cat,
      |    b.true_cat
      |  FROM base b JOIN cats c ON c.idx = b.ri),
      |tot AS (SELECT count(*) AS n FROM rep),
      |o AS (SELECT rep_cat AS cat, count(*) AS o FROM rep GROUP BY 1),
      |t AS (SELECT true_cat AS cat, count(*) AS t FROM rep GROUP BY 1)
      |SELECT c.cat,
      |  (1000000 * coalesce(t.t, 0)) // tot.n AS true_ppm,
      |  (1000000 * coalesce(o.o, 0)) // tot.n AS obs_ppm,
      |  greatest(0, 4 * ((1000000 * coalesce(o.o, 0)) // tot.n) - 200000)
      |    // 3 AS est_ppm,
      |  abs(greatest(0, 4 * ((1000000 * coalesce(o.o, 0)) // tot.n) - 200000)
      |    // 3 - (1000000 * coalesce(t.t, 0)) // tot.n) AS err_ppm
      |FROM cats c LEFT JOIN o ON o.cat = c.cat LEFT JOIN t ON t.cat = c.cat
      |CROSS JOIN tot ORDER BY c.cat""".stripMargin) { (s, dir) =>
    val cats = s.createDataFrame(RR_CATS.zipWithIndex.map {
      case (c, i) => (c, i.toLong)
    }).toDF("cat", "idx")
    val base = Tables.events(s, dir).select(
      col("event_type").as("true_cat"),
      (conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 4).as("coin"),
      (conv(substring(md5(concat(lit("r|"), col("event_id").cast("string"))),
        1, 15), 16, 10).cast("long") % RR_CATS.size).as("ri"))
    val rep = base.join(broadcast(cats), col("idx") === col("ri"))
      .select(when(col("coin") < 3, col("true_cat")).otherwise(col("cat"))
        .as("rep_cat"), col("true_cat"))
      .ckpt() // feeds total + both count passes
    val tot = rep.agg(count(lit(1)).as("n"))
    val o = rep.groupBy(col("rep_cat").as("cat")).agg(count(lit(1)).as("o"))
    val t = rep.groupBy(col("true_cat").as("cat")).agg(count(lit(1)).as("t"))
    cats.join(broadcast(o), Seq("cat"), "left")
      .join(broadcast(t), Seq("cat"), "left")
      .crossJoin(broadcast(tot))
      .select(col("cat"),
        expr("(1000000 * coalesce(t, CAST(0 AS BIGINT))) div n").as("true_ppm"),
        expr("(1000000 * coalesce(o, CAST(0 AS BIGINT))) div n").as("obs_ppm"),
        expr("greatest(0, 4 * ((1000000 * coalesce(o, CAST(0 AS BIGINT))) div n)" +
          " - 200000) div 3").as("est_ppm"),
        expr("abs(greatest(0, 4 * ((1000000 * coalesce(o, CAST(0 AS BIGINT)))" +
          " div n) - 200000) div 3" +
          " - (1000000 * coalesce(t, CAST(0 AS BIGINT))) div n)").as("err_ppm"))
      .orderBy("cat")
  }

  /** q305 — ε-differentially-private histogram (Laplace mechanism)
    * over customer market segments, with its utility report: each
    * count is released as count + Lap(Δf/ε) with sensitivity 1, and
    * the output carries true vs noisy side by side plus the absolute
    * error — the "what does ε cost me" table a privacy review reads.
    * q247 privatizes INDIVIDUAL rows (randomized response, local DP);
    * this is the central-DP aggregate release that a stats endpoint
    * publishes.
    *
    * Determinism: the Laplace draw inverts a uniform built from the
    * md5 prefix of the segment name (the q247/q217 portable-coin
    * contract — both engines hash identical bytes): u ∈ (0,1),
    * noise = −b·sgn(u−½)·ln(1−2|u−½|), evaluated as ONE shared IEEE
    * chain + floor to milli in identical text, so the release is
    * reproducible and the oracle hash-matches. (A production release
    * would swap the md5 coin for a CSPRNG draw — one expression, same
    * plan.)
    *
    * Scale design (100 TB): one partial-aggregable count pass to
    * |segments| rows; the noise is O(1) arithmetic per released cell.
    * Nothing else touches data. */
  val q305DpHistogram: QueryDef = {
    val EPS_MILLI = 500 // ε = 0.5 → b = 1/ε = 2.0
    // shared noise text: u from the md5 prefix (60 bits / 2^60), then
    // the inverse-CDF Laplace with scale b = 1000/EPS_MILLI
    val u = "((CAST(uhex AS DOUBLE) + 0.5) / 1152921504606846976.0)"
    val noiseMilli =
      s"CAST(floor(1000.0 * (0.0 - ${1000.0 / EPS_MILLI} * " +
        s"(CASE WHEN $u >= 0.5 THEN 1.0 ELSE -1.0 END) * " +
        s"ln(1.0 - 2.0 * abs($u - 0.5)))) AS BIGINT)"
    QueryDef(
      "q305_dp_histogram",
      s"""WITH h AS (
         |  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
         |  FROM customer GROUP BY 1),
         |c AS (
         |  SELECT seg, n,
         |    ('0x' || substring(md5('lap' || seg), 1, 15))::BIGINT AS uhex
         |  FROM h),
         |r AS (SELECT seg, n, $noiseMilli AS noise_milli FROM c)
         |SELECT seg, n AS true_count,
         |  1000 * n + noise_milli AS noisy_milli,
         |  abs(noise_milli) AS abs_err_milli
         |FROM r ORDER BY seg""".stripMargin) { (s, dir) =>
      val h = Tables.customer(s, dir)
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"))
      h.select(col("seg"), col("n"),
          conv(substring(md5(concat(lit("lap"), col("seg"))), 1, 15), 16, 10)
            .cast("bigint").as("uhex"))
        .select(col("seg"), col("n"), expr(noiseMilli).as("noise_milli"))
        .select(col("seg"), col("n").as("true_count"),
          (lit(1000) * col("n") + col("noise_milli")).as("noisy_milli"),
          abs(col("noise_milli")).as("abs_err_milli"))
        .orderBy("seg")
    }
  }

  /** q327 — ε-differentially-private median by the exponential
    * mechanism (McSherry–Talwar 2007), per market segment: order
    * amounts bucket into 64 bins, each bin b gets rank utility
    * u_b = −|2·cum_b − n| (sensitivity 2), and the released bin
    * maximizes ε·u/(2Δ) + Gumbel noise — selection-based DP for the
    * statistic Laplace counts can't protect (q305 releases COUNTS;
    * medians need the exponential mechanism because rank utility, not
    * the value itself, is what's perturbed). The output carries the
    * true-median bin and the released bin's rank error side by side —
    * the utility report a privacy review reads at a given ε.
    *
    * Determinism: the Gumbel draw −ln(−ln u) inverts a uniform built
    * from the md5 prefix of (segment, bin) — the q247/q305 portable-
    * coin contract — evaluated in ONE shared IEEE chain; the argmax
    * ties break on bin. (A production release swaps the coin for a
    * CSPRNG — same plan.)
    *
    * Scale design (100 TB): one partial-aggregable (segment, bin)
    * collapse over the fact join; the CDF is a window PARTITIONED by
    * segment over the literal 64-bin axis; scoring and selection run
    * on the |segments|·64-row bounded frame. Output |segments| rows. */
  val q327DpMedian: QueryDef = {
    val NB = 64
    val EPS_MILLI = 500 // ε = 0.5; Δu = 2 ⇒ coefficient ε/4 = 0.125
    // shared IEEE score chain over integer (cum, n) and the coin
    val u = "((CAST(uhex AS DOUBLE) + 0.5) / 1152921504606846976.0)"
    val score =
      s"(0.125e0 * (0e0 - CAST(abs(2 * cum - n) AS DOUBLE))" +
        s" + (0e0 - ln(0e0 - ln($u))))"
    QueryDef(
      "q327_dp_median",
      s"""WITH o AS (
         |  SELECT c.c_mktsegment AS seg,
         |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |bnd AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o),
         |h AS (
         |  SELECT seg, least($NB - 1, ($NB * (cents - mn)) // (mx - mn + 1))
         |    AS bin, CAST(count(*) AS BIGINT) AS c
         |  FROM o, bnd GROUP BY 1, 2),
         |segs AS (SELECT DISTINCT seg FROM h),
         |grid AS (
         |  SELECT s.seg, CAST(g.bin AS BIGINT) AS bin, coalesce(h.c, 0) AS c
         |  FROM segs s CROSS JOIN (SELECT unnest(range(0, $NB)) AS bin) g
         |  LEFT JOIN h ON h.seg = s.seg AND h.bin = g.bin),
         |cum AS (
         |  SELECT seg, bin, c,
         |    CAST(sum(c) OVER (PARTITION BY seg ORDER BY bin) AS BIGINT)
         |      AS cum,
         |    CAST(sum(c) OVER (PARTITION BY seg) AS BIGINT) AS n
         |  FROM grid),
         |sc AS (
         |  SELECT seg, bin, cum, n,
         |    ('0x' || substring(md5('em' || seg || '_' || bin), 1, 15))::BIGINT
         |      AS uhex
         |  FROM cum),
         |pick AS (
         |  SELECT seg, bin, cum, n FROM (
         |    SELECT seg, bin, cum, n,
         |      row_number() OVER (PARTITION BY seg ORDER BY $score DESC, bin)
         |        AS rn
         |    FROM sc) WHERE rn = 1),
         |tru AS (
         |  SELECT seg, min(bin) AS true_bin
         |  FROM cum WHERE 2 * cum >= n GROUP BY seg)
         |SELECT p.seg, p.n AS n_orders, t.true_bin, p.bin AS dp_bin,
         |  abs(p.bin - t.true_bin) AS bin_err,
         |  (1000000 * abs(2 * p.cum - p.n)) // p.n AS rank_err_ppm
         |FROM pick p JOIN tru t ON p.seg = t.seg
         |ORDER BY p.seg""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val bnd = o.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      val h = o.crossJoin(broadcast(bnd))
        .select(col("seg"),
          least(lit(NB - 1), expr(s"($NB * (cents - mn)) div (mx - mn + 1)"))
            .as("bin"))
        .groupBy(col("seg"), col("bin")).agg(count(lit(1)).as("c"))
        .ckpt() // feeds the skeleton join AND the segment list
      val segs = h.select(col("seg")).distinct()
      val grid = segs
        .crossJoin(s.range(0, NB).select(col("id").as("bin")))
        .join(h, Seq("seg", "bin"), "left")
        .select(col("seg"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("seg")).orderBy(col("bin"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
      val cum = grid
        .select(col("seg"), col("bin"),
          sum(col("c")).over(wCum).cast("bigint").as("cum"),
          sum(col("c")).over(wAll).cast("bigint").as("n"))
        .ckpt() // feeds the pick AND the true-median fold
      val sc = cum.select(col("seg"), col("bin"), col("cum"), col("n"),
        conv(substring(md5(concat(lit("em"), col("seg"), lit("_"),
          col("bin").cast("string"))), 1, 15), 16, 10).cast("bigint")
          .as("uhex"))
      val wPick = org.apache.spark.sql.expressions.Window
        .partitionBy(col("seg")).orderBy(expr(score).desc, col("bin"))
      val pick = sc.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("seg"), col("bin"), col("cum"), col("n"))
      val tru = cum.filter(lit(2) * col("cum") >= col("n"))
        .groupBy(col("seg")).agg(min(col("bin")).as("true_bin"))
      pick.join(tru.select(col("seg").as("tseg"), col("true_bin")),
          col("seg") === col("tseg"))
        .select(col("seg"), col("n").as("n_orders"), col("true_bin"),
          col("bin").as("dp_bin"),
          abs(col("bin") - col("true_bin")).as("bin_err"),
          expr("(1000000 * abs(2 * cum - n)) div n").as("rank_err_ppm"))
        .orderBy("seg")
    }
  }

  val all: Seq[QueryDef] = Seq(
    q327DpMedian,
    q201KAnonymity, q202LDiversity, q203GeneralizationLadder,
    q217Pseudonymize, q223TCloseness, q247RandomizedResponse,
    q305DpHistogram)
}
