package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Distributed sketches — the approximate counterparts of the exact
  * distinct aggregates (q14), for the cardinalities where exactness
  * stops scaling.
  *
  * KMV (k-minimum-values): keep the k smallest hash values seen; the
  * distinct-count estimate is (k−1) / x_(k) where x_(k) is the k-th
  * minimum mapped to (0,1). The buffer is a bounded sorted array →
  * merge is a k-way bounded merge, shuffle traffic is O(k) per group
  * regardless of input size, and the same sketch supports set
  * operations (Jaccard of two KMVs) — the property MinHash dedup
  * builds on. Implemented as a typed [[Aggregator]] (ObjectHashAggregate
  * at runtime): partial sketches combine map-side, exactly like any
  * built-in partial aggregate.
  *
  * Spark's own `approx_count_distinct` (HLL) is surfaced alongside it
  * for comparison. Both are fully hash-gated (q36/q67/q85): the
  * estimator math is deterministic given the portable md5-prefix
  * hash, so the DuckDB oracle replays the identical sketch; accuracy
  * bounds are additionally pinned in SketchesSpec/ScaleOpsSpec.
  */
object Sketches {

  /** KMV sketch over pre-hashed longs (feed `xxhash64(col)`, or an
    * md5-prefix hash when the estimate must be engine-portable).
    *
    * @param hashBits 64 ⇒ inputs are full signed-64 hashes (xxhash64);
    *                 n<64 ⇒ inputs are non-negative n-bit hashes and the
    *                 k-th minimum normalizes by 2^n — with a hash both
    *                 engines can compute (md5 prefix), the estimate is
    *                 bit-identical in DuckDB and the q36 oracle is exact.
    */
  final case class Kmv(k: Int, hashBits: Int = 64)
      extends Aggregator[Long, Array[Long], Double] {

    override def zero: Array[Long] = Array.empty

    /** Insert, keeping the k smallest distinct hashes (sorted asc). */
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(buf, h)
      if (idx >= 0) buf // already present
      else {
        val ins = -idx - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // bounded sorted merge with dedup
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      var last = 0L; var hasLast = false
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (!hasLast || v != last) { out(n) = v; n += 1; last = v; hasLast = true }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    /** (k−1)/x_(k) with hashes mapped to (0,1); exact below k. */
    override def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else {
        val xk =
          if (hashBits == 64)
            (buf(k - 1).toDouble / 1.8446744073709552e19) + 0.5 // signed 2^64
          else
            buf(k - 1).toDouble / math.pow(2.0, hashBits.toDouble)
        (k - 1).toDouble / xk
      }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** The sketch-valued sibling of [[Kmv]]: same bottom-k-distinct-hash
    * state, but `finish` returns the SKETCH (the sorted hash array)
    * instead of the estimate — the materialization an OLAP pre-agg
    * cube stores per fine-grain cell so coarser grains merge sketches
    * instead of rescanning facts (q206). */
  final case class KmvSketch(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inner = Kmv(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      inner.reduce(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Bottom-k-by-hash value sample — the mergeable uniform sample
    * behind bounded-memory quantiles at 100 TB: keep the k (hash,
    * value) pairs smallest under the TOTAL (hash, value) order; a
    * uniform hash makes that a uniform without-replacement sample of
    * the rows, mergeable exactly like [[Kmv]] (sorted merge, cap k),
    * with O(k) state per group in any partial aggregate.
    *
    * Hash ties are KEPT, not dropped — every input row is a
    * legitimate sample member and partial aggregation never feeds the
    * same row twice, so there is nothing to dedup (unlike [[Kmv]],
    * which samples distinct VALUES); the (hash, value) order makes
    * the kept set deterministic under any partitioning. ScaleOpsSpec
    * pins this to q85's window form. */
  final case class BottomKSample(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[Double]] {

    private implicit val ord: Ordering[(Long, Double)] =
      Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

    override def zero: Seq[(Long, Double)] = Vector.empty // sorted by (hash, value)

    override def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = {
      val ins = buf.indexWhere(b => ord.gteq(b, x)) match { case -1 => buf.length; case i => i }
      if (buf.length < k) (buf.take(ins) :+ x) ++ buf.drop(ins)
      else if (ins < k) ((buf.take(ins) :+ x) ++ buf.drop(ins)).take(k)
      else buf
    }

    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (a ++ b).sorted.take(k)

    override def finish(buf: Seq[(Long, Double)]): Seq[Double] =
      buf.map(_._2).sorted

    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Misra–Gries frequent-items summary with capacity k.
    *
    * Guarantees (Misra–Gries 1982; merge bound from Agarwal et al.,
    * "Mergeable Summaries", PODS'12): the summary holds ≤ k entries,
    * every estimate undercounts by at most n/(k+1), and — the property
    * q67 builds on — every item with true frequency > n/(k+1) is
    * PRESENT in the summary. Merging partial summaries (sum counts,
    * subtract the (k+1)-th largest, drop non-positives) preserves the
    * bound, so map-side partials combine exactly like any partial
    * aggregate and the shuffle carries O(k) entries per partition. */
  final case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
      buf.get(x) match {
        case Some(c)              => buf.updated(x, c + 1)
        case None if buf.size < k => buf.updated(x, 1L)
        case None => // decrement-all: amortized O(1) per arrival
          buf.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (m.size <= k) m
      else {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        m.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy hitters, EXACT and oracle-gated, via the two-pass sketch
    * pattern that survives 100 TB: pass 1 streams the corpus through
    * a Misra–Gries summary (bounded state, no full-vocabulary
    * shuffle) whose keys are a guaranteed superset of every token
    * above the 1% threshold (n/(k+1) < n/100 for k=256); pass 2
    * exact-counts ONLY the ≤ k candidates (driver-bounded collect,
    * mirrored by the reference-style isin pushdown) and applies the
    * exact threshold. The sketch never affects the answer — only the
    * amount of state it took to find it. */
  val q67HeavyHitters: QueryDef = QueryDef(
    "q67_heavy_hitters",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |n AS (SELECT count(*) AS n FROM t),
      |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
      |SELECT c.tok, c.cnt FROM c CROSS JOIN n
      |WHERE c.cnt * 100 > n.n ORDER BY c.tok""".stripMargin) { (s, dir) =>
    val mg = udaf(MisraGries(256))
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val firstPass = toks
      .agg(mg(col("tok")).as("summary"), count(lit(1)).as("n")).head()
    val candidates = firstPass.getMap[String, Long](0).keys.toSeq
    val n = firstPass.getLong(1)
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 > lit(n))
      .orderBy("tok")
  }

  /** KMV distinct-order estimate per returnflag next to the exact
    * count — ORACLE-GATED: the sketch hashes through a 60-bit md5
    * prefix both engines compute identically, so DuckDB can replay the
    * estimator exactly (k-th minimum via a window, same double
    * arithmetic). The only approximation left is the estimator's own —
    * and that is deterministic. Spark's HLL (`approx_count_distinct`)
    * has no portable value and lives in ScaleOpsSpec instead. */
  val q36KmvSketch: QueryDef = QueryDef(
    "q36_kmv_sketch",
    """WITH h AS (
      |  SELECT DISTINCT l_returnflag,
      |    ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, h,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS nh
      |  FROM h),
      |e AS (
      |  SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact
      |  FROM lineitem GROUP BY 1),
      |kth AS (SELECT l_returnflag, h AS hk FROM r WHERE rn = 256),
      |nhs AS (SELECT l_returnflag, max(nh) AS nh FROM r GROUP BY 1)
      |SELECT e.l_returnflag, e.exact,
      |  round(CASE WHEN kth.hk IS NULL THEN CAST(nhs.nh AS DOUBLE)
      |             ELSE 255.0 / (CAST(kth.hk AS DOUBLE) / 1152921504606846976.0)
      |        END, 1) AS kmv_est
      |FROM e JOIN nhs USING (l_returnflag) LEFT JOIN kth USING (l_returnflag)
      |ORDER BY e.l_returnflag""".stripMargin) { (s, dir) =>
    val kmv = udaf(Kmv(256, hashBits = 60))
    Tables.lineitem(s, dir)
      .select(
        col("l_returnflag"),
        conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"),
        col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        round(kmv(col("h")), 1).as("kmv_est"))
      .orderBy("l_returnflag")
  }

  /** Sample quantiles (q85) — bounded-memory quantiles the way a
    * 100 TB pipeline computes them: a deterministic bottom-k-by-hash
    * uniform sample per group (the [[BottomKSample]] summary, here in
    * its relational window form so the arbitrary-k state stays off
    * the agg path), then exact interpolated percentiles over the ≤k
    * sampled values. The hash is the engine-portable 60-bit md5
    * prefix, so DuckDB draws the IDENTICAL sample.
    *
    * Determinism under ties: (l_orderkey, l_linenumber) is NOT unique
    * in the test data, so the hash input includes the VALUE (decimal-
    * canonical string) — rows that still collide are byte-identical
    * in every sampled field, so whichever copy wins rn ≤ k the sample
    * VALUES are identical. The group's total row count comes from a
    * separate partial-aggregable count broadcast back over the sample:
    * riding it on the window (count OVER the partition) reads as "one
    * pass" but FORCES a full sort of each 3-value group in one task —
    * and its presence in the Window node disables the
    * [[graft.plans.RowNumberTopKRewrite]] heap prune (the rule's
    * single-row_number guard), so it cost a full bounded-key sort at
    * any scale. With the count split out, the rn ≤ k filter plants
    * [[graft.plans.TopKPerKey]] and no task ever holds more than k
    * rows per key. */
  val q85SampleQuantiles: QueryDef = {
    val K = 200
    QueryDef(
      "q85_sample_quantiles",
      s"""WITH h AS (
         |  SELECT l_returnflag, l_extendedprice,
         |    ('0x' || substring(md5(
         |      CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|'
         |        || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM lineitem),
         |samp AS (
         |  SELECT l_returnflag, l_extendedprice, n_rows FROM (
         |    SELECT l_returnflag, l_extendedprice,
         |      count(*) OVER (PARTITION BY l_returnflag) AS n_rows,
         |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h, l_extendedprice) AS rn
         |    FROM h) WHERE rn <= $K)
         |SELECT l_returnflag, CAST(max(n_rows) AS BIGINT) AS n_rows, count(*) AS n_sample,
         |  quantile_cont(l_extendedprice, 0.25) AS p25,
         |  quantile_cont(l_extendedprice, 0.5) AS p50,
         |  quantile_cont(l_extendedprice, 0.9) AS p90
         |FROM samp GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      val h = l.select(
        col("l_returnflag"), col("l_extendedprice"),
        conv(substring(md5(concat_ws("|",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          col("l_extendedprice").cast("decimal(18,2)").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("h"), col("l_extendedprice"))
      val nr = h.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
      val samp = h
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") <= K)
        .join(broadcast(nr), Seq("l_returnflag"))
      samp.groupBy(col("l_returnflag"))
        .agg(
          max(col("n_rows")).as("n_rows"),
          count(lit(1)).as("n_sample"),
          expr("percentile(l_extendedprice, 0.25D)").as("p25"),
          expr("percentile(l_extendedprice, 0.5D)").as("p50"),
          expr("percentile(l_extendedprice, 0.9D)").as("p90"))
        .select(col("l_returnflag"), col("n_rows"), col("n_sample"),
          col("p25"), col("p50"), col("p90"))
        .orderBy("l_returnflag")
    }
  }

  /** Theta-sketch set algebra (q88) — distinct-set union/intersection/
    * difference cardinalities from bounded sketches, the way set
    * overlap is measured at 100 TB where exact distinct joins stop
    * scaling (the Theta Sketch Framework of Dasgupta et al., the
    * published generalization of KMV to set operations).
    *
    * Each set keeps its k smallest 60-bit md5 hashes; θ = the smaller
    * of the two k-th minima. Any hash below θ survived BOTH sketches'
    * retention threshold, so the sketch contents below θ are a uniform
    * θ-rate sample of each set and every set expression is estimated
    * as (qualifying hashes) / θ. All arithmetic is deterministic — the
    * engine-portable hash lets DuckDB replay the sketches bit-exactly,
    * so the oracle gates the estimator itself, not just the exact
    * counts carried alongside.
    *
    * Scale shape: the per-set bottom-k runs two-level (per-salt-bucket
    * prune, then per-set) so no single task ever sorts more than the
    * salt shard; the surviving ≤2k hashes make the set-op join
    * broadcast-size by construction. The mergeable aggregator form of
    * the same summary is [[Kmv]] (ScaleOpsSpec pins the equivalence of
    * bottom-k windows and the aggregator). */
  val q88ThetaSketch: QueryDef = {
    val K = 256
    val HMAX = 1152921504606846976L // 2^60: theta of a not-full sketch
    QueryDef(
      "q88_theta_sketch",
      s"""WITH lab AS (
         |  SELECT DISTINCT CASE WHEN o_orderstatus='F' THEN 'A' ELSE 'B' END AS s, o_custkey
         |  FROM orders WHERE o_orderstatus IN ('F','O')),
         |h AS (
         |  SELECT s, ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM lab),
         |bk AS (
         |  SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn FROM h
         |  QUALIFY rn <= $K),
         |kth AS (
         |  SELECT least(
         |    coalesce(max(CASE WHEN s='A' AND rn=$K THEN h END), $HMAX),
         |    coalesce(max(CASE WHEN s='B' AND rn=$K THEN h END), $HMAX)) AS th
         |  FROM bk),
         |m AS (
         |  SELECT coalesce(a.h, b.h) AS h, a.h IS NOT NULL AS ina, b.h IS NOT NULL AS inb
         |  FROM (SELECT h FROM bk WHERE s='A') a
         |  FULL OUTER JOIN (SELECT h FROM bk WHERE s='B') b ON a.h = b.h),
         |c AS (
         |  SELECT count(*) AS union_cnt,
         |    CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS inter_cnt,
         |    CAST(sum(CASE WHEN ina AND NOT inb THEN 1 ELSE 0 END) AS BIGINT) AS diff_cnt,
         |    max(th) AS th
         |  FROM m, kth WHERE h < th),
         |ex AS (
         |  SELECT count(DISTINCT CASE WHEN s='A' THEN o_custkey END) AS exact_a,
         |         count(DISTINCT CASE WHEN s='B' THEN o_custkey END) AS exact_b,
         |         count(DISTINCT o_custkey) AS exact_union
         |  FROM lab)
         |SELECT exact_a, exact_b, exact_union,
         |  exact_a + exact_b - exact_union AS exact_inter,
         |  exact_union - exact_b AS exact_diff,
         |  round(CAST(union_cnt AS DOUBLE) / (CAST(th AS DOUBLE) / $HMAX.0), 1) AS est_union,
         |  round(CAST(inter_cnt AS DOUBLE) / (CAST(th AS DOUBLE) / $HMAX.0), 1) AS est_inter,
         |  round(CAST(diff_cnt AS DOUBLE) / (CAST(th AS DOUBLE) / $HMAX.0), 1) AS est_diff
         |FROM c, ex""".stripMargin) { (s, dir) =>
      val lab = Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(
          when(col("o_orderstatus") === "F", "A").otherwise("B").as("s"),
          col("o_custkey").as("key"))
        .distinct()
      val ex = lab.agg(
        countDistinct(when(col("s") === "A", col("key"))).as("exact_a"),
        countDistinct(when(col("s") === "B", col("key"))).as("exact_b"),
        countDistinct(col("key")).as("exact_union"))
      thetaSetEstimates(lab, K).crossJoin(ex).select(
        col("exact_a"), col("exact_b"), col("exact_union"),
        (col("exact_a") + col("exact_b") - col("exact_union")).as("exact_inter"),
        (col("exact_union") - col("exact_b")).as("exact_diff"),
        col("est_union"), col("est_inter"), col("est_diff"))
    }
  }

  /** Theta-sketch union/intersection/difference estimates for two
    * labeled key sets: input columns `(s: 'A'|'B', key)`, one output
    * row `(est_union, est_inter, est_diff)` (difference = A \ B).
    * Deterministic: the hash is the 60-bit md5 prefix, so any engine
    * replays the identical sketches (q88's oracle does). */
  private[graft] def thetaSetEstimates(
      lab: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val HMAX = 1152921504606846976L // 2^60
    val hashed = lab.select(
      col("s"),
      conv(substring(md5(col("key").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    // two-level bottom-k: the salt-bucket pass bounds every sort to
    // its shard; only ≤64·k rows per set reach the per-set window
    val w1 = Window.partitionBy(col("s"), pmod(col("h"), lit(64))).orderBy(col("h"))
    val w2 = Window.partitionBy(col("s")).orderBy(col("h"))
    val bk = hashed
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("s"), col("h"), col("rn"))
      .ckpt() // ≤2k rows, consumed by kth AND both join sides
    val kth = bk.agg(
      least(
        coalesce(max(when(col("s") === "A" && col("rn") === k, col("h"))), lit(HMAX)),
        coalesce(max(when(col("s") === "B" && col("rn") === k, col("h"))), lit(HMAX)))
        .as("th"))
    val a = bk.filter(col("s") === "A").select(col("h"), lit(true).as("ina"))
    val b = bk.filter(col("s") === "B").select(col("h"), lit(true).as("inb"))
    val cnts = a.join(b, Seq("h"), "full_outer")
      .crossJoin(broadcast(kth))
      .filter(col("h") < col("th"))
      .agg(
        count(lit(1)).as("union_cnt"),
        sum(when(col("ina") && col("inb"), 1L).otherwise(0L)).as("inter_cnt"),
        sum(when(col("ina") && col("inb").isNull, 1L).otherwise(0L)).as("diff_cnt"),
        max(col("th")).as("th"))
    def est(cnt: String) = round(
      col(cnt).cast("double") / (col("th").cast("double") / lit(HMAX.toDouble)), 1)
    cnts.select(
      est("union_cnt").as("est_union"),
      est("inter_cnt").as("est_inter"),
      est("diff_cnt").as("est_diff"))
  }

  /** Count-min sketch (q97) — the mergeable point-frequency summary
    * (Cormode & Muthukrishnan 2005): a d×w integer grid where every
    * token occurrence increments one counter per row, and a point
    * estimate is the MIN over its d counters (always ≥ the true count;
    * error ≤ εn with w = ⌈e/ε⌉ at probability 1−(1/2)^d).
    *
    * Scale shape: the grid build is ONE map-side-combinable aggregate
    * over (row, bucket) — d·w = 1024 cells of state regardless of
    * vocabulary size, the whole point at 100 TB where the exact
    * per-token groupBy shuffles the full vocabulary. The probe side
    * joins the finished grid BROADCAST. Estimates are deterministic:
    * buckets come from the engine-portable md5-prefix hash, so the
    * DuckDB oracle replays the identical grid and gates the estimator
    * itself (the exact counts ride alongside for the error margin). */
  /** Count-min bucket for hash row `r`: w=256 buckets, 2 hex chars of
    * the salted engine-portable digest. Shared by batch q97 and the
    * streaming windowed grid ([[graft.streaming.StreamOps.countMinWindowed]]). */
  private[graft] def cmsBucket(r: Int, tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(s"cm$r:"), tok)), 1, 2), 16, 10).cast("int")

  /** Explode a frame with a `tok` column into d (r, bucket) rows per
    * token occurrence — the grid-increment stream. */
  private[graft] def withCmsBuckets(df: org.apache.spark.sql.DataFrame, d: Int): org.apache.spark.sql.DataFrame = df
    .withColumn("rb", explode(array((0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(r, col("tok")).as("bucket"))): _*)))
    .select(df.columns.map(col) :+ col("rb.r") :+ col("rb.bucket"): _*)

  val q97CountMin: QueryDef = {
    val D = 4 // hash rows
    val TOPQ = 20 // probed tokens: top-20 by true frequency
    QueryDef(
      "q97_countmin",
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |rb AS (
         |  SELECT tok, r,
         |    ('0x' || substring(md5('cm' || CAST(r AS VARCHAR) || ':' || tok), 1, 2))::INT AS bucket
         |  FROM t, unnest(range(0, $D)) AS u(r)),
         |cms AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt FROM rb GROUP BY 1, 2),
         |tc AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt FROM t
         |  GROUP BY tok ORDER BY true_cnt DESC, tok LIMIT $TOPQ),
         |qb AS (
         |  SELECT tok, true_cnt, r,
         |    ('0x' || substring(md5('cm' || CAST(r AS VARCHAR) || ':' || tok), 1, 2))::INT AS bucket
         |  FROM tc, unnest(range(0, $D)) AS u(r))
         |SELECT q.tok, q.true_cnt, min(c.cnt) AS est_cnt
         |FROM qb q JOIN cms c USING (r, bucket)
         |GROUP BY 1, 2
         |ORDER BY true_cnt DESC, tok""".stripMargin) { (s, dir) =>
      def withBuckets(df: org.apache.spark.sql.DataFrame) = withCmsBuckets(df, D)
      val toks = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
        .select(explode(split(col("text"), " ")).as("tok"))
        .ckpt() // feeds the grid build AND the true counts
      val cms = withBuckets(toks)
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
      val tc = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("tok")).limit(TOPQ)
      withBuckets(tc)
        .join(broadcast(cms), Seq("r", "bucket"))
        .groupBy(col("tok"), col("true_cnt")).agg(min(col("cnt")).as("est_cnt"))
        .orderBy(col("true_cnt").desc, col("tok"))
    }
  }

  /** q191 — mergeable dyadic-histogram quantile sketch, gated against
    * exact truth: per event type, estimate p50/p90/p99 of the value
    * distribution from a ~21-bucket OCTAVE histogram (bucket =
    * bit-length of the milli value, i.e. [2^(b−1), 2^b) ranges, with
    * linear interpolation inside the crossing octave) and report the
    * estimate NEXT TO the exact rank-selected quantile with the
    * relative error in ppm. The octave counters are the mergeable
    * O(log range) quantile state a streaming/continuous pipeline can
    * actually keep where exact percentiles need O(distinct values)
    * — q85 bounds the sample, this bounds the HISTOGRAM; the built-in
    * gate makes the accuracy claim a measured number, not a hope
    * (q135's eval discipline applied to quantiles).
    *
    * Exactness (both engines bit-identical): the bucket is
    * length(bin(v)) — integer bit-length, no log2 float boundary
    * (floor(ln(2^k)/ln 2) rounds DOWN at exact powers in IEEE);
    * ranks are k = ⌈p·n/1000⌉ via (p·n+999)//1000 (non-negative —
    * headroom to n ≈ 9·10¹⁵); the in-octave interpolation
    * lo + ((k−cum_below−1)·(hi−lo))//cnt is all non-negative int64.
    * Requires v ≥ 0 (pinned events.value invariant) — a negative
    * value's two's-complement bit-length would land in the top
    * bucket.
    *
    * Scale design (100 TB): ONE fact pass collapses to the discrete
    * (type, milli value) histogram (the q17 weighted-percentile
    * contract), checkpointed once; the octave sketch, the per-type
    * totals, and the exact truth all derive from that bounded frame.
    * The octave window is structurally ≤ ~21 rows per type; the
    * truth side's running count rides [[ScaleRank.withRunningSum]]
    * so no task ever holds a full type's value domain. */
  val q191QuantileSketch: QueryDef = QueryDef(
    "q191_quantile_sketch",
    """WITH ev AS (
      |  SELECT event_type AS etype, CAST(floor(value * 1000) AS BIGINT) AS v
      |  FROM events),
      |vh AS (
      |  SELECT etype, v, CAST(count(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2),
      |tot AS (SELECT etype, CAST(sum(cnt) AS BIGINT) AS n FROM vh GROUP BY 1),
      |oct AS (
      |  SELECT etype, CAST(length(bin(v)) AS BIGINT) AS b,
      |    CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM vh GROUP BY 1, 2),
      |octc AS (
      |  SELECT etype, b, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY etype ORDER BY b
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM oct),
      |ps AS (SELECT CAST(p AS BIGINT) AS p FROM unnest([500, 900, 990]) AS t(p)),
      |est AS (
      |  SELECT o.etype, ps.p, t.n,
      |    (CASE WHEN o.b = 1 THEN 0 ELSE CAST(1 AS BIGINT) << (o.b - 1) END)
      |      + (((ps.p * t.n + 999) // 1000 - (o.cum - o.cnt) - 1)
      |         * ((CAST(1 AS BIGINT) << o.b)
      |            - (CASE WHEN o.b = 1 THEN 0
      |               ELSE CAST(1 AS BIGINT) << (o.b - 1) END))) // o.cnt
      |      AS est_milli
      |  FROM octc o JOIN tot t ON t.etype = o.etype CROSS JOIN ps
      |  WHERE (o.cum - o.cnt) < (ps.p * t.n + 999) // 1000
      |    AND (ps.p * t.n + 999) // 1000 <= o.cum),
      |vhc AS (
      |  SELECT h.etype, h.v,
      |    CAST(sum(h.cnt) OVER (PARTITION BY h.etype ORDER BY h.v
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM vh h),
      |ex AS (
      |  SELECT h.etype, ps.p, min(h.v) AS exact_milli
      |  FROM vhc h JOIN tot t ON t.etype = h.etype CROSS JOIN ps
      |  WHERE h.cum >= (ps.p * t.n + 999) // 1000
      |  GROUP BY 1, 2)
      |SELECT e.etype AS event_type, e.p AS p_mille, e.n,
      |  e.est_milli, x.exact_milli,
      |  (1000000 * abs(e.est_milli - x.exact_milli))
      |    // greatest(x.exact_milli, 1) AS err_ppm
      |FROM est e JOIN ex x ON x.etype = e.etype AND x.p = e.p
      |ORDER BY event_type, p_mille""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.{Window => W}
    val vh = Tables.events(s, dir)
      .select(col("event_type").as("etype"),
        floor(col("value") * 1000).cast("bigint").as("v"))
      .groupBy(col("etype"), col("v")).agg(count(lit(1)).as("cnt"))
      // ONE fact collapse (bounded by the discrete milli domain)
      // feeds the sketch, the totals, and the truth
      .ckpt()
    val tot = vh.groupBy(col("etype")).agg(sum(col("cnt")).as("n"))
    val oct = vh
      .groupBy(col("etype"), length(bin(col("v"))).cast("bigint").as("b"))
      .agg(sum(col("cnt")).as("cnt"))
    // <= ~21 octaves per type: structurally bounded window
    val octc = oct.withColumn("cum", sum(col("cnt")).over(
      W.partitionBy(col("etype")).orderBy(col("b"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
    val est = octc.join(broadcast(tot), "etype")
      .withColumn("p", explode(array(lit(500L), lit(900L), lit(990L))))
      .withColumn("k", expr("(p * n + 999) div 1000"))
      .where(expr("cum - cnt < k AND k <= cum"))
      .select(col("etype"), col("p"), col("n"),
        expr("""(CASE WHEN b = 1 THEN 0L ELSE shiftleft(CAST(1 AS BIGINT), CAST(b AS INT) - 1) END)
               |  + ((k - (cum - cnt) - 1)
               |     * (shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))
               |        - (CASE WHEN b = 1 THEN 0L
               |           ELSE shiftleft(CAST(1 AS BIGINT), CAST(b AS INT) - 1) END))) div cnt
               |""".stripMargin.replace("\n", " ")).as("est_milli"))
    val vhc = ScaleRank.withRunningSum(
      vh, Seq("etype"), Seq(col("v")), col("cnt"), "cum")
    val ex = vhc.join(broadcast(tot), "etype")
      .withColumn("p", explode(array(lit(500L), lit(900L), lit(990L))))
      .where(expr("cum >= (p * n + 999) div 1000"))
      .groupBy(col("etype"), col("p")).agg(min(col("v")).as("exact_milli"))
    est.join(ex, Seq("etype", "p"))
      .select(col("etype").as("event_type"), col("p").as("p_mille"),
        col("n"), col("est_milli"), col("exact_milli"),
        expr("(1000000 * abs(est_milli - exact_milli)) div greatest(exact_milli, 1)")
          .as("err_ppm"))
      .orderBy("event_type", "p_mille")
  }

  /** q206 — sketch-rollup cube: per-day KMV-256 sketches of the
    * distinct-user hash stream, MERGED up to weekly estimates — the
    * pre-aggregation pattern every OLAP cube at 100 TB runs on
    * (store a bounded sketch per fine-grain cell; answer coarse
    * grains by merging sketches, never rescanning facts). The weekly
    * estimate is compared against the exact weekly distinct count in
    * the same report.
    *
    * Correctness rests on the KMV merge identity: bottom-k of a union
    * equals bottom-k of the per-part bottom-ks, so the oracle can
    * (and does) compute the weekly bottom-256 DIRECTLY while the
    * Spark plan goes through the day-sketch indirection — a hash
    * match proves the rollup is lossless, not approximately right.
    * Hashes are the md5-prefix 60-bit integers both engines compute
    * bit-identically (the q36 contract), and the estimator is the
    * same (k−1)/x_(k) closed form.
    *
    * Scale design (100 TB): the day-grain sketch aggregate is
    * partial-aggregable with O(k) state per cell; the week merge
    * exchanges only |days|·k hashes — the fact table never shuffles;
    * exact-vs-estimate is a per-week equi-join on a calendar-bounded
    * key. (The exact branch exists to GRADE the sketch; a production
    * cube would ship only the sketch path.) */
  val q206SketchRollup: QueryDef = QueryDef(
    "q206_sketch_rollup",
    """WITH h AS (
      |  SELECT DISTINCT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT week, h,
      |    row_number() OVER (PARTITION BY week ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY week) AS nh
      |  FROM h),
      |e AS (
      |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact
      |  FROM events GROUP BY 1),
      |kth AS (SELECT week, h AS hk FROM r WHERE rn = 256),
      |nhs AS (SELECT week, CAST(max(nh) AS BIGINT) AS nh FROM r GROUP BY 1)
      |SELECT e.week, e.exact,
      |  round(CASE WHEN kth.hk IS NULL THEN CAST(nhs.nh AS DOUBLE)
      |             ELSE 255.0 / (CAST(kth.hk AS DOUBLE) / 1152921504606846976.0)
      |        END, 1) AS kmv_est
      |FROM e JOIN nhs USING (week) LEFT JOIN kth USING (week)
      |ORDER BY e.week""".stripMargin) { (s, dir) =>
    val sketch = udaf(KmvSketch(256))
    val est = udaf(Kmv(256, hashBits = 60))
    val ev = Tables.events(s, dir).select(
      date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
      date_trunc("day", col("ts")).as("day"),
      conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"),
      col("user_id"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(sketch(col("h")).as("sk"))
    val weekly = daily
      .select(col("week"), explode(col("sk")).as("h"))
      .groupBy(col("week"))
      .agg(round(est(col("h")), 1).as("kmv_est"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("exact"))
    exact.join(weekly, Seq("week"))
      .select(col("week"), col("exact"), col("kmv_est"))
      .orderBy("week")
  }

  /** q228 — AMS (Alon–Matias–Szegedy) F2 sketch: estimate the second
    * frequency moment Σ f_k² of the part-key stream — the SELF-JOIN
    * SIZE of lineitem on l_partkey, the statistic a cost-based
    * optimizer needs to size a join without computing it. 16
    * deterministic ±1 projections X_j = Σ_k f_k·σ_j(k); the estimator
    * is the textbook median-of-means over 4 groups of 4, reported
    * against the exact F2 with the relative error in ppm.
    *
    * Exactness: σ_j(k) is the parity of the first md5 hex digit of
    * "j#k" (the q36 md5-integer contract — bit-identical in both
    * engines); every X_j, square, mean and the median-of-4
    * ((Σ − min − max) div 2 — closed form, no sort, no window) is
    * int64 arithmetic with non-negative floor-divs. Headroom:
    * X_j² ≤ (Σf)² — int64-safe through ~3·10⁹ rows; past that the
    * squares lift to DECIMAL(38) (q154 contract).
    *
    * Scale design (100 TB): ONE pass to the (key, f) grain — the only
    * fact-sized exchange; the ×16 projection axis expands the BOUNDED
    * key frame map-side into 16 partial sums (broadcast cross join);
    * exact F2 (the verification arm) rides the same key frame. At
    * production scale you keep the sketch and DROP the exact arm —
    * the sketch is one pass and 16 counters regardless of key
    * cardinality. */
  val q228F2Sketch: QueryDef = QueryDef(
    "q228_f2_sketch",
    """WITH f AS (
      |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS f
      |  FROM lineitem GROUP BY l_partkey),
      |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |              CAST(sum(f * f) AS BIGINT) AS exact_f2 FROM f),
      |js AS (SELECT CAST(unnest(range(16)) AS BIGINT) AS j),
      |x AS (
      |  SELECT js.j,
      |    CAST(sum(f.f * (1 - 2 * (('0x' || substring(md5(
      |      CAST(js.j AS VARCHAR) || '#' || CAST(f.k AS VARCHAR)), 1, 1))::BIGINT % 2)))
      |      AS BIGINT) AS xj
      |  FROM f CROSS JOIN js GROUP BY js.j),
      |grp AS (
      |  SELECT j // 4 AS g, CAST(sum(xj * xj) // 4 AS BIGINT) AS mean_g
      |  FROM x GROUP BY j // 4),
      |med AS (
      |  SELECT CAST((sum(mean_g) - min(mean_g) - max(mean_g)) // 2 AS BIGINT) AS est_f2
      |  FROM grp)
      |SELECT ex.n_keys, ex.exact_f2, med.est_f2,
      |  CAST((1000000 * abs(med.est_f2 - ex.exact_f2)) // ex.exact_f2 AS BIGINT) AS err_ppm
      |FROM ex, med""".stripMargin) { (s, dir) =>
    val f = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("f"))
      .ckpt() // feeds the exact arm AND the 16 projections
    val ex = f.agg(count(lit(1)).as("n_keys"),
      sum(col("f") * col("f")).as("exact_f2"))
    val js = s.range(16).select(col("id").as("j"))
    val sign = lit(1) - lit(2) *
      (conv(substring(md5(concat(col("j").cast("string"), lit("#"),
        col("k").cast("string"))), 1, 1), 16, 10).cast("long") % 2)
    val x = f.crossJoin(broadcast(js))
      .select(col("j"), (col("f") * sign).as("term"))
      .groupBy("j").agg(sum("term").as("xj"))
    val grp = x.groupBy(expr("j div 4").as("g"))
      .agg(expr("sum(xj * xj) div 4").as("mean_g"))
    val med = grp.agg(
      expr("(sum(mean_g) - min(mean_g) - max(mean_g)) div 2").as("est_f2"))
    ex.crossJoin(broadcast(med))
      .select(col("n_keys"), col("exact_f2"), col("est_f2"),
        expr("(1000000 * abs(est_f2 - exact_f2)) div exact_f2").as("err_ppm"))
  }

  /** q231 — join-cardinality estimation report: the orders ⋈ lineitem
    * equi-join on orderkey, sized three ways WITHOUT materializing the
    * join — (a) exactly, as Σ_k f_o(k)·f_l(k) over the two key
    * histograms; (b) the System R independence estimate
    * n_o·n_l / max(d_o, d_l) every cost-based optimizer starts from;
    * (c) the AGM / Cauchy–Schwarz upper bound √(F2_o·F2_l) that the
    * q228 sketch estimates in one pass. The "can I trust the
    * optimizer's row estimate" audit, and the companion that gives
    * q228's F2 its use-case.
    *
    * Exactness: histograms, frequency moments and the exact join size
    * are int64 arithmetic (Σ f_o·f_l ≤ n_l·max f_o — safe while the
    * hottest key's product sum < 2⁶³); the System R estimate is a
    * non-negative floor-div; only the √ bound is a 1-row IEEE chain
    * (q124 contract).
    *
    * Scale design (100 TB): each side collapses ONCE to its (key, f)
    * histogram — the only fact-sized exchanges; the exact arm is an
    * equi-join of the two bounded histograms (never of the facts);
    * the report is one row. */
  val q231JoinCardinality: QueryDef = QueryDef(
    "q231_join_cardinality",
    """WITH fo AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS f
      |           FROM orders GROUP BY 1),
      |fl AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS f
      |       FROM lineitem GROUP BY 1),
      |so AS (SELECT CAST(count(*) AS BIGINT) AS d_o, CAST(sum(f) AS BIGINT) AS n_o,
      |              CAST(sum(f * f) AS BIGINT) AS f2_o FROM fo),
      |sl AS (SELECT CAST(count(*) AS BIGINT) AS d_l, CAST(sum(f) AS BIGINT) AS n_l,
      |              CAST(sum(f * f) AS BIGINT) AS f2_l FROM fl),
      |ex AS (SELECT CAST(coalesce(sum(fo.f * fl.f), 0) AS BIGINT) AS exact_join
      |       FROM fo JOIN fl ON fo.k = fl.k)
      |SELECT so.n_o, sl.n_l, so.d_o, sl.d_l, ex.exact_join,
      |  CAST((so.n_o * sl.n_l) // greatest(so.d_o, sl.d_l) AS BIGINT) AS sysr_est,
      |  CAST(floor(sqrt(CAST(so.f2_o AS DOUBLE) * CAST(sl.f2_l AS DOUBLE)))
      |    AS BIGINT) AS agm_bound,
      |  CAST((1000000 * abs(CAST((so.n_o * sl.n_l) // greatest(so.d_o, sl.d_l)
      |    AS BIGINT) - ex.exact_join)) // ex.exact_join AS BIGINT) AS sysr_err_ppm
      |FROM so, sl, ex""".stripMargin) { (s, dir) =>
    val fo = Tables.orders(s, dir)
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("f"))
      .ckpt() // feeds the moment arm AND the exact join
    val fl = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("f"))
      .ckpt()
    val so = fo.agg(count(lit(1)).as("d_o"), sum("f").as("n_o"),
      sum(col("f") * col("f")).as("f2_o"))
    val sl = fl.agg(count(lit(1)).as("d_l"), sum("f").as("n_l"),
      sum(col("f") * col("f")).as("f2_l"))
    val ex = fo.join(fl.withColumnRenamed("f", "f_l"), "k")
      .agg(coalesce(sum(col("f") * col("f_l")), lit(0L)).as("exact_join"))
    so.crossJoin(broadcast(sl)).crossJoin(broadcast(ex))
      .select(col("n_o"), col("n_l"), col("d_o"), col("d_l"), col("exact_join"),
        expr("(n_o * n_l) div greatest(d_o, d_l)").as("sysr_est"),
        floor(sqrt(col("f2_o").cast("double") * col("f2_l").cast("double")))
          .cast("bigint").as("agm_bound"),
        expr("(1000000 * abs((n_o * n_l) div greatest(d_o, d_l) - exact_join)) div exact_join")
          .as("sysr_err_ppm"))
  }

  /** q279 — System R join-order report for the filtered 3-table
    * chain σ_{seg='BUILDING'}(customer) ⋈ orders ⋈ lineitem: both
    * join orders are costed with the textbook estimator (filter
    * selectivity 1/V(segment); join size |R|·|S| /
    * max(V(key,R), V(key,S)) with V from exact ANALYZE-style
    * distinct counts), the cheaper intermediate is chosen, and both
    * plans' ESTIMATED intermediate/final sizes sit next to the
    * ACTUAL ones — q231 audits the 2-way estimator; this is the
    * decision the estimator exists for, including how wrong it was.
    *
    * Exactness: catalog stats are exact counts; every estimate is a
    * non-negative integer floor-div chain (numerators ≤ |O|·|L|,
    * DECIMAL/HUGEINT internally); actuals are exact join counts;
    * the choice is min-estimate with a fixed plan-name tiebreak.
    *
    * Scale design (100 TB): the catalog pass is partial-aggregable
    * distinct counts; the two actual-size probes are the joins a
    * cost model would AVOID replaying in production — here they ARE
    * the audit, each one equi-join + count, no windows, no
    * collect. */
  val q279JoinOrder: QueryDef = QueryDef(
    "q279_join_order",
    """WITH st AS (
      |  SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS nc,
      |    (SELECT CAST(count(DISTINCT c_mktsegment) AS BIGINT) FROM customer) AS vseg,
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS no,
      |    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS vco,
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nl,
      |    (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS vol),
      |est AS (
      |  SELECT nc // vseg AS est_sc,
      |    ((nc // vseg) * no) // greatest(nc // vseg, vco) AS est_co,
      |    (CAST(no AS HUGEINT) * nl) // greatest(no, vol) AS est_ol,
      |    nc, no, nl, vseg, vco, vol
      |  FROM st),
      |est2 AS (
      |  SELECT est_co AS est_inter_p1,
      |    CAST((CAST(est_co AS HUGEINT) * nl) // greatest(no, vol) AS BIGINT)
      |      AS est_final_p1,
      |    CAST(est_ol AS BIGINT) AS est_inter_p2,
      |    CAST((est_ol * (nc // vseg)) // greatest(nc // vseg, vco) AS BIGINT)
      |      AS est_final_p2
      |  FROM est),
      |sc AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |aco AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM sc
      |  JOIN orders ON sc.c_custkey = o_custkey),
      |aol AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM orders
      |  JOIN lineitem ON o_orderkey = l_orderkey),
      |afin AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM sc
      |  JOIN orders ON sc.c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey)
      |SELECT plan, est_intermediate, act_intermediate, est_final, act_final,
      |  CAST(CASE WHEN (SELECT est_inter_p1 FROM est2) <=
      |            (SELECT est_inter_p2 FROM est2)
      |    THEN CASE WHEN plan = 'co_then_l' THEN 1 ELSE 0 END
      |    ELSE CASE WHEN plan = 'ol_then_c' THEN 1 ELSE 0 END
      |  END AS BIGINT) AS chosen
      |FROM (
      |  SELECT 'co_then_l' AS plan,
      |    (SELECT CAST(est_inter_p1 AS BIGINT) FROM est2) AS est_intermediate,
      |    (SELECT n FROM aco) AS act_intermediate,
      |    (SELECT est_final_p1 FROM est2) AS est_final,
      |    (SELECT n FROM afin) AS act_final
      |  UNION ALL
      |  SELECT 'ol_then_c',
      |    (SELECT est_inter_p2 FROM est2),
      |    (SELECT n FROM aol),
      |    (SELECT est_final_p2 FROM est2),
      |    (SELECT n FROM afin))
      |ORDER BY plan""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val st = c.agg(count(lit(1)).as("nc"),
        countDistinct(col("c_mktsegment")).as("vseg"))
      .crossJoin(o.agg(count(lit(1)).as("no"),
        countDistinct(col("o_custkey")).as("vco")))
      .crossJoin(l.agg(count(lit(1)).as("nl"),
        countDistinct(col("l_orderkey")).as("vol")))
    val est = st.select(
      expr("nc div vseg").as("est_sc"),
      expr("((nc div vseg) * no) div greatest(nc div vseg, vco)").as("est_co"),
      expr("(cast(no as decimal(38,0)) * nl) div greatest(no, vol)").as("est_ol"),
      col("nc"), col("no"), col("nl"), col("vseg"), col("vco"), col("vol"))
    val est2 = est.select(
      col("est_co").as("est_inter_p1"),
      expr("cast((cast(est_co as decimal(38,0)) * nl) div greatest(no, vol) as bigint)")
        .as("est_final_p1"),
      col("est_ol").cast("bigint").as("est_inter_p2"),
      expr("cast((est_ol * (nc div vseg)) div greatest(nc div vseg, vco) as bigint)")
        .as("est_final_p2")).ckpt()
    val sc = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val aco = sc.join(o, col("c_custkey") === col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    val aol = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val afin = sc.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val p1 = est2.crossJoin(broadcast(aco.withColumnRenamed("n", "act_i")))
      .crossJoin(broadcast(afin.withColumnRenamed("n", "act_f")))
      .select(lit("co_then_l").as("plan"),
        col("est_inter_p1").as("est_intermediate"),
        col("act_i").as("act_intermediate"),
        col("est_final_p1").as("est_final"), col("act_f").as("act_final"),
        col("est_inter_p1"), col("est_inter_p2"))
    val p2 = est2.crossJoin(broadcast(aol.withColumnRenamed("n", "act_i")))
      .crossJoin(broadcast(afin.withColumnRenamed("n", "act_f")))
      .select(lit("ol_then_c").as("plan"),
        col("est_inter_p2").as("est_intermediate"),
        col("act_i").as("act_intermediate"),
        col("est_final_p2").as("est_final"), col("act_f").as("act_final"),
        col("est_inter_p1"), col("est_inter_p2"))
    p1.unionByName(p2)
      .select(col("plan"), col("est_intermediate"), col("act_intermediate"),
        col("est_final"), col("act_final"),
        when(col("est_inter_p1") <= col("est_inter_p2"),
          when(col("plan") === "co_then_l", 1L).otherwise(0L))
          .otherwise(when(col("plan") === "ol_then_c", 1L).otherwise(0L))
          .as("chosen"))
      .orderBy("plan")
  }

  /** q287 — join-size estimation by CORRELATED (key-universe)
    * sampling vs naive independent row sampling: both estimators
    * spend the same 1/64 budget on orders ⋈ lineitem, but the
    * universe sampler hashes the JOIN KEY (both sides keep the same
    * 1/64 of keys, so sampled keys join at full fan-out — unbiased
    * with low variance), while the row sampler thins each side
    * independently (matching pairs survive with probability 1/64²,
    * so the estimate rides a handful of lucky collisions). The
    * side-by-side error is THE argument for universe sampling in
    * every modern optimizer's sample-based estimator. Completes the
    * estimation suite: q231 (histogram formulas), q268 (range
    * selectivity), q279 (join ordering) — this is the sampling
    * alternative those formulas compete with.
    *
    * Exactness: both samples are md5-prefix hash predicates (the
    * q36 portable-RNG contract — identical membership in both
    * engines); counts are exact; estimates are integer scale-ups;
    * errors are non-negative ppm floor-divs against the exact join
    * size.
    *
    * Scale design (100 TB): the sample predicates push into the
    * scans; each sampled join is an equi-join over ~1/64 (universe)
    * or ~1/64-per-side (row) of the data; the exact control join is
    * the audit's cost, not the estimator's. No windows, no
    * collect. */
  val q287SamplingJoinEst: QueryDef = QueryDef(
    "q287_sampling_join_est",
    """WITH ou AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 64 = 0),
      |lu AS (
      |  SELECT l_orderkey FROM lineitem
      |  WHERE ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT % 64 = 0),
      |orr AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE ('0x' || substring(md5('o|' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 64 = 0),
      |lr AS (
      |  SELECT l_orderkey FROM lineitem
      |  WHERE ('0x' || substring(md5('l|' || CAST(l_orderkey AS VARCHAR) || '#'
      |    || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 64 = 0),
      |ju AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ou
      |       JOIN lu ON o_orderkey = l_orderkey),
      |jr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orr
      |       JOIN lr ON o_orderkey = l_orderkey),
      |ex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders
      |       JOIN lineitem ON o_orderkey = l_orderkey)
      |SELECT method, sample_join_rows, est_rows, actual_rows,
      |  (1000000 * abs(est_rows - actual_rows)) // greatest(actual_rows, 1)
      |    AS err_ppm
      |FROM (
      |  SELECT 'universe' AS method, ju.n AS sample_join_rows,
      |    ju.n * 64 AS est_rows, ex.n AS actual_rows FROM ju, ex
      |  UNION ALL
      |  SELECT 'row', jr.n, jr.n * 4096, ex.n FROM jr, ex)
      |ORDER BY method""".stripMargin) { (s, dir) =>
    def keyHashMod(c: org.apache.spark.sql.Column,
        m: Int): org.apache.spark.sql.Column =
      expr(s"cast(conv(substring(md5(cast(${c.toString} as string)), 1, 15), " +
        s"16, 10) as bigint) % $m")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val ou = o.filter(keyHashMod(col("o_orderkey"), 64) === 0)
      .select(col("o_orderkey"))
    val lu = l.filter(keyHashMod(col("l_orderkey"), 64) === 0)
      .select(col("l_orderkey"))
    val orr = o.filter(expr(
      "cast(conv(substring(md5(concat('o|', cast(o_orderkey as string))), " +
        "1, 15), 16, 10) as bigint) % 64") === 0)
      .select(col("o_orderkey"))
    val lr = l.filter(expr(
      "cast(conv(substring(md5(concat('l|', cast(l_orderkey as string), '#', " +
        "cast(l_linenumber as string))), 1, 15), 16, 10) as bigint) % 64") === 0)
      .select(col("l_orderkey"))
    val ju = ou.join(lu, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val jr = orr.join(lr, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val ex = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val u = ju.crossJoin(broadcast(ex.withColumnRenamed("n", "actual")))
      .select(lit("universe").as("method"), col("n").as("sample_join_rows"),
        (col("n") * 64).as("est_rows"), col("actual").as("actual_rows"))
    val r = jr.crossJoin(broadcast(ex.withColumnRenamed("n", "actual")))
      .select(lit("row").as("method"), col("n").as("sample_join_rows"),
        (col("n") * 4096).as("est_rows"), col("actual").as("actual_rows"))
    u.unionByName(r)
      .select(col("method"), col("sample_join_rows"), col("est_rows"),
        col("actual_rows"),
        expr("(1000000 * abs(est_rows - actual_rows)) div greatest(actual_rows, 1)")
          .as("err_ppm"))
      .orderBy("method")
  }

  /** q318 — Bloom-filter false-positive audit: build an m=4096-bit,
    * k=3 Bloom filter over the customers who have orders, probe it
    * with an equal-sized disjoint key space (guaranteed non-members
    * at every SF and under value-domain fuzz), and report the measured
    * false-positive rate next to the theoretical
    * (1 − (1−1/m)^{kn})^k — the calibration check run before trusting
    * a Bloom-pruned join (q68 USES a Bloom filter; this measures
    * whether its advertised FPR holds on real keys). An inflated
    * measured rate flags correlated hash positions — the failure mode
    * that silently destroys Bloom-join selectivity.
    *
    * Exactness: positions are md5-prefix mods (portable coins, k
    * independent salts); membership and FP counts are pure integers;
    * the theoretical rate is ONE shared exp/ln IEEE chain (the
    * engines' ln/exp have matched bitwise across the whole q83/q181
    * family) floored to ppm.
    *
    * Scale design (100 TB): member keys collapse to ≤ m occupied-bit
    * rows (partial-aggregable DISTINCT), which BROADCAST into the
    * probe-side explode (3 rows per probe, grouped back per probe) —
    * the probe side never shuffles more than (probe, j) pairs; the
    * verdict is a 1-row fold. Output 1 row. */
  val q318BloomFpr: QueryDef = {
    val M = 4096
    val K = 3
    val theo =
      s"CAST(floor(1e6 * exp(${K}e0 * ln(1e0 - exp(${K}e0 *" +
        s" CAST(n_members AS DOUBLE) * ln(1e0 - 1e0 / ${M}e0))))) AS BIGINT)"
    QueryDef(
      "q318_bloom_fpr",
      s"""WITH mem AS (SELECT DISTINCT o_custkey AS key FROM orders),
         |nonmem AS (SELECT 'p' || c_custkey AS key FROM customer),
         |occ AS (
         |  SELECT DISTINCT
         |    ('0x' || substring(md5('bf' || j || '_' || key), 1, 15))::BIGINT
         |      % $M AS pos
         |  FROM mem, unnest([${(0 until K).mkString(", ")}]) AS u(j)),
         |probe AS (
         |  SELECT key,
         |    ('0x' || substring(md5('bf' || j || '_' || key), 1, 15))::BIGINT
         |      % $M AS pos
         |  FROM nonmem, unnest([${(0 until K).mkString(", ")}]) AS u(j)),
         |hit AS (
         |  SELECT p.key, count(o.pos) AS hits
         |  FROM probe p LEFT JOIN occ o ON p.pos = o.pos
         |  GROUP BY p.key),
         |f AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_members,
         |    CAST(count(*) AS BIGINT) AS n_probes,
         |    CAST(sum(CASE WHEN hits = $K THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_fp,
         |    (SELECT CAST(count(*) AS BIGINT) FROM occ) AS bits_set
         |  FROM hit)
         |SELECT n_members, n_probes, n_fp, bits_set,
         |  (1000000 * n_fp) // n_probes AS measured_ppm,
         |  $theo AS theo_ppm
         |FROM f""".stripMargin) { (s, dir) =>
      def pos(key: org.apache.spark.sql.Column,
          j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        conv(substring(md5(concat(lit("bf"), j.cast("string"), lit("_"),
          key.cast("string"))), 1, 15), 16, 10).cast("bigint") % M
      val js = explode(array((0 until K).map(j => lit(j)): _*)).as("j")
      val mem = Tables.orders(s, dir).select(col("o_custkey").as("key"))
        .distinct().ckpt() // feeds the filter build AND the member count
      val nonmem = Tables.customer(s, dir)
        .select(concat(lit("p"), col("c_custkey").cast("string")).as("key"))
      val occ = broadcast(mem.select(col("key"), js)
        .select(pos(col("key"), col("j")).as("pos")).distinct())
      val hit = nonmem.select(col("key"), js)
        .select(col("key"), pos(col("key"), col("j")).as("pos"))
        .join(occ.select(col("pos").as("opos")),
          col("pos") === col("opos"), "left")
        .groupBy(col("key")).agg(count(col("opos")).as("hits"))
      val nm = mem.agg(count(lit(1)).as("n_members"))
      val bs = occ.agg(count(lit(1)).as("bits_set"))
      hit.agg(count(lit(1)).as("n_probes"),
          sum(when(col("hits") === K, 1L).otherwise(0L)).as("n_fp"))
        .crossJoin(broadcast(nm)).crossJoin(broadcast(bs))
        .select(col("n_members"), col("n_probes"), col("n_fp"),
          col("bits_set"),
          expr("(1000000 * n_fp) div n_probes").as("measured_ppm"),
          expr(theo).as("theo_ppm"))
    }
  }

  /** q369 — HyperLogLog distinct estimate per returnflag next to the
    * exact count (Flajolet et al. '07), closing the sketch family's
    * one gap: [[Kmv]] keeps k VALUES, HLL keeps m=64 REGISTERS — the
    * fixed-size state every warehouse's approx_count_distinct ships,
    * mergeable by elementwise max. Spark's own HLL is not
    * engine-portable, so like q36 this builds the sketch from the
    * 60-bit md5-prefix hash both engines compute identically: bucket =
    * top 6 bits, register = max over the bucket of the leading-zero
    * rank of the low 54 bits, estimate = α₆₄·m²/Σ2^(−M_j) with the
    * linear-counting small-range correction.
    *
    * Exactness: ranks are integer string-length arithmetic (bin/conv
    * — no log2 floats, the q191 octave discipline); the harmonic sum
    * is held as the EXACT integer numerator Σ2^(55−M_j) over the 2^55
    * common denominator (max 64·2^55 < 2^61), so the estimate is ONE
    * IEEE double chain from integers; missing buckets contribute 2^55
    * exactly, and V = 64 − present buckets drives the correction
    * branch. Bit-identical in DuckDB.
    *
    * Scale design (100 TB): distinct(flag, key) collapses map-side;
    * the register build is two partial-aggregable groupBys
    * ((flag, bucket) max-rank, then ≤64 rows per flag); state per
    * group is 64 longs no matter the input — the entire point. */
  val q369Hll: QueryDef = {
    val M = 64 // registers (b = 6 bucket bits, 54 rank bits)
    val ALPHA = 0.709 // α for m = 64 (Flajolet '07 Table 1 regime)
    // scientific-notation literals: DOUBLE in BOTH engines (bare
    // decimals parse as DECIMAL in DuckDB and overflow the product)
    val estD = s"($ALPHA" + "e0 * 64.0e0 * 64.0e0 * 36028797018963968.0e0)" +
      " / CAST(num AS DOUBLE)"
    val corrD = s"CASE WHEN ($estD) <= 160.0e0 AND v > 0 " +
      s"THEN 64.0e0 * ln(64.0e0 / CAST(v AS DOUBLE)) ELSE ($estD) END"
    QueryDef(
      "q369_hll",
      s"""WITH h AS (
         |  SELECT DISTINCT l_returnflag AS flag,
         |    ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM lineitem),
         |rk AS (
         |  SELECT flag, h // 18014398509481984 AS bucket,
         |    CASE WHEN h % 18014398509481984 = 0 THEN 55
         |         ELSE 55 - length(bin(h % 18014398509481984)) END AS r
         |  FROM h),
         |reg AS (
         |  SELECT flag, bucket, max(r) AS m FROM rk GROUP BY 1, 2),
         |agg AS (
         |  SELECT flag,
         |    CAST(sum(1::BIGINT << (55 - m)) +
         |      ($M - count(*)) * (1::BIGINT << 55) AS BIGINT) AS num,
         |    CAST($M - count(*) AS BIGINT) AS v
         |  FROM reg GROUP BY 1),
         |e AS (
         |  SELECT l_returnflag AS flag, count(DISTINCT l_orderkey) AS exact
         |  FROM lineitem GROUP BY 1)
         |SELECT e.flag AS l_returnflag, e.exact, agg.v AS v_zero,
         |  CAST(floor($corrD) AS BIGINT) AS hll_est
         |FROM e JOIN agg USING (flag) ORDER BY 1""".stripMargin) { (s, dir) =>
      val keys = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), col("l_orderkey"))
        .distinct()
        .select(col("flag"),
          conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
      val reg = keys
        .select(col("flag"), expr("h div 18014398509481984").as("bucket"),
          when(col("h") % 18014398509481984L === 0, lit(55))
            .otherwise(lit(55) -
              length(bin(col("h") % 18014398509481984L))).as("r"))
        .groupBy(col("flag"), col("bucket")).agg(max(col("r")).as("m"))
      val agg = reg.groupBy(col("flag"))
        .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")) +
          (lit(M) - count(lit(1))) * lit(36028797018963968L))
          .cast("bigint").as("num"),
          (lit(M) - count(lit(1))).cast("bigint").as("v"))
      val exact = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct(col("l_orderkey")).as("exact"))
      exact.join(agg, Seq("flag"))
        .select(col("flag").as("l_returnflag"), col("exact"), col("v").as("v_zero"),
          floor(expr(corrD)).cast("bigint").as("hll_est"))
        .orderBy("l_returnflag")
    }
  }

  val all: Seq[QueryDef] =
    Seq(q36KmvSketch, q67HeavyHitters, q85SampleQuantiles, q88ThetaSketch,
      q97CountMin, q191QuantileSketch, q206SketchRollup, q228F2Sketch,
      q231JoinCardinality, q279JoinOrder, q287SamplingJoinEst, q318BloomFpr,
      q369Hll)
}
