package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * so a scan filtered on ANY clustered dimension skips most files,
  * where a single-column sort only serves its own leading column.
  * This is how lakehouse table formats cluster 100 TB tables for
  * selective scans: interleave the bits of the dimensions' bucket
  * ranks, range-partition + sort by the interleaved value, and let
  * per-file min/max statistics prune.
  *
  * Everything here is plain integer arithmetic (`div`/`%`/`*`), no
  * engine-specific bit operators, so the DuckDB oracle replays the
  * curve exactly.
  */
object Layout {

  /** Bit-interleave two `bits`-bit non-negative int columns into the
    * Morton code: dim-a occupies even bits, dim-b odd. Built from
    * div/mod/multiply only — a constant 2·bits plan terms, portable
    * to any SQL engine. */
  def zval(a: String, b: String, bits: Int): Column =
    (0 until bits).map { i =>
      val w = 1L << i
      (expr(s"($a div $w) % 2") * lit(1L << (2 * i))) +
        (expr(s"($b div $w) % 2") * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The matching DuckDB SQL text for [[zval]] (integer `//` division). */
  def zvalSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      val w = 1L << i
      s"(($a // $w) % 2) * ${1L << (2 * i)} + (($b // $w) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** q93: z-order the part table on (size, price-bucket), cut the
    * curve into 16 equal "files", and emit each file's min/max box on
    * both dimensions — the exact statistics a scan planner prunes by.
    * Tight boxes on BOTH dims are the proof the layout works; the
    * single-dim-sorted counterfactual (one dim tight, the other
    * spanning the full range) is pinned in LayoutSpec. */
  val q93ZOrder: QueryDef = {
    val FILES = 16
    val ROWS_PER_FILE = 125 // 2000 parts at sf0.01; any remainder joins the last file
    QueryDef(
      "q93_zorder",
      s"""WITH d AS (
         |  SELECT p_partkey, p_size - 1 AS sz,
         |    CAST(floor((p_retailprice - 900.0) * 64.0 / 100.0) AS BIGINT) AS pb
         |  FROM part),
         |z AS (
         |  SELECT p_partkey, sz, pb, ${zvalSql("sz", "pb", 6)} AS zv FROM d),
         |f AS (
         |  SELECT sz, pb,
         |    (row_number() OVER (ORDER BY zv, p_partkey) - 1) // $ROWS_PER_FILE AS file_id
         |  FROM z)
         |SELECT CAST(least(file_id, ${FILES - 1}) AS BIGINT) AS file_id,
         |  count(*) AS n,
         |  CAST(min(sz) AS BIGINT) AS min_sz, CAST(max(sz) AS BIGINT) AS max_sz,
         |  CAST(min(pb) AS BIGINT) AS min_pb, CAST(max(pb) AS BIGINT) AS max_pb
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val d = Tables.part(s, dir).select(
        col("p_partkey"),
        (col("p_size") - 1).cast("long").as("sz"),
        floor((col("p_retailprice") - lit(900.0)) * lit(64.0) / lit(100.0))
          .cast("long").as("pb"))
      val z = d.withColumn("zv", zval("sz", "pb", 6))
      // the layout step at scale is repartitionByRange(zv) +
      // sortWithinPartitions(zv) on the write; the gate reproduces the
      // same global order relationally via ScaleRank's two-level
      // chunked rank — no single-task global Sort of the table
      ScaleRank.withRowNumber(z, Seq.empty,
          Seq(col("zv"), col("p_partkey")), "rn", "__nr")
        .withColumn("file_id",
          least(expr(s"(rn - 1) div $ROWS_PER_FILE"), lit(FILES - 1L)).cast("long"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n"),
          min(col("sz")).as("min_sz"), max(col("sz")).as("max_sz"),
          min(col("pb")).as("min_pb"), max(col("pb")).as("max_pb"))
        .orderBy("file_id")
    }
  }

  /** Files whose [min,max] box intersects the query box — what a
    * min/max-statistics pruner would scan. */
  private[graft] def filesScanned(
      stats: DataFrame,
      szRange: Option[(Long, Long)], pbRange: Option[(Long, Long)]): Long = {
    val szHit = szRange.map { case (lo, hi) =>
      col("max_sz") >= lo && col("min_sz") <= hi
    }.getOrElse(lit(true))
    val pbHit = pbRange.map { case (lo, hi) =>
      col("max_pb") >= lo && col("min_pb") <= hi
    }.getOrElse(lit(true))
    stats.filter(szHit && pbHit).count()
  }

  /** q205 — zone-map pruning audit: cut the lineitem fact into
    * 1000-row "row groups" under two physical layouts — ingestion
    * order (orderkey) and shipdate-sorted — compute each group's
    * min/max shipdate zone map, and report how many groups (and rows)
    * a `shipdate IN 1995` predicate could skip under each layout.
    * This quantifies the q93 story on the FACT table: the same
    * predicate and the same statistics machinery prune almost nothing
    * in ingestion order and almost everything after clustering by the
    * filter column — the number a table-layout decision is actually
    * made on.
    *
    * Exactness: everything is integer counts, date comparisons, and
    * one non-negative ppm floor-div.
    *
    * Scale design (100 TB): the global row numbers ride
    * [[ScaleRank.withRowNumber]] (two-level chunked rank — no
    * single-task sort of the fact in either layout); group zone maps
    * are partial-aggregable on the group id; the per-layout report is
    * a 1-row aggregate over |groups| rows. The write-side equivalent
    * at scale is repartitionByRange + sortWithinPartitions on the
    * layout key; the gate reproduces the order relationally to expose
    * the zone maps. */
  val q205ZonemapPrune: QueryDef = {
    val ROWS_PER_GROUP = 1000
    QueryDef(
      "q205_zonemap_prune",
      s"""WITH base AS (
         |  SELECT l_orderkey AS o, CAST(l_linenumber AS BIGINT) AS ln,
         |    CAST(l_shipdate AS DATE) AS sd
         |  FROM lineitem),
         |ing AS (
         |  SELECT (row_number() OVER (ORDER BY o, ln) - 1) // $ROWS_PER_GROUP AS rg, sd
         |  FROM base),
         |srt AS (
         |  SELECT (row_number() OVER (ORDER BY sd, o, ln) - 1) // $ROWS_PER_GROUP AS rg, sd
         |  FROM base),
         |zi AS (SELECT rg, min(sd) AS mn, max(sd) AS mx,
         |       CAST(count(*) AS BIGINT) AS n FROM ing GROUP BY rg),
         |zs AS (SELECT rg, min(sd) AS mn, max(sd) AS mx,
         |       CAST(count(*) AS BIGINT) AS n FROM srt GROUP BY rg),
         |r AS (
         |  SELECT 'ingest' AS layout, CAST(count(*) AS BIGINT) AS n_groups,
         |    CAST(count(CASE WHEN mx < DATE '1995-01-01'
         |                      OR mn > DATE '1995-12-31' THEN 1 END) AS BIGINT) AS pruned_groups,
         |    CAST(coalesce(sum(CASE WHEN mx < DATE '1995-01-01'
         |                             OR mn > DATE '1995-12-31' THEN n END), 0) AS BIGINT) AS rows_skipped,
         |    CAST(sum(n) AS BIGINT) AS n_rows
         |  FROM zi
         |  UNION ALL
         |  SELECT 'sorted', CAST(count(*) AS BIGINT),
         |    CAST(count(CASE WHEN mx < DATE '1995-01-01'
         |                      OR mn > DATE '1995-12-31' THEN 1 END) AS BIGINT),
         |    CAST(coalesce(sum(CASE WHEN mx < DATE '1995-01-01'
         |                             OR mn > DATE '1995-12-31' THEN n END), 0) AS BIGINT),
         |    CAST(sum(n) AS BIGINT)
         |  FROM zs)
         |SELECT layout, n_groups, pruned_groups, rows_skipped,
         |  CAST((1000000 * rows_skipped) // n_rows AS BIGINT) AS skip_ppm
         |FROM r ORDER BY layout""".stripMargin) { (s, dir) =>
      val base = Tables.lineitem(s, dir).select(
        col("l_orderkey").as("o"), col("l_linenumber").cast("bigint").as("ln"),
        col("l_shipdate").cast("date").as("sd"))
      def zone(sortCols: Seq[Column], layout: String): DataFrame =
        ScaleRank.withRowNumber(base, Seq.empty, sortCols, "rn", "nr")
          .withColumn("rg", expr(s"(rn - 1) div $ROWS_PER_GROUP"))
          .groupBy("rg")
          .agg(min("sd").as("mn"), max("sd").as("mx"),
            count(lit(1)).as("n"))
          .agg(lit(layout).as("layout"),
            count(lit(1)).as("n_groups"),
            count(when(col("mx") < lit("1995-01-01").cast("date") ||
              col("mn") > lit("1995-12-31").cast("date"), 1))
              .as("pruned_groups"),
            coalesce(sum(when(col("mx") < lit("1995-01-01").cast("date") ||
              col("mn") > lit("1995-12-31").cast("date"), col("n"))), lit(0L))
              .as("rows_skipped"),
            sum("n").as("n_rows"))
      zone(Seq(col("o"), col("ln")), "ingest")
        .unionAll(zone(Seq(col("sd"), col("o"), col("ln")), "sorted"))
        .select(col("layout"), col("n_groups"), col("pruned_groups"),
          col("rows_skipped"),
          expr("(1000000 * rows_skipped) div n_rows").as("skip_ppm"))
        .orderBy("layout")
    }
  }

  private val SHARDS8 = 8
  private val SHARDS9 = 9

  /** q233 — rendezvous (highest-random-weight) sharding audit: assign
    * every customer key to a shard by argmax over per-(key, shard)
    * md5 weights, under the current 8-shard layout AND a 9-shard
    * expansion, and report per shard: population before, population
    * after, and keys moved in. Rendezvous hashing is how a 100 TB
    * store places keys so that ADDING a shard relocates only the keys
    * the new shard wins (≈ 1/9 of them) — versus mod-N hashing, which
    * reshuffles nearly everything. The audit makes that minimal-
    * movement property measurable: moved_in must be 0 for every
    * pre-existing shard (pinned in StatsQueriesSpec) and the new
    * shard's intake ≈ |keys|/9.
    *
    * Exactness: weights are the md5-prefix 60-bit integers (q36
    * contract, bit-identical in both engines); the argmax is
    * greatest() over the 8/9 weight columns resolved to the FIRST
    * matching index — deterministic even in the (never-observed)
    * event of a weight tie. All outputs are counts.
    *
    * Scale design (100 TB): assignment is a per-row codegen'd
    * expression battery (9 md5s + greatest + case) — no lookup table,
    * no shuffle; the audit is two partial-aggregable count passes
    * collapsing to ≤ 9 rows each, joined to a 9-row literal shard
    * axis. This is also the write-path expression: the same column
    * partitions the table at rebalance time. */
  val q233Rendezvous: QueryDef = QueryDef(
    "q233_rendezvous", {
      def hSql(s: Int) =
        s"('0x' || substring(md5('$s|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT"
      def caseSql(n: Int) = {
        val g = (0 until n).map(s => s"h$s").mkString("greatest(", ", ", ")")
        (0 until n).map(s => s"WHEN $g = h$s THEN $s")
          .mkString("CASE ", " ", " END")
      }
      s"""WITH w AS (
      |  SELECT ${(0 until SHARDS9).map(s => s"${hSql(s)} AS h$s").mkString(",\n      |    ")}
      |  FROM customer),
      |a AS (
      |  SELECT CAST(${caseSql(SHARDS8)} AS BIGINT) AS s8,
      |         CAST(${caseSql(SHARDS9)} AS BIGINT) AS s9
      |  FROM w),
      |c8 AS (SELECT s8 AS shard, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1),
      |c9 AS (SELECT s9 AS shard, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1),
      |mv AS (SELECT s9 AS shard, CAST(count(*) AS BIGINT) AS n FROM a
      |       WHERE s8 <> s9 GROUP BY 1),
      |sh AS (SELECT CAST(unnest(range($SHARDS9)) AS BIGINT) AS shard)
      |SELECT sh.shard, coalesce(c8.n, 0) AS n_v8, coalesce(c9.n, 0) AS n_v9,
      |  coalesce(mv.n, 0) AS moved_in
      |FROM sh LEFT JOIN c8 ON c8.shard = sh.shard
      |LEFT JOIN c9 ON c9.shard = sh.shard
      |LEFT JOIN mv ON mv.shard = sh.shard
      |ORDER BY sh.shard""".stripMargin
    }) { (s, dir) =>
    def h(sh: Int): Column =
      conv(substring(md5(concat(lit(s"$sh|"), col("c_custkey").cast("string"))),
        1, 15), 16, 10).cast("long")
    def pick(n: Int): Column = {
      val g = greatest((0 until n).map(i => col(s"h$i")): _*)
      (0 until n).foldRight(lit(null).cast("int")) { (i, els) =>
        when(g === col(s"h$i"), lit(i)).otherwise(els)
      }
    }
    val w = Tables.customer(s, dir)
      .select((0 until SHARDS9).map(i => h(i).as(s"h$i")): _*)
    val a = w.select(pick(SHARDS8).cast("bigint").as("s8"),
        pick(SHARDS9).cast("bigint").as("s9"))
      .ckpt() // feeds all three count passes
    val c8 = a.groupBy(col("s8").as("shard")).agg(count(lit(1)).as("n8"))
    val c9 = a.groupBy(col("s9").as("shard")).agg(count(lit(1)).as("n9"))
    val mv = a.filter(col("s8") =!= col("s9"))
      .groupBy(col("s9").as("shard")).agg(count(lit(1)).as("nm"))
    val sh = s.range(SHARDS9).select(col("id").as("shard"))
    sh.join(broadcast(c8), Seq("shard"), "left")
      .join(broadcast(c9), Seq("shard"), "left")
      .join(broadcast(mv), Seq("shard"), "left")
      .select(col("shard"), coalesce(col("n8"), lit(0L)).as("n_v8"),
        coalesce(col("n9"), lit(0L)).as("n_v9"),
        coalesce(col("nm"), lit(0L)).as("moved_in"))
      .orderBy("shard")
  }

  private val COMPACT_TARGET = 2000L // target compacted "file" size (chars)
  private val COMPACT_MIN = 400L     // files >= this pass through untouched

  /** q237 — small-files compaction planner (the Delta/Iceberg
    * OPTIMIZE shape): treating each document as one stored file of
    * `n_chars` bytes, files under COMPACT_MIN are packed into
    * target-size rewrite groups by the streaming-fill rule
    * group = ⌊exclusive-running-size / TARGET⌋ (exactly how Spark's
    * own FilePartition bin-packs splits), while larger files pass
    * through untouched — rewriting them would be pure write
    * amplification. Per source: file counts before/after, groups
    * planned, bytes rewritten, and the largest planned group. The
    * small-files problem is THE operational tax of a 100 TB lake
    * (every file is a task + a NameNode/manifest entry); this query
    * is the planning pass that sizes the rewrite before any I/O.
    *
    * Differs from q87 (sequence packing): q87 is capacity-respecting
    * first-fit of whole items for training windows; compaction SPLITS
    * the stream at byte boundaries — a group may exceed TARGET by at
    * most one file's tail, the property that makes the assignment a
    * closed-form running-sum expression instead of a sequential scan.
    *
    * Scale design (100 TB): the only ordered pass is
    * [[ScaleRank.withRunningSum]] over (source, doc_id) — every task
    * bounded by a range chunk; group stats are partial-aggregable
    * counts/sums over ≤ bytes/TARGET group keys; per-source frames
    * join on the bounded source axis. All integer arithmetic. */
  val q237Compaction: QueryDef = QueryDef(
    "q237_compaction",
    s"""WITH sm AS (
      |  SELECT source, doc_id, n_chars,
      |    (CAST(sum(n_chars) OVER (
      |       PARTITION BY source ORDER BY doc_id
      |       ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_chars)
      |      // $COMPACT_TARGET AS grp
      |  FROM documents WHERE n_chars < $COMPACT_MIN),
      |ga AS (
      |  SELECT source, grp, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS grp_chars
      |  FROM sm GROUP BY source, grp),
      |gr AS (
      |  SELECT source, count(*) AS n_groups,
      |    max(grp_chars) AS max_group_chars,
      |    CAST(sum(grp_chars) AS BIGINT) AS chars_rewritten
      |  FROM ga GROUP BY source),
      |base AS (
      |  SELECT source, count(*) AS n_files_before,
      |    CAST(sum(CASE WHEN n_chars < $COMPACT_MIN THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_small
      |  FROM documents GROUP BY source)
      |SELECT base.source, n_files_before, n_small,
      |  coalesce(n_groups, 0) AS n_groups,
      |  n_files_before - n_small + coalesce(n_groups, 0) AS n_files_after,
      |  coalesce(chars_rewritten, 0) AS chars_rewritten,
      |  coalesce(max_group_chars, 0) AS max_group_chars
      |FROM base LEFT JOIN gr USING (source)
      |ORDER BY base.source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
    val sm = ScaleRank.withRunningSum(
      docs.filter(col("n_chars") < COMPACT_MIN),
      Seq("source"), Seq(col("doc_id")), col("n_chars"), "cum")
      .withColumn("grp", expr(s"(cum - n_chars) div $COMPACT_TARGET"))
    val ga = sm.groupBy(col("source"), col("grp"))
      .agg(sum(col("n_chars")).as("grp_chars"))
    val gr = ga.groupBy(col("source"))
      .agg(count(lit(1)).as("n_groups"),
        max(col("grp_chars")).as("max_group_chars"),
        sum(col("grp_chars")).as("chars_rewritten"))
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_files_before"),
        sum(when(col("n_chars") < COMPACT_MIN, 1L).otherwise(0L))
          .as("n_small"))
    base.join(broadcast(gr), Seq("source"), "left")
      .select(col("source"), col("n_files_before"), col("n_small"),
        coalesce(col("n_groups"), lit(0L)).as("n_groups"),
        (col("n_files_before") - col("n_small") +
          coalesce(col("n_groups"), lit(0L))).as("n_files_after"),
        coalesce(col("chars_rewritten"), lit(0L)).as("chars_rewritten"),
        coalesce(col("max_group_chars"), lit(0L)).as("max_group_chars"))
      .orderBy("source")
  }

  /** q269 — column-encoding advisor: profile seven lineitem columns
    * in their physical write order (orderkey, linenumber) for the
    * three statistics that decide a columnar codec — distinct ratio
    * (dictionary viability), mean run length (RLE viability), and
    * the fraction of non-decreasing adjacent deltas (delta-encoding
    * viability) — and emit a deterministic recommendation per column
    * (RLE ≻ DICT ≻ DELTA ≻ PLAIN, fixed threshold ladder). This is
    * the write-path sibling of q205's read-path zonemap audit: the
    * same per-file statistics thinking, pointed at encoding choice
    * before a 100 TB rewrite.
    *
    * Exactness: values canonicalize to exact integers/strings
    * (cents, day numbers, int64 renders — identical digit strings in
    * both engines); runs and monotonicity count ADJACENT pairs,
    * fetched via a (column, pos−1) equi-join on the ScaleRank
    * position (the oracle's lag window, re-expressed without any
    * fact-axis window); every ratio is a non-negative integer
    * floor-div and the recommendation is a CASE over those integers.
    *
    * Scale design (100 TB): ONE ScaleRank pass assigns write-order
    * positions (bounded range-chunk tasks); the 7-way unpivot is a
    * map-side stack projection; the neighbor join is an equi-join on
    * (column, pos) with both sides hash-partitioned identically; the
    * report is a 7-row aggregate. */
  val q269EncodingAdvisor: QueryDef = QueryDef(
    "q269_encoding_advisor",
    """WITH base AS (
      |  SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber,
      |      l_returnflag, l_linestatus, CAST(floor(l_quantity) AS BIGINT),
      |      CAST(round(l_discount * 100) AS BIGINT),
      |      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
      |      date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS pos,
      |    l_returnflag AS rf, l_linestatus AS ls,
      |    CAST(floor(l_quantity) AS BIGINT) AS qn,
      |    CAST(round(l_discount * 100) AS BIGINT) AS dc,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep,
      |    l_orderkey AS ok,
      |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS sd
      |  FROM lineitem),
      |u AS (
      |  SELECT 'l_returnflag' AS cname, pos, rf AS val_s,
      |    CAST(NULL AS BIGINT) AS val_n FROM base
      |  UNION ALL SELECT 'l_linestatus', pos, ls, CAST(NULL AS BIGINT) FROM base
      |  UNION ALL SELECT 'l_quantity', pos, CAST(qn AS VARCHAR), qn FROM base
      |  UNION ALL SELECT 'l_discount', pos, CAST(dc AS VARCHAR), dc FROM base
      |  UNION ALL SELECT 'l_extendedprice', pos, CAST(ep AS VARCHAR), ep FROM base
      |  UNION ALL SELECT 'l_orderkey', pos, CAST(ok AS VARCHAR), ok FROM base
      |  UNION ALL SELECT 'l_shipdate', pos, CAST(sd AS VARCHAR), sd FROM base),
      |lg AS (
      |  SELECT cname, val_s, val_n,
      |    lag(val_s) OVER (PARTITION BY cname ORDER BY pos) AS pv,
      |    lag(val_n) OVER (PARTITION BY cname ORDER BY pos) AS pn
      |  FROM u),
      |st AS (
      |  SELECT cname, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT val_s) AS BIGINT) AS nd,
      |    CAST(1 + sum(CASE WHEN pv IS NOT NULL AND val_s <> pv
      |      THEN 1 ELSE 0 END) AS BIGINT) AS runs,
      |    CAST(sum(CASE WHEN pn IS NOT NULL AND val_n >= pn
      |      THEN 1 ELSE 0 END) AS BIGINT) AS ndc,
      |    CAST(sum(CASE WHEN pn IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS npairs
      |  FROM lg GROUP BY cname)
      |SELECT cname, n, nd, runs,
      |  (1000000 * nd) // n AS distinct_ppm,
      |  (1000 * n) // runs AS avg_run_milli,
      |  CASE WHEN npairs > 0 THEN (1000000 * ndc) // npairs
      |    ELSE CAST(-1 AS BIGINT) END AS frac_nondec_ppm,
      |  CASE WHEN (1000 * n) // runs >= 4000 THEN 'RLE'
      |    WHEN (1000000 * nd) // n <= 10000 THEN 'DICT'
      |    WHEN npairs > 0 AND (1000000 * ndc) // npairs >= 990000 THEN 'DELTA'
      |    ELSE 'PLAIN' END AS recommendation
      |FROM st ORDER BY cname""".stripMargin) { (s, dir) =>
    val base0 = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln2"),
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        floor(col("l_quantity")).cast("bigint").as("qn"),
        round(col("l_discount") * 100).cast("bigint").as("dc"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("ep"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01")
          .cast("date")).cast("bigint").as("sd"))
    // full-row tiebreak: (l_orderkey, l_linenumber) is NOT unique in
    // the driver's lineitem (1161 dup groups, the q11 finding) — a
    // bare-key row_number assigns dup rows arbitrary positions and the
    // run/delta statistics diverge between engines; ordering by every
    // projected column makes the position map engine-independent
    // (identical full rows are swap-invariant)
    val base = ScaleRank.withRowNumber(base0, Nil,
      Seq(col("ok"), col("ln2"), col("rf"), col("ls"), col("qn"),
        col("dc"), col("ep"), col("sd")), "pos", "ntot")
    val u = base.select(expr(
      """stack(7,
        |  'l_returnflag', rf, CAST(NULL AS BIGINT),
        |  'l_linestatus', ls, CAST(NULL AS BIGINT),
        |  'l_quantity', CAST(qn AS STRING), qn,
        |  'l_discount', CAST(dc AS STRING), dc,
        |  'l_extendedprice', CAST(ep AS STRING), ep,
        |  'l_orderkey', CAST(ok AS STRING), ok,
        |  'l_shipdate', CAST(sd AS STRING), sd
        |) as (cname, val_s, val_n)""".stripMargin),
      col("pos")).ckpt() // feeds both join sides
    val nbr = u.select(col("cname"), (col("pos") + 1).as("pos"),
      col("val_s").as("pv"), col("val_n").as("pn"))
    val st = u.join(nbr, Seq("cname", "pos"), "left")
      .groupBy(col("cname"))
      .agg(count(lit(1)).as("n"), countDistinct(col("val_s")).as("nd"),
        (lit(1L) + sum(when(col("pv").isNotNull && col("val_s") =!= col("pv"),
          1L).otherwise(0L))).as("runs"),
        sum(when(col("pn").isNotNull && col("val_n") >= col("pn"), 1L)
          .otherwise(0L)).as("ndc"),
        sum(when(col("pn").isNotNull, 1L).otherwise(0L)).as("npairs"))
    st.select(col("cname"), col("n"), col("nd"), col("runs"),
        expr("(1000000 * nd) div n").as("distinct_ppm"),
        expr("(1000 * n) div runs").as("avg_run_milli"),
        when(col("npairs") > 0, expr("(1000000 * ndc) div nullif(npairs, 0)"))
          .otherwise(lit(-1L)).as("frac_nondec_ppm"),
        when(expr("(1000 * n) div runs") >= 4000, "RLE")
          .when(expr("(1000000 * nd) div n") <= 10000, "DICT")
          .when(col("npairs") > 0 &&
            expr("(1000000 * ndc) div nullif(npairs, 0)") >= 990000, "DELTA")
          .otherwise("PLAIN").as("recommendation"))
      .orderBy("cname")
  }

  /** Appends the Hilbert-curve index of (`xCol`, `yCol`) — both in
    * [0, 2^bits) — as `out`: the canonical xy2d walk, one level per
    * bit from the top, expressed entirely in div/mod/CASE arithmetic
    * (portable, codegen-friendly; each level is a fixed column
    * transform, so the expression stays linear, never nested).
    * Exhaustively pinned against the reference recursion in
    * LayoutSpec. */
  private[graft] def withHilbert(
      df: DataFrame, xCol: String, yCol: String, bits: Int,
      out: String): DataFrame = {
    var cur = df.withColumn("__lx", col(xCol).cast("long"))
      .withColumn("__ly", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx", expr(s"__lx div $s"))
        .withColumn("__ry", expr(s"__ly div $s"))
        .withColumn("__hd", col("__hd") + lit(s * s) *
          expr("CASE WHEN __rx = 0 THEN __ry ELSE 3 - __ry END"))
        .withColumn("__xr", expr(s"__lx % $s"))
        .withColumn("__yr", expr(s"__ly % $s"))
        .withColumn("__nlx", expr(
          s"CASE WHEN __ry = 0 THEN (CASE WHEN __rx = 1 THEN $s - 1 - __yr ELSE __yr END) ELSE __xr END"))
        .withColumn("__nly", expr(
          s"CASE WHEN __ry = 0 THEN (CASE WHEN __rx = 1 THEN $s - 1 - __xr ELSE __xr END) ELSE __yr END"))
        .withColumn("__lx", col("__nlx"))
        .withColumn("__ly", col("__nly"))
    }
    cur.withColumn(out, col("__hd"))
      .drop("__lx", "__ly", "__rx", "__ry", "__xr", "__yr", "__nlx", "__nly",
        "__hd")
  }

  /** The DuckDB CTE chain computing the same Hilbert walk: input CTE
    * `src`(cols…, x, y) → output CTE `hv$bits`(cols…, hv). */
  private def hilbertSql(bits: Int, carry: String): String = {
    val levels = (0 until bits).map { k =>
      val i = bits - 1 - k
      val s = 1L << i
      val prev = if (k == 0) "h0" else s"h$k"
      s"""h${k + 1} AS (
         |  SELECT $carry,
         |    hd + ${s * s} * (CASE WHEN lx // $s = 0 THEN ly // $s
         |      ELSE 3 - ly // $s END) AS hd,
         |    CASE WHEN ly // $s = 0 THEN
         |      (CASE WHEN lx // $s = 1 THEN $s - 1 - (ly % $s) ELSE ly % $s END)
         |      ELSE lx % $s END AS lx,
         |    CASE WHEN ly // $s = 0 THEN
         |      (CASE WHEN lx // $s = 1 THEN $s - 1 - (lx % $s) ELSE lx % $s END)
         |      ELSE ly % $s END AS ly
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""h0 AS (SELECT $carry, CAST(0 AS BIGINT) AS hd,
       |  CAST(x AS BIGINT) AS lx, CAST(y AS BIGINT) AS ly FROM src),
       |$levels""".stripMargin
  }

  /** q281 — space-filling-curve layout shoot-out: the part table is
    * cut into 16 files under three physical orders — natural
    * (partkey), Morton/Z (q93's curve), and Hilbert — and a battery
    * of four 2-D range predicates is costed against each layout's
    * min/max zone maps (files scanned + rows scanned). Hilbert's
    * no-jump locality usually prunes tighter boxes than Morton on
    * box queries; this query MEASURES that folklore on real
    * statistics, which is how a 100 TB table picks its clustering
    * curve. The Hilbert walk itself is div/mod/CASE arithmetic (no
    * bit intrinsics), one fixed transform per bit level.
    *
    * Exactness: both curves are exact integers; file cuts ride
    * [[ScaleRank]]'s exact rank (partkey tiebreak); zone maps and
    * the intersect test are integer min/max logic.
    *
    * Scale design (100 TB): three ScaleRank passes (bounded
    * range-chunk tasks — the write-side equivalent is
    * repartitionByRange + sortWithinPartitions per layout); file
    * stats are partial-aggregable; the costing is a 16-file × 4-pred
    * broadcast cross. */
  val q281CurveShootout: QueryDef = {
    val FILES = 16
    val RPF = 125
    val PREDS = Seq( // (pid, szLo, szHi, pbLo, pbHi) over the 64x64 grid
      (1L, 0L, 7L, 0L, 63L), (2L, 0L, 63L, 0L, 7L),
      (3L, 20L, 29L, 20L, 29L), (4L, 40L, 49L, 0L, 15L))
    val predRows = PREDS.map { case (p, a, b, c2, d2) =>
      s"SELECT CAST($p AS BIGINT) AS pid, $a AS szlo, $b AS szhi, " +
        s"$c2 AS pblo, $d2 AS pbhi"
    }.mkString(" UNION ALL ")
    QueryDef(
      "q281_curve_shootout",
      s"""WITH src AS (
         |  SELECT p_partkey, p_size - 1 AS x,
         |    CAST(floor((p_retailprice - 900.0) * 64.0 / 100.0) AS BIGINT) AS y
         |  FROM part),
         |${hilbertSql(6, "p_partkey, x, y")},
         |keyed AS (
         |  SELECT h6.p_partkey, h6.x AS sz, h6.y AS pb, h6.hd AS hv,
         |    ${zvalSql("h6.x", "h6.y", 6)} AS zv
         |  FROM h6),
         |f AS (
         |  SELECT sz, pb, lay, least(fid, ${FILES - 1}) AS fid FROM (
         |    SELECT sz, pb, 'natural' AS lay,
         |      (row_number() OVER (ORDER BY p_partkey) - 1) // $RPF AS fid
         |    FROM keyed
         |    UNION ALL
         |    SELECT sz, pb, 'zorder',
         |      (row_number() OVER (ORDER BY zv, p_partkey) - 1) // $RPF
         |    FROM keyed
         |    UNION ALL
         |    SELECT sz, pb, 'hilbert',
         |      (row_number() OVER (ORDER BY hv, p_partkey) - 1) // $RPF
         |    FROM keyed)),
         |stats AS (
         |  SELECT lay, fid, CAST(count(*) AS BIGINT) AS n,
         |    min(sz) AS min_sz, max(sz) AS max_sz,
         |    min(pb) AS min_pb, max(pb) AS max_pb
         |  FROM f GROUP BY 1, 2),
         |preds AS ($predRows)
         |SELECT p.pid, s.lay AS layout,
         |  CAST(count(CASE WHEN s.max_sz >= p.szlo AND s.min_sz <= p.szhi
         |    AND s.max_pb >= p.pblo AND s.min_pb <= p.pbhi THEN 1 END)
         |    AS BIGINT) AS files_scanned,
         |  CAST(coalesce(sum(CASE WHEN s.max_sz >= p.szlo AND s.min_sz <= p.szhi
         |    AND s.max_pb >= p.pblo AND s.min_pb <= p.pbhi THEN s.n END), 0)
         |    AS BIGINT) AS rows_scanned
         |FROM preds p CROSS JOIN stats s
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val d = Tables.part(s, dir).select(
        col("p_partkey"),
        (col("p_size") - 1).cast("long").as("x"),
        floor((col("p_retailprice") - lit(900.0)) * lit(64.0) / lit(100.0))
          .cast("long").as("y"))
      val keyed = withHilbert(d, "x", "y", 6, "hv")
        .withColumn("zv", zval("x", "y", 6))
        .withColumnRenamed("x", "sz").withColumnRenamed("y", "pb")
        .ckpt() // feeds all three layout rankings
      def layoutStats(lay: String, sort: Seq[Column]): DataFrame =
        ScaleRank.withRowNumber(keyed, Nil, sort, "rn", "__nr")
          .withColumn("fid",
            least(expr(s"(rn - 1) div $RPF"), lit(FILES - 1L)))
          .groupBy(col("fid"))
          .agg(count(lit(1)).as("n"),
            min(col("sz")).as("min_sz"), max(col("sz")).as("max_sz"),
            min(col("pb")).as("min_pb"), max(col("pb")).as("max_pb"))
          .withColumn("lay", lit(lay))
      val stats = layoutStats("natural", Seq(col("p_partkey")))
        .unionByName(layoutStats("zorder", Seq(col("zv"), col("p_partkey"))))
        .unionByName(layoutStats("hilbert", Seq(col("hv"), col("p_partkey"))))
      import s.implicits._
      val preds = PREDS.toDF("pid", "szlo", "szhi", "pblo", "pbhi")
      val hit = col("max_sz") >= col("szlo") && col("min_sz") <= col("szhi") &&
        col("max_pb") >= col("pblo") && col("min_pb") <= col("pbhi")
      broadcast(preds).crossJoin(stats)
        .groupBy(col("pid"), col("lay").as("layout"))
        .agg(sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
          coalesce(sum(when(hit, col("n"))), lit(0L)).as("rows_scanned"))
        .orderBy("pid", "layout")
    }
  }

  /** q289 — greedy materialized-view selection (Harinarayan–
    * Rajaraman–Ullman, SIGMOD'96) over the 3-dimension cube lattice
    * (returnflag × linestatus × orderpriority): starting from the
    * base cuboid, pick 3 views to materialize, each round choosing
    * the view whose materialization saves the most total rows across
    * every query it can answer (benefit = Σ over answerable cuboids
    * of the current-cost improvement; HRU's greedy is within
    * (1−1/e) of optimal). This is the warehouse-design decision
    * behind every "should we pre-aggregate" debate, made on exact
    * cuboid sizes instead of folklore — and the size pass itself is
    * ONE `CUBE` aggregate (Spark's Expand), the operator this
    * advisor exists to tame.
    *
    * Exactness: cuboid sizes are exact group counts (the masks
    * derived from `grouping_id` are re-expressed in the oracle as
    * eight explicit grouping sets — no cross-engine GROUPING bit
    * convention is relied on); answerability is pure mask
    * arithmetic; benefits are integer sums with greatest(0,·)
    * clamps; the argmax ties to the smallest mask.
    *
    * Scale design (100 TB): one cube pass (map-side Expand ×8,
    * partial-aggregable) collapses the fact; the lattice is 8 rows —
    * every greedy round is a handful of broadcast joins on it. No
    * windows, no collect. */
  val q289ViewSelection: QueryDef = {
    val R = 3
    // answerable(w, v): every attribute of w is present in v
    def ansSql(wm: String, vm: String): String =
      s"(($wm // 4) % 2 <= ($vm // 4) % 2 AND ($wm // 2) % 2 <= ($vm // 2) % 2" +
        s" AND $wm % 2 <= $vm % 2)"
    val namesRows = Seq(
      (0, "total"), (1, "P"), (2, "L"), (3, "L,P"),
      (4, "R"), (5, "R,P"), (6, "R,L"), (7, "R,L,P"))
      .map { case (m, n) => s"SELECT CAST($m AS BIGINT) AS mask, '$n' AS view_name" }
      .mkString(" UNION ALL ")
    val sizeSets = (0 to 7).map { m =>
      val cols = Seq(
        if ((m & 4) != 0) Some("rf") else None,
        if ((m & 2) != 0) Some("ls") else None,
        if ((m & 1) != 0) Some("pr") else None).flatten
      // the apex cuboid (no dims) is ONE group: group by the literal
      val grp = if (cols.isEmpty) " GROUP BY 1"
        else s" GROUP BY ${cols.mkString(", ")}"
      s"""SELECT CAST($m AS BIGINT) AS mask, CAST(count(*) AS BIGINT) AS vsize
         |  FROM (SELECT ${if (cols.isEmpty) "1 AS one" else cols.mkString(", ")}
         |        FROM fact$grp)""".stripMargin
    }.mkString("\nUNION ALL\n")
    val rounds = (1 to R).map { r =>
      val prevM = if (r == 1) "m0" else s"m${r - 1}"
      s"""cc$r AS MATERIALIZED (
         |  SELECT l.mask AS wm, min(lv.vsize) AS cost
         |  FROM lat l JOIN $prevM m ON ${ansSql("l.mask", "m.mask")}
         |  JOIN lat lv ON lv.mask = m.mask
         |  GROUP BY l.mask),
         |bene$r AS MATERIALIZED (
         |  SELECT v.mask, v.vsize,
         |    CAST(sum(greatest(0, cc.cost - v.vsize)) AS BIGINT) AS benefit
         |  FROM lat v JOIN cc$r cc ON ${ansSql("cc.wm", "v.mask")}
         |  WHERE v.mask NOT IN (SELECT mask FROM $prevM)
         |  GROUP BY v.mask, v.vsize),
         |pick$r AS MATERIALIZED (
         |  SELECT min(mask) AS mask FROM bene$r
         |  WHERE benefit = (SELECT max(benefit) FROM bene$r)),
         |m$r AS (SELECT mask FROM $prevM UNION ALL SELECT mask FROM pick$r),
         |cost$r AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS total FROM (
         |    SELECT min(lv.vsize) AS c
         |    FROM lat l JOIN m$r m ON ${ansSql("l.mask", "m.mask")}
         |    JOIN lat lv ON lv.mask = m.mask
         |    GROUP BY l.mask))""".stripMargin
    }.mkString(",\n")
    val report = (1 to R).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS rk, n.view_name,
         |  (SELECT vsize FROM lat WHERE mask = (SELECT mask FROM pick$r))
         |    AS view_size,
         |  (SELECT benefit FROM bene$r WHERE mask = (SELECT mask FROM pick$r))
         |    AS benefit,
         |  (SELECT total FROM cost$r) AS total_cost_after
         |FROM names n WHERE n.mask = (SELECT mask FROM pick$r)""".stripMargin
    }.mkString("\nUNION ALL\n")
    QueryDef(
      "q289_view_selection",
      s"""WITH fact AS (
         |  SELECT l.l_returnflag AS rf, l.l_linestatus AS ls,
         |    o.o_orderpriority AS pr
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |lat AS MATERIALIZED ($sizeSets),
         |names AS ($namesRows),
         |m0 AS (SELECT CAST(7 AS BIGINT) AS mask),
         |$rounds
         |$report
         |ORDER BY rk""".stripMargin) { (s, dir) =>
      val fact = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          col("o_orderpriority").as("pr"))
      // ONE cube pass; grouping_id: bit 4 = rf absent, 2 = ls absent,
      // 1 = pr absent -> present-attribute mask = 7 - gid
      val lat = fact.cube(col("rf"), col("ls"), col("pr"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"))
        .select((lit(7) - col("gid")).cast("bigint").as("mask"))
        .groupBy(col("mask")).agg(count(lit(1)).as("vsize"))
      import s.implicits._
      // r13 (guide §1.2): the greedy rounds ran as ~60 tiny
      // broadcast-join jobs over this 8-row frame — pure scheduling.
      // The lattice is 2³ = 8 rows BY CONSTRUCTION (3 cube attributes),
      // so the HRU rounds are exact integer driver arithmetic over the
      // collected cells — the adjudicated q169/q246/q251
      // dimension-lattice class; one cube-pass job remains. Identical
      // integer benefits/argmin (ties to min mask), identical output.
      val cells = lat.collect() // bounded: 2^3 = 8 cuboid-lattice rows
      val size: Map[Long, Long] =
        cells.map(row => row.getLong(0) -> row.getLong(1)).toMap
      // degenerate-corpus guard (r14, ADVICE r13): an empty fact yields
      // a lattice without the base view (mask 7) and the greedy would
      // throw (size(7), max over empty benefits). The oracle's picks
      // are NULL masks there and its report matches no names row —
      // an EMPTY result; degrade identically instead of crashing
      if (!size.contains(7L)) {
        Seq.empty[(Long, String, Long, Long, Long)]
          .toDF("rk", "view_name", "view_size", "benefit",
            "total_cost_after")
      } else {
        val nameOf = Map(0L -> "total", 1L -> "P", 2L -> "L", 3L -> "L,P",
          4L -> "R", 5L -> "R,P", 6L -> "R,L", 7L -> "R,L,P")
        def ans(wm: Long, vm: Long): Boolean =
          ((wm >> 2) & 1) <= ((vm >> 2) & 1) &&
            ((wm >> 1) & 1) <= ((vm >> 1) & 1) && (wm & 1) <= (vm & 1)
        val masks: Seq[Long] = size.keys.toSeq.sorted // Seq: per-w terms must not set-collapse
        def curCost(m: Set[Long]): Map[Long, Long] =
          masks.map(wm =>
            wm -> m.toSeq.filter(vm => ans(wm, vm)).map(size).min).toMap
        var m = Set(7L)
        val out = (1 to R).map { r =>
          val cc = curCost(m)
          val bene: Map[Long, Long] = masks.filterNot(m).map(vm =>
            vm -> masks.filter(wm => ans(wm, vm))
              .map(wm => math.max(0L, cc(wm) - size(vm))).sum).toMap
          val mb = bene.values.max
          val pick = bene.collect { case (vm, b) if b == mb => vm }.min
          m = m + pick
          val total = curCost(m).values.sum
          (r.toLong, nameOf(pick), size(pick), bene(pick), total)
        }
        out.toDF("rk", "view_name", "view_size", "benefit",
          "total_cost_after").orderBy("rk")
      }
    }
  }

  val all: Seq[QueryDef] =
    Seq(q93ZOrder, q205ZonemapPrune, q233Rendezvous, q237Compaction,
      q269EncodingAdvisor, q281CurveShootout, q289ViewSelection)
}
