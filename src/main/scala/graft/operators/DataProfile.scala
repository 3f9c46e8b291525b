package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-quality profiling — the Deequ-style audit a pipeline runs
  * before trusting a 100 TB ingest: per-column null count, distinct
  * count, min/max (as canonical strings), and completeness.
  *
  * Scale design: ONE aggregate pass over the table produces a single
  * row holding every column's stats, which is then unpivoted to the
  * (column, metric…) report — the table is scanned once and nothing
  * but the stats row moves. The `count(DISTINCT …)` battery expands
  * the scan ×columns map-side (Spark's Expand) but still shuffles only
  * partial aggregates; at 100 TB you would swap exact distinct counts
  * for `approx_count_distinct` (HLL, one pass, no expand) — kept exact
  * here so the DuckDB oracle can reproduce the report bit-for-bit.
  *
  * Canonical string reprs sidestep engine float/timestamp formatting
  * differences: doubles go through DECIMAL(18,2), timestamps through
  * an explicit yyyy-MM-dd HH:mm:ss format; integers and strings cast
  * directly.
  */
object DataProfile {

  private sealed trait Kind
  private case object IntK extends Kind
  private case object DblK extends Kind
  private case object TsK extends Kind
  private case object StrK extends Kind

  private val cols: Seq[(String, Kind)] = Seq(
    ("o_orderkey", IntK), ("o_custkey", IntK), ("o_orderstatus", StrK),
    ("o_totalprice", DblK), ("o_orderdate", TsK), ("o_orderpriority", StrK))

  private def reprSql(agg: String, c: String, k: Kind): String = k match {
    case IntK => s"CAST($agg($c) AS VARCHAR)"
    case DblK => s"CAST(CAST($agg($c) AS DECIMAL(18,2)) AS VARCHAR)"
    case TsK  => s"strftime($agg($c), '%Y-%m-%d %H:%M:%S')"
    case StrK => s"$agg($c)"
  }

  private def reprCol(agg: Column => Column, c: String, k: Kind): Column = k match {
    case IntK => agg(col(c)).cast("string")
    case DblK => agg(col(c)).cast("decimal(18,2)").cast("string")
    case TsK  => date_format(agg(col(c)), "yyyy-MM-dd HH:mm:ss")
    case StrK => agg(col(c))
  }

  val q71Profile: QueryDef = {
    val aggSql = cols.zipWithIndex.map { case ((c, k), i) =>
      s"count($c) AS c$i, count(DISTINCT $c) AS d$i, " +
        s"${reprSql("min", c, k)} AS mn$i, ${reprSql("max", c, k)} AS mx$i"
    }.mkString(",\n  ")
    val rows = cols.zipWithIndex.map { case ((c, _), i) =>
      s"SELECT '$c' AS col_name, n_rows - c$i AS n_null, d$i AS n_distinct, " +
        s"mn$i AS min_repr, mx$i AS max_repr, (1000 * c$i) // n_rows AS completeness_permille FROM a"
    }.mkString("\nUNION ALL ")
    val oracle =
      s"""WITH a AS (SELECT count(*) AS n_rows,
         |  $aggSql
         |FROM orders)
         |$rows
         |ORDER BY col_name""".stripMargin

    QueryDef("q71_profile", oracle) { (s, dir) =>
      val base = Tables.orders(s, dir)
        .repartition(col("o_orderkey")) // single-file scan -> use every core
      // distinct counts WITHOUT distinct aggregates: a Spark
      // multi-column count(DISTINCT) battery plans as an Expand
      // (×columns row blowup into one hash aggregate); exploding to
      // (column, value) pairs and counting group sizes twice is the
      // same answer as two partial-aggregable shuffles that never hold
      // more than one column's values per hash entry — measurably
      // faster here and the shape that survives wide tables at scale
      val pairs = base.select(explode(array(cols.map { case (c, _) =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))
      }: _*)).as("p")).select(col("p.col_name"), col("p.v"))
        .filter(col("v").isNotNull) // count(DISTINCT c) ignores nulls
      val nd = pairs.groupBy(col("col_name"), col("v")).agg(count(lit(1)))
        .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
      // nulls + typed min/max: ONE plain aggregate row, no distinct
      val aggCols = cols.zipWithIndex.flatMap { case ((c, k), i) =>
        Seq(
          count(col(c)).as(s"c$i"),
          reprCol(min, c, k).as(s"mn$i"),
          reprCol(max, c, k).as(s"mx$i"))
      }
      val a = base.agg(count(lit(1)).as("n_rows"), aggCols: _*)
      val stackArgs = cols.zipWithIndex.map { case ((c, _), i) =>
        s"'$c', n_rows - c$i, mn$i, mx$i, (1000 * c$i) div n_rows"
      }.mkString(", ")
      a.select(expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_null, min_repr, max_repr, completeness_permille)"))
        // LEFT join: an all-null column has no (col_name, v) pairs and
        // so no nd row — exactly the column an audit must still report
        // (with n_distinct = 0), not drop
        .join(broadcast(nd), Seq("col_name"), "left")
        .select(col("col_name"), col("n_null"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_repr"), col("max_repr"), col("completeness_permille"))
        .orderBy("col_name")
    }
  }

  /** q106 — IQR outlier audit (the Tukey fence, the standard
    * distribution-drift tripwire in a data-quality pipeline): per
    * group, the quartiles, the 1.5×IQR fences, and how many rows fall
    * outside them.
    *
    * Two passes by construction: quartiles need the (grouped) value
    * distribution, fences then need a second scan to count
    * violations — expressed as one grouped quantile aggregate
    * broadcast back over the fact scan, so the big side is read
    * twice but never shuffled for the fence check (the q70 stats
    * shape). Exact interpolated percentiles (`percentile` ≡
    * `quantile_cont`) keep both engines bit-identical; the fence
    * comparison is on the same doubles. */
  val q106IqrOutliers: QueryDef = QueryDef(
    "q106_iqr_outliers",
    """WITH q AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.25) AS p25,
      |    quantile_cont(l_extendedprice, 0.75) AS p75
      |  FROM lineitem GROUP BY l_returnflag),
      |f AS (
      |  SELECT l_returnflag, p25, p75,
      |    p25 - 1.5 * (p75 - p25) AS lo,
      |    p75 + 1.5 * (p75 - p25) AS hi
      |  FROM q)
      |SELECT l.l_returnflag, f.p25, f.p75,
      |  count(*) AS n_rows,
      |  CAST(sum(CASE WHEN l.l_extendedprice < f.lo OR l.l_extendedprice > f.hi
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM lineitem l JOIN f USING (l_returnflag)
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val q = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.25D)").as("p25"),
        expr("percentile(l_extendedprice, 0.75D)").as("p75"))
      .select(col("l_returnflag"), col("p25"), col("p75"),
        (col("p25") - lit(1.5) * (col("p75") - col("p25"))).as("lo"),
        (col("p75") + lit(1.5) * (col("p75") - col("p25"))).as("hi"))
    li.select(col("l_returnflag"), col("l_extendedprice"))
      .join(broadcast(q), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("p25"), col("p75"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_extendedprice") < col("lo") ||
          col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(q71Profile, q106IqrOutliers)
}
