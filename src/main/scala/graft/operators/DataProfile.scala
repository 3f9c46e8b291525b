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
      val aggCols = cols.zipWithIndex.flatMap { case ((c, k), i) =>
        Seq(
          count(col(c)).as(s"c$i"),
          countDistinct(col(c)).as(s"d$i"),
          reprCol(min, c, k).as(s"mn$i"),
          reprCol(max, c, k).as(s"mx$i"))
      }
      val a = Tables.orders(s, dir)
        .agg(count(lit(1)).as("n_rows"), aggCols: _*)
      val stackArgs = cols.zipWithIndex.map { case ((c, _), i) =>
        s"'$c', n_rows - c$i, d$i, mn$i, mx$i, (1000 * c$i) div n_rows"
      }.mkString(", ")
      a.select(expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_repr, max_repr, completeness_permille)"))
        .orderBy("col_name")
    }
  }

  val all: Seq[QueryDef] = Seq(q71Profile)
}
