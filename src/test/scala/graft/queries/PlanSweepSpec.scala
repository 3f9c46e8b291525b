package graft.queries

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, RepartitionByExpression, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** The mechanized version of the per-query scale audit: sweep EVERY
  * registered query's optimized plan and flag the single-partition
  * shapes that kill a 100 TB run —
  *
  *  - a logical Window with an EMPTY partition spec (plans as "move
  *    everything to one task, sort it there"), unless its order axis
  *    is an adjudicated-bounded frame (see the allowlist);
  *  - an explicit 1-partition repartition/coalesce anywhere except a
  *    bounded frame.
  *
  * Boundedness cannot be decided mechanically, so the allowlist is
  * explicit and REQUIRED to stay exercised: an entry no query uses
  * fails the spec too (rot in either direction is caught). Axes are
  * matched against the window's order-by expression string.
  *
  * What this deliberately does NOT flag: global Sort (plans as a
  * range-partitioned distributed sort), Limit/TakeOrdered heaps, and
  * SinglePartition exchanges under 1-row global aggregates — all
  * distributed or bounded by construction.
  */
class PlanSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Order-axis substrings that are bounded by construction wherever
    * they appear (machinery-internal frames). */
  private val globallyBounded = Seq(
    // ScaleRank/heads-tails chunk-offset frames: <= P rows per group,
    // P = shuffle parallelism — bounded by the cluster, not the data
    "__sr_pid")

  /** (query, order-axis pattern) -> why that global window's input is
    * bounded. A pattern starting with '^' anchors to the FIRST sort
    * attribute (so "^a#" cannot accidentally adjudicate a future
    * "paa#…" window); otherwise plain substring. Every entry must
    * match at least one swept offender. */
  private def axisMatches(axis: String, ax: String): Boolean =
    if (ax.startsWith("^")) axis.startsWith(ax.drop(1))
    else axis.contains(ax)

  private def allow(q: String, axis: String): Option[String] =
    PlanSweepAllowlist.entries.collectFirst {
      case (qq, ax, why) if qq == q && axisMatches(axis, ax) => why
    }

  test("no query plans an unbounded single-partition window or repartition(1)") {
    graft.plans.TopKInstall.install(spark)
    val unusedAllow = collection.mutable.Set(
      PlanSweepAllowlist.entries.map(e => (e._1, e._2)): _*)
    val offenders = collection.mutable.ArrayBuffer[String]()
    for (q <- graft.SparkEntry.defs) {
      val lp: LogicalPlan = q.build(spark, dir).queryExecution.optimizedPlan
      val windows = lp.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      for (w <- windows) {
        val axis = w.orderSpec.collect { case s: SortOrder => s.child.toString }
          .mkString(",")
        if (!globallyBounded.exists(axis.contains)) {
          allow(q.name, axis) match {
            case Some(_) =>
              PlanSweepAllowlist.entries
                .filter(e => e._1 == q.name && axisMatches(axis, e._2))
                .foreach(e => unusedAllow.remove((e._1, e._2)))
            case None =>
              offenders += s"${q.name}: global window over [$axis]"
          }
        }
      }
      val rep1 = lp.collectWithSubqueries {
        case r: Repartition if r.numPartitions == 1 => r: LogicalPlan
        case r: RepartitionByExpression if r.optNumPartitions.contains(1) =>
          r: LogicalPlan
      }
      for (_ <- rep1) {
        allow(q.name, "repartition(1)") match {
          case Some(_) => unusedAllow.remove((q.name, "repartition(1)"))
          case None => offenders += s"${q.name}: explicit 1-partition repartition"
        }
      }
    }
    assert(offenders.isEmpty,
      s"unadjudicated single-partition shapes:\n${offenders.mkString("\n")}")
    assert(unusedAllow.isEmpty,
      s"allowlist entries no longer exercised (stale adjudications):\n" +
        unusedAllow.mkString("\n"))
  }
}

/** The adjudicated-bounded frames: (query, order-axis substring, why).
  * Each "why" must name the bound that keeps the single task small. */
object PlanSweepAllowlist {
  val entries: Seq[(String, String, String)] = Seq(
    ("q78_sorted_neighborhood", "snkey",
      "heads/tails boundary subset: <= 2*W*partitions rows, bounded by parallelism"),
    ("q136_gap_ranges", "lo#",
      "heads/tails boundary subset at W=1: <= 2*partitions island rows"),
    ("q112_vocab_coverage", "tok",
      "input is the TakeOrdered top-200 token slice (literal k)"),
    ("q180_zipf", "tok",
      "input is the TakeOrdered top-200 token slice (literal k)"),
    ("q160_hybrid_rrf", "doc_id",
      "both rank windows run over TakeOrdered top-50 slices (literal k)"),
    ("q148_vocab_growth", "bucket",
      "decile axis: 10 literal corpus-growth buckets"),
    ("q190_heaps_law", "bucket",
      "vigintile axis: 20 literal corpus-growth buckets"),
    ("q186_benford", "",
      "digit axis: 9 leading-digit rows (literal domain)"),
    ("q118_cumulative_uniques", "d#",
      "day-grain aggregate below the window: calendar-bounded axis"),
    ("q178_cusum", "d#",
      "day-grain aggregate below the window: calendar-bounded axis"),
    ("q219_slo_burn", "day",
      "day-grain aggregate below the window: calendar-bounded axis"),
    ("q193_drawdown", "day",
      "day-grain aggregate below the window (pinned in ScalePlanAuditSpec)"),
    ("q218_weekly_kpi", "wk",
      "week-grain aggregate below the window: calendar-bounded axis"),
    ("q164_survival", "repartition(1)",
      "sequential KM scan over the aggregated lifetime-day axis " +
        "(pinned in ScalePlanAuditSpec)"),
    // q245_changepoint's day-axis rank/prefix windows are calendar-
    // bounded but sit BELOW its eager localCheckpoint, so the sweep
    // never sees them (the LogicalRDD hides the already-executed
    // prefix) — the adjudication lives in the query's scaladoc instead
    ("q239_hits", "^a#",
      "authority rank window runs over the TakeOrdered top-10 slice (literal k)"),
    ("q239_hits", "^h#",
      "hub rank window runs over the TakeOrdered top-10 slice (literal k)"),
    ("q282_decayed_topk", "dmass",
      "leaderboard rank window runs over the TakeOrdered top-10 slice " +
        "(literal k); the all-time rank rides ScaleRank"))
}
