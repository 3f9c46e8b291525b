package graft.queries

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BinaryComparison, Cast, EqualNullSafe, EqualTo, Expression, In, InSet, IsNotNull, IsNull, Literal, Not, Or, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, Join, LeafNode, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Repartition, RepartitionByExpression, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, BROADCAST}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

/** The mechanized version of the per-query scale audit: sweep EVERY
  * registered query's optimized plan — including the plan of every
  * checkpointed lineage segment, via `Ckpt.withAudit` (the r6 q245
  * blind spot: subtrees below an eager localCheckpoint are otherwise
  * invisible) — and flag the shapes that kill a 100 TB run:
  *
  *  - a logical Window with an EMPTY partition spec (plans as "move
  *    everything to one task, sort it there"), unless its order axis
  *    is an adjudicated-bounded frame (see the allowlist);
  *  - an explicit 1-partition repartition/coalesce anywhere except a
  *    bounded frame;
  *  - a BROADCAST join hint whose hinted side is RAW data — reaches a
  *    scan leaf with no Aggregate or Limit compressing it on the way
  *    (the r6 q291 shape: `broadcast(wholeTable.select(...))` is an
  *    OOM at scale no matter how small the test data is);
  *  - a join with NO equi keys (cross, or θ-only condition) where BOTH
  *    sides are raw data — O(N·M) work that no partitioning saves.
  *
  * Boundedness cannot be decided mechanically, so the allowlist is
  * explicit and REQUIRED to stay exercised: an entry no query uses
  * fails the spec too (rot in either direction is caught). Window
  * entries match the order-by expression string; broadcast / non-equi
  * entries use the patterns "broadcast" / "nonequi".
  *
  * What this deliberately does NOT flag: global Sort (plans as a
  * range-partitioned distributed sort), Limit/TakeOrdered heaps,
  * SinglePartition exchanges under 1-row global aggregates, broadcast
  * of aggregated/limited frames (compressed to key-domain or literal-k
  * size), and equi-joins — all distributed or bounded by construction.
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

  private def axisMatches(axis: String, ax: String): Boolean =
    if (ax.startsWith("^")) axis.startsWith(ax.drop(1))
    else axis.contains(ax)

  private def allow(q: String, axis: String): Option[String] =
    PlanSweepAllowlist.entries.collectFirst {
      case (qq, ax, why) if qq == q && axisMatches(axis, ax) => why
    }

  /** A filter that selects a literal-bounded slice: SOME top-level
    * conjunct references exactly one column and compares it only
    * against literals — the `vec_id = 0` / `vec_id < NQUERY`
    * query-set selections of the ANN family (extra conjuncts, e.g.
    * planner-added isnotnull(f(x)), only shrink further). Any
    * function call (md5, pmod, hash …) inside the conjunct
    * disqualifies it: those are FRACTION-of-data samples and still
    * scale. The rule is deliberately permissive on non-key columns
    * (`price < 100` would pass too); what it can never excuse is the
    * q291 class — a whole-table broadcast with no filter at all. */
  private def literalSlice(f: Filter): Boolean =
    conjuncts(f.condition).exists { c =>
      c.references.size == 1 &&
        c.find {
          case _: Attribute | _: Literal => false
          case _: BinaryComparison | _: In | _: InSet => false
          case _: And | _: Or | _: Not | _: IsNull | _: IsNotNull | _: Cast => false
          case _ => true
        }.isEmpty &&
        // must actually COMPARE against a literal — a bare isnotnull
        // conjunct bounds nothing
        c.exists {
          case _: BinaryComparison | _: In | _: InSet => true
          case _ => false
        }
    }

  /** The two fixed-cardinality dimension tables (5 regions, 25
    * nations — literal domains that do not grow with SF). */
  private def fixedDim(lr: LogicalRelation): Boolean = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.exists { p =>
        val s = p.toString
        s.contains("region.parquet") || s.contains("nation.parquet")
      }
    case _ => false
  }

  /** True iff some root→leaf path reaches a data scan with nothing
    * compressing it on the way: no Aggregate (grouped aggregates
    * collapse to key-domain size), no Limit, no literal-slice Filter,
    * and not a LocalRelation/OneRowRelation/fixed-dim leaf.
    * LogicalRDD (a checkpointed segment) counts as BOUNDED here
    * because the segment's own plan is recorded by `Ckpt.withAudit`
    * and swept separately — raw data broadcast inside it is flagged
    * there, at the point where the shape is actually built. */
  private def rawData(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => false
    case _: Aggregate => false
    case f: Filter if literalSlice(f) => false
    case _: LocalRelation | _: OneRowRelation => false
    // spark.range(n): literal bound known at plan time — an axis
    // frame, not data
    case _: org.apache.spark.sql.catalyst.plans.logical.Range => false
    case _: LogicalRDD => false
    case lr: LogicalRelation if fixedDim(lr) => false
    case _: LeafNode => true
    case other => other.children.exists(rawData)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** An equi key usable for hash/sort-merge partitioning: a top-level
    * conjunct `l = r` with one side referencing only the left child
    * and the other only the right. */
  private def hasEquiKey(j: Join): Boolean = j.condition.exists { c =>
    conjuncts(c).exists {
      case eq @ (_: EqualTo | _: EqualNullSafe) =>
        val Seq(a, b) = eq.children
        (a.references.subsetOf(j.left.outputSet) &&
          b.references.subsetOf(j.right.outputSet)) ||
          (a.references.subsetOf(j.right.outputSet) &&
            b.references.subsetOf(j.left.outputSet))
      case _ => false
    }
  }

  private def isBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  test("no query plans an unbounded single-partition, broadcast-raw, or non-equi shape") {
    graft.plans.TopKInstall.install(spark)
    val unusedAllow = collection.mutable.Set(
      PlanSweepAllowlist.entries.map(e => (e._1, e._2)): _*)
    val offenders = collection.mutable.ArrayBuffer[String]()
    def adjudicate(q: String, pattern: String, offence: => String): Unit =
      allow(q, pattern) match {
        case Some(_) =>
          PlanSweepAllowlist.entries
            .filter(e => e._1 == q && axisMatches(pattern, e._2))
            .foreach(e => unusedAllow.remove((e._1, e._2)))
        case None => offenders += offence
      }
    for (q <- graft.SparkEntry.defs) {
      // audit mode: the final plan PLUS the optimized plan of every
      // checkpointed lineage segment (disabling checkpoints instead
      // would double iterative plans per iteration — unusable)
      val (finalPlan, segments) = graft.Ckpt.withAudit {
        q.build(spark, dir).queryExecution.optimizedPlan
      }
      for (lp <- finalPlan +: segments) {
        val windows = lp.collectWithSubqueries {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        for (w <- windows) {
          val axis = w.orderSpec.collect { case s: SortOrder => s.child.toString }
            .mkString(",")
          if (!globallyBounded.exists(axis.contains))
            adjudicate(q.name, axis, s"${q.name}: global window over [$axis]")
        }
        val rep1 = lp.collectWithSubqueries {
          case r: Repartition if r.numPartitions == 1 => r: LogicalPlan
          case r: RepartitionByExpression if r.optNumPartitions.contains(1) =>
            r: LogicalPlan
        }
        for (_ <- rep1)
          adjudicate(q.name, "repartition(1)",
            s"${q.name}: explicit 1-partition repartition")
        val joins = lp.collectWithSubqueries { case j: Join => j }
        for (j <- joins) {
          if (isBroadcast(j.hint.leftHint) && rawData(j.left))
            adjudicate(q.name, "broadcast",
              s"${q.name}: broadcast hint over raw data (left: ${j.left.nodeName})")
          if (isBroadcast(j.hint.rightHint) && rawData(j.right))
            adjudicate(q.name, "broadcast",
              s"${q.name}: broadcast hint over raw data (right: ${j.right.nodeName})")
          if (!hasEquiKey(j) && rawData(j.left) && rawData(j.right))
            adjudicate(q.name, "nonequi",
              s"${q.name}: non-equi ${j.joinType} join, both sides raw")
        }
      }
    }
    assert(offenders.isEmpty,
      s"unadjudicated scale-hostile shapes:\n${offenders.distinct.mkString("\n")}")
    assert(unusedAllow.isEmpty,
      s"allowlist entries no longer exercised (stale adjudications):\n" +
        unusedAllow.mkString("\n"))
  }
}

/** The adjudicated-bounded frames: (query, pattern, why). Window
  * entries: pattern matches the order-axis string ('^' anchors to the
  * first sort attribute). "repartition(1)" / "broadcast" / "nonequi"
  * adjudicate those offence classes for the query. Each "why" must
  * name the bound that keeps the shape safe at scale. */
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
    ("q245_changepoint", "day",
      "day-grain aggregate below the (audit-visible) eager checkpoint: " +
        "calendar-bounded axis — the r6 blind spot, now swept via Ckpt.withAudit"),
    ("q80_merge_upsert", "broadcast",
      "updates side models a CDC batch — bounded by the arrival window, " +
        "not the base table; the orderkey%10 filter is the test-data stand-in"),
    ("q239_hits", "^a#",
      "authority rank window runs over the TakeOrdered top-10 slice (literal k)"),
    ("q239_hits", "^h#",
      "hub rank window runs over the TakeOrdered top-10 slice (literal k)"),
    ("q282_decayed_topk", "dmass",
      "leaderboard rank window runs over the TakeOrdered top-10 slice " +
        "(literal k); the all-time rank rides ScaleRank"),
    ("q314_tail_index", "^cents",
      "Hill rank window runs over the TakeOrdered top-201 slice (literal k)"),
    ("q330_token_budget", "quality_ppm",
      "greedy fill runs over the |sources| aggregate frame (source-domain " +
        "bounded, below a groupBy)"),
    ("q339_largest_remainder", "rem",
      "remainder rank runs over the |nations| aggregate frame " +
        "(nation-domain bounded, below a groupBy)"),
    ("q345_knapsack_mix", "source",
      "item ranking runs over the |sources| aggregate frame " +
        "(source-domain bounded, below a groupBy)"),
    ("q345_knapsack_mix", "density",
      "greedy fill runs over the |sources| aggregate frame " +
        "(source-domain bounded, below a groupBy)"),
    ("q348_ransac_consensus", "^h#",
      "seed pairing window runs over the TakeOrdered 32-row md5 slice " +
        "(literal k — the q112/q130 shape)"),
    ("q352_var_es", "^d#",
      "day-over-day lag window: calendar-bounded day axis"),
    ("q352_var_es", "^l#",
      "loss rank/prefix windows over the calendar-bounded day-P&L frame"),
    ("q355_burst_intervals", "repartition(1)",
      "sequential min-plus DP over the aggregated day axis " +
        "(calendar-bounded, the q164 shape)"),
    ("q355_burst_intervals", "^rn#",
      "island extraction over the calendar-bounded labeled day frame"),
    ("q357_pot_gpd", "^d#",
      "day-over-day lag window: calendar-bounded day axis"),
    ("q357_pot_gpd", "^l#",
      "loss rank window over the calendar-bounded day-P&L frame"),
    ("q360_diebold_mariano", "^d#",
      "both forecast lags ride one window over the calendar-bounded " +
        "day axis"),
    ("q365_hedge_regret", "repartition(1)",
      "sequential multiplicative-weights scan over the time-span-bounded " +
        "hour grid (the q355/q164 shape)"),
    ("q375_ucb_regret", "repartition(1)",
      "sequential UCB1 bandit replay over the time-span-bounded hour " +
        "grid (the q365 shape)"),
    ("q380_holt_winters", "repartition(1)",
      "sequential Holt-Winters state scan over the calendar-bounded " +
        "day axis (the q355/q365 shape)"),
    ("q383_gumbel_topk", "key_nano",
      "rank window runs over the TakeOrdered top-50 slice (literal k)"),
    ("q389_cooks_distance", "^d_nano",
      "rank window runs over the TakeOrdered top-10 slice (literal k)"),
    ("q390_lof", "^lof_milli",
      "rank window runs over the TakeOrdered top-15 slice (literal k)"))
}
