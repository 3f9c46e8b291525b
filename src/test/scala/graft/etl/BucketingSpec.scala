package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout contract: equi-joining two tables bucketed on
  * their join keys with equal bucket counts plans with NO Exchange —
  * the co-location replaces the per-query shuffle — and pre-sorted
  * buckets drop the per-task Sort as well. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // written once, used by every test — tests stay order-independent
  private lazy val layout: Unit = {
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet"),
      "b_orders", "o_orderkey", 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet"),
      "b_lineitem", "l_orderkey", 4, Seq("l_orderkey"))
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // disable broadcast so the co-location claim is tested against the
  // shuffle-based join it replaces at scale; the sorted-bucket scan
  // ordering is opt-in since 3.0 (the one-file-per-bucket check it
  // needs can be expensive on huge file lists) and writeBucketed
  // guarantees one file per bucket
  private def bucketedConf[A](body: => A): A = withConf(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")(body)

  test("bucketed equi-join plans with zero Exchange and zero Sort") {
    layout
    bucketedConf {
      val j = Bucketing.coLocatedJoin(spark, "b_lineitem", "l_orderkey", "b_orders", "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort "), plan) // sortBy buckets pre-sort the merge inputs
      // co-location must not change results: match the plain join
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val plain = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(j.count() === plain)
    }
  }

  test("bucket layout survives for repeated downstream joins") {
    layout
    // second, different-shape query on the same layout: still no
    // Exchange anywhere below the join (only the final agg shuffles)
    bucketedConf {
      import org.apache.spark.sql.functions._
      val agg = Bucketing
        .coLocatedJoin(spark, "b_lineitem", "l_orderkey", "b_orders", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = agg.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange"), plan)
      assert(agg.count() > 0)
    }
  }
}
