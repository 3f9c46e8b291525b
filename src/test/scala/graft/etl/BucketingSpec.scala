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

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed equi-join plans with zero Exchange and zero Sort") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4, Seq("l_orderkey"))
    // disable broadcast so the co-location claim is tested against the
    // shuffle-based join it replaces at scale
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // since 3.0 the sorted-bucket scan ordering is opt-in (the
      // one-file-per-bucket check it needs can be expensive on huge
      // file lists); writeBucketed guarantees one file per bucket
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val j = Bucketing.coLocatedJoin(spark, "b_lineitem", "l_orderkey", "b_orders", "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort "), plan) // sortBy buckets pre-sort the merge inputs
      // co-location must not change results: match the plain join
      val plain = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(j.count() === plain)
    }
  }

  test("bucket layout survives for repeated downstream joins") {
    // second, different-shape query on the same layout: still no Exchange
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import org.apache.spark.sql.functions._
      val agg = Bucketing
        .coLocatedJoin(spark, "b_lineitem", "l_orderkey", "b_orders", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = agg.queryExecution.executedPlan.toString
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange"), plan) // only the final agg shuffles
      assert(agg.count() > 0)
    }
  }
}
