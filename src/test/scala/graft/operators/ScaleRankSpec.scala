package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The two-level distributed rank must be BYTE-identical to the window
  * form it replaces (q119/q129/q133 keep their ntile/row_number
  * oracles) while keeping every task bounded by a range chunk — the
  * whole point of the swap. Both halves are pinned here.
  */
class ScaleRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withRowNumber equals the row_number window, grouped and global") {
    val rnd = new Random(42)
    val rows = (1 to 2000).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(50), i)
    }
    val df = rows.toDF("g", "v", "id")

    val grouped = ScaleRank.withRowNumber(df, Seq("g"),
      Seq(col("v"), col("id")), "rk", "n")
    val wantG = df.withColumn("rk",
        row_number().over(Window.partitionBy("g").orderBy(col("v"), col("id")))
          .cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("g")))
    assert(grouped.select("g", "v", "id", "rk", "n").except(wantG).isEmpty &&
      wantG.except(grouped.select("g", "v", "id", "rk", "n")).isEmpty)

    val global = ScaleRank.withRowNumber(df, Nil,
      Seq(col("v").desc, col("id")), "rk", "n")
    val wantAll = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy().orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    assert(global.select("g", "v", "id", "rk", "n").except(wantAll).isEmpty &&
      wantAll.except(global.select("g", "v", "id", "rk", "n")).isEmpty)
  }

  test("withRunningSum equals the running-sum window, grouped and with desc sort") {
    val rnd = new Random(11)
    val rows = (1 to 3000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(100), rnd.nextInt(20).toLong - 5, i)
    }
    val df = rows.toDF("g", "v", "w", "id")
    val got = ScaleRank.withRunningSum(df, Seq("g"),
      Seq(col("v"), col("id")), col("w"), "cw")
    val want = df.withColumn("cw",
      sum(col("w")).over(Window.partitionBy("g").orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("g", "v", "w", "id", "cw").except(want).isEmpty &&
      want.except(got.select("g", "v", "w", "id", "cw")).isEmpty)

    // desc sort order (the q138 sweep shape: ORDER BY us, delta DESC)
    val got2 = ScaleRank.withRunningSum(df, Seq("g"),
      Seq(col("v"), col("w").desc, col("id")), col("w"), "cw")
    val want2 = df.withColumn("cw",
      sum(col("w")).over(
        Window.partitionBy("g").orderBy(col("v"), col("w").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got2.select("g", "v", "w", "id", "cw").except(want2).isEmpty &&
      want2.except(got2.select("g", "v", "w", "id", "cw")).isEmpty)
  }

  test("withRunningMax equals the running-max window, inclusive and strictly-preceding") {
    val rnd = new Random(23)
    val rows = (1 to 2000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(80), rnd.nextInt(1000).toLong, i)
    }
    val df = rows.toDF("g", "v", "x", "id")
    for (inclusive <- Seq(true, false)) {
      val end = if (inclusive) Window.currentRow else -1L
      val got = ScaleRank.withRunningMax(df, Seq("g"),
        Seq(col("v"), col("id")), col("x"), "mx", inclusive)
      val want = df.withColumn("mx",
        max(col("x")).over(Window.partitionBy("g").orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, end)))
      assert(got.select("g", "v", "x", "id", "mx").except(want).isEmpty &&
        want.except(got.select("g", "v", "x", "id", "mx")).isEmpty,
        s"inclusive=$inclusive")
      if (!inclusive) {
        // the strictly-preceding frame must be NULL on each group's
        // first row (empty prefix), not 0 or the row's own value
        val firsts = got.withColumn("rk",
          row_number().over(Window.partitionBy("g").orderBy(col("v"), col("id"))))
          .filter(col("rk") === 1)
        assert(firsts.count() > 0 && firsts.filter(col("mx").isNotNull).count() == 0)
      }
    }
  }

  test("ntileFromRank equals the ntile window for every (n, k) shape") {
    // covers n < k, n == k, n mod k == 0, and ragged remainders
    for (n <- Seq(1, 3, 4, 5, 7, 8, 40, 41, 42, 43, 97); k <- Seq(2, 3, 4, 10)) {
      val df = (1 to n).map(i => (i, i.toLong)).toDF("id", "rk")
        .withColumn("n", lit(n.toLong))
      val got = df.select(col("id"),
        ScaleRank.ntileFromRank(k, col("rk"), col("n")).as("t"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy("id")).cast("long").as("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("one dominant group stays bounded: no task sees more than a range chunk") {
    // 90% of rows in one group — the shape that melts a
    // PARTITION BY seg window into a single giant sort task
    val rnd = new Random(7)
    val rows = (1 to 20000).map { i =>
      val g = if (rnd.nextInt(10) == 0) s"g${1 + rnd.nextInt(4)}" else "g0"
      (g, rnd.nextInt(1000000), i)
    }
    val df = rows.toDF("g", "v", "id")
    // AQE's byte-bounded coalescing folds this KB-scale input into one
    // partition (itself a boundedness guarantee); disable it so the
    // row-count invariant is observable at test size
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
    val perChunk = ScaleRank
      .rangedWithPid(df, Seq("g"), Seq(col("v"), col("id")), "pid")
      .groupBy("pid").count()
      .collect().map(_.getLong(1))
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(perChunk.length > 1, "range partitioner used a single chunk")
    // sampled boundaries are approximate; 4x the ideal chunk is ample
    // slack while still proving the dominant group got SPLIT
    val bound = 4L * (20000 / p + 1)
    assert(perChunk.max <= bound,
      s"chunk of ${perChunk.max} rows exceeds $bound — dominant group not split")
    // and the result on the skewed shape still matches the window form
    val got = ScaleRank.withRowNumber(df, Seq("g"), Seq(col("v"), col("id")),
      "rk", "n").select("g", "v", "id", "rk")
    val want = df.withColumn("rk",
      row_number().over(Window.partitionBy("g").orderBy(col("v"), col("id")))
        .cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    } finally spark.conf.set(coalesceKey, saved)
  }
}
