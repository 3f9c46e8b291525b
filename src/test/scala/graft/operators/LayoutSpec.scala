package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the clustering claim itself — a min/max-statistics
  * pruner over the z-ordered layout skips most files for a selective
  * filter on EITHER dimension, where a single-column sort only serves
  * its own leading column. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val FILES = 16
  private val N = 4096 // 64x64 grid, 256 rows per file

  /** Per-file min/max stats for a layout ordered by `orderCol`. */
  private def stats(order: org.apache.spark.sql.Column) = {
    val d = (0 until N).map { i => (i.toLong, (i % 64).toLong, (i / 64).toLong) }
      .toDF("id", "sz", "pb")
      .withColumn("zv", Layout.zval("sz", "pb", 6))
    d.withColumn("rn", row_number().over(Window.orderBy(order, col("id"))))
      .withColumn("file_id", expr(s"(rn - 1) div ${N / FILES}"))
      .groupBy("file_id")
      .agg(min("sz").as("min_sz"), max("sz").as("max_sz"),
        min("pb").as("min_pb"), max("pb").as("max_pb"))
  }

  test("z-order prunes selective filters on BOTH dimensions; single-dim sort fails the other dim") {
    val zStats = stats(col("zv")).cache()
    val szStats = stats(col("sz")).cache()
    // a 1/4-range filter on each single dimension
    val szQ = Some((8L, 23L)); val pbQ = Some((16L, 31L))
    // z-order: both dims prune to at most half the files
    assert(Layout.filesScanned(zStats, szQ, None) <= FILES / 2)
    assert(Layout.filesScanned(zStats, None, pbQ) <= FILES / 2)
    // size-sorted layout: perfect on size, useless on price
    assert(Layout.filesScanned(szStats, szQ, None) <= FILES / 2)
    assert(Layout.filesScanned(szStats, None, pbQ) == FILES)
    // the 2-D box is strictly better under z-order than either 1-D prune
    val zBox = Layout.filesScanned(zStats, szQ, pbQ)
    assert(zBox <= Layout.filesScanned(zStats, szQ, None))
    assert(zBox <= FILES / 4, s"z-order box scan hit $zBox files")
  }

  test("zval is the Morton interleave: bit-exact on known vectors") {
    // interleave(a=0b101, b=0b011) = a even bits, b odd bits:
    // a bits 1,0,1 -> positions 0,2,4 = 1 + 0 + 16 = 17
    // b bits 1,1,0 -> positions 1,3,5 = 2 + 8 + 0  = 10
    val r = Seq((5L, 3L)).toDF("sz", "pb")
      .select(Layout.zval("sz", "pb", 6).as("zv")).head().getLong(0)
    assert(r == 27L)
    // zvalSql mirrors the same arithmetic text for the oracle
    assert(Layout.zvalSql("sz", "pb", 2).contains("// 1"))
  }

  test("withHilbert is the canonical curve: bijective and unit-step adjacent") {
    // reference: the canonical xy2d recursion (Wikipedia form)
    def xy2d(n: Int, x0: Int, y0: Int): Int = {
      var (x, y, d) = (x0, y0, 0)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) { // rotate
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 4 // exhaustive over the 16x16 grid
    val n = 1 << bits
    val grid = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val got = Layout.withHilbert(grid.toDF("x", "y"), "x", "y", bits, "hv")
      .select("x", "y", "hv").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    // matches the reference on every cell
    for (((x, y), hv) <- got)
      assert(hv == xy2d(n, x, y).toLong, s"mismatch at ($x,$y)")
    // bijection onto 0..n^2-1
    assert(got.values.toSeq.sorted == (0L until (n.toLong * n)).toSeq)
    // the Hilbert property Morton lacks: consecutive codes are GRID
    // NEIGHBORS (L1 distance exactly 1) — no diagonal jumps, ever
    val byD = got.map(_.swap)
    for (d <- 0L until (n.toLong * n - 1)) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d ($x1,$y1) and d+1 ($x2,$y2)")
    }
  }

  test("q289 degrades to an empty report on an empty fact instead of crashing") {
    // ADVICE r13: with an empty cube source the collected lattice has
    // no base view and the driver greedy threw (size(7L) /
    // bene.values.max). The oracle's report is empty there (NULL pick
    // masks match no names row) — pin the same degradation.
    val dir = java.nio.file.Files.createTempDirectory("graft-q289-empty")
      .toString
    for (t <- Seq("lineitem", "orders")) {
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val out = Layout.q289ViewSelection.build(spark, dir)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ==
      Seq("rk", "view_name", "view_size", "benefit", "total_cost_after"))
  }
}
