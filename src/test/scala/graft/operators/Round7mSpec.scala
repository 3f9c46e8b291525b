package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q348+, checked at sf0.001 with full driver
  * replays. */
class Round7mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q348 RANSAC: driver replay of seeding, consensus, and refit") {
    val rows = run("q348_ransac_consensus")
    assert(rows.nonEmpty && rows.length <= 16)
    // driver replay: same md5 seeding, same integer inlier test
    val pts = graft.Tables.lineitem(spark, dir)
      .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"),
        expr("concat(CAST(l_orderkey AS STRING), '|', " +
          "CAST(l_linenumber AS STRING))").as("k"))
      .withColumn("h",
        expr("CAST(conv(substring(md5(k), 1, 15), 16, 10) AS BIGINT)"))
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[String]("k"),
        r.getAs[Long]("x"), r.getAs[Long]("y")))
    val seed = pts.sortBy(t => (t._1, t._2, t._3, t._4)).take(32)
    val cands = seed.grouped(2).zipWithIndex.collect {
      case (Array(a, b), i) if a._3 != b._3 =>
        (i + 1L, a._3, a._4, b._3, b._4)
    }.toSeq
    assert(rows.map(_.getAs[Long]("cand")).toSet == cands.map(_._1).toSet)
    val TOL = 300000L
    val byCand = rows.map(r => r.getAs[Long]("cand") -> r).toMap
    for ((c, x1, y1, x2, y2) <- cands) {
      val r = byCand(c)
      assert((r.getAs[Long]("x1"), r.getAs[Long]("y1"),
        r.getAs[Long]("x2"), r.getAs[Long]("y2")) == ((x1, y1, x2, y2)))
      val inl = pts.filter { case (_, _, x, y) =>
        math.abs((y - y1) * (x2 - x1) - (y2 - y1) * (x - x1)) <=
          TOL * math.abs(x2 - x1)
      }
      assert(r.getAs[Long]("n_inliers") == inl.length.toLong,
        s"cand $c inlier count")
      // the two seed points are inliers of their own line by identity
      assert(inl.length >= 2)
      // exact LS refit replay (double chain mirrors the shared SQL)
      val n = inl.length.toDouble
      val sx = inl.map(_._3).sum.toDouble
      val sy = inl.map(t => BigInt(t._4)).sum.toDouble
      val sxy = inl.map(t => BigInt(t._3) * BigInt(t._4)).sum.toDouble
      val sxx = inl.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
      val den = n * sxx - sx * sx
      if (den == 0.0) assert(r.isNullAt(r.fieldIndex("ls_slope_milli")))
      else {
        val num = n * sxy - sx * sy
        assert(r.getAs[Long]("ls_slope_milli") ==
          math.floor(1000.0 * num / den).toLong, s"cand $c slope")
        assert(r.getAs[Long]("ls_icept_cents") ==
          math.floor((sy - (num / den) * sx) / n).toLong, s"cand $c icept")
      }
    }
    // ordering: consensus-descending, candidate-id tiebreak
    val key = rows.map(r => (-r.getAs[Long]("n_inliers"), r.getAs[Long]("cand")))
    assert(key.sameElements(key.sorted), "rows ordered by consensus desc")
  }

  test("q349 variance-time: sequential block replay and OLS identity") {
    val rows = run("q349_variance_time")
    assert(rows.map(_.getAs[Long]("m")).toSeq ==
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L))
    // driver replay: minute counts -> block sums -> population variance
    val mins = graft.Tables.events(spark, dir)
      .groupBy(expr("unix_micros(ts) div 60000000").as("mn"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getAs[Long]("mn"), r.getAs[Long]("c"))).toMap
    val lo = mins.keys.min; val hi = mins.keys.max
    for (r <- rows) {
      val m = r.getAs[Long]("m")
      val blocks = mins.groupBy { case (mn, _) =>
        math.floorDiv(mn, m)
      }.map { case (_, kv) => kv.values.sum }
      val nt = math.floorDiv(hi, m) - math.floorDiv(lo, m) + 1
      assert(r.getAs[Long]("n_blocks") == nt)
      assert(r.getAs[Long]("nz_blocks") == blocks.size.toLong)
      val s1 = blocks.sum.toDouble
      val s2 = blocks.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val varMicro = math.floor(
        (1000000.0 * (nt.toDouble * s2 - s1 * s1)) /
          (nt.toDouble * nt.toDouble)).toLong
      assert(r.getAs[Long]("var_micro") == varMicro, s"m=$m var")
      // zeros included: variance must be >= the nonzero-only estimate
      // whenever the axis has empty blocks (sparsity adds spread
      // around a smaller mean at fine scales; just pin positivity)
      assert(varMicro > 0)
    }
    // OLS replay over the micro-nat points
    val pts = rows.map { r =>
      (math.floor(1e6 * math.log(r.getAs[Long]("m").toDouble)),
        math.floor(1e6 * math.log(r.getAs[Long]("var_micro").toDouble)))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = math.floor(
      (1000000.0 * (n * sxy - sx * sy)) / (n * sxx - sx * sx)).toLong
    val hurst = math.floor(
      (500000.0 * (n * sxy - sx * sy)) / (n * sxx - sx * sx)).toLong
    for (r <- rows) {
      assert(r.getAs[Long]("n_fit") == 9L)
      assert(r.getAs[Long]("slope_ppm") == slope)
      assert(r.getAs[Long]("hurst_ppm") == hurst)
    }
    // traffic verdict stays in the physical range (0, 1]·1e6 slope in
    // (0, 2]·1e6 for any counting process
    assert(slope > 0 && slope <= 2000000L, s"slope_ppm $slope")
  }
}
