package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-6 operators (q327–q328),
  * checked at sf0.001 with full driver replays. */
class Round7fSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q327 DP median: full exponential-mechanism replay per segment") {
    val rows = run("q327_dp_median")
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("bin_err") >= 0 && r.getAs[Long]("bin_err") <= 63)
      assert(r.getAs[Long]("rank_err_ppm") >= 0 &&
        r.getAs[Long]("rank_err_ppm") <= 1000000L)
    }
    // replay: bins, CDF, Gumbel scores, argmax — all from raw parquet
    val o = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mn = o.map(_._2).min; val mx = o.map(_._2).max
    val bySeg = o.groupBy(_._1)
    for (r <- rows) {
      val seg = r.getAs[String]("seg")
      val cs = bySeg(seg).map(_._2)
      val hist = Array.fill(64)(0L)
      for (c <- cs) hist(math.min(63, (64 * (c - mn) / (mx - mn + 1)).toInt)) += 1
      val cum = hist.scanLeft(0L)(_ + _).tail
      val n = cs.length.toLong
      assert(r.getAs[Long]("n_orders") == n)
      val trueBin = cum.indexWhere(c => 2 * c >= n)
      assert(r.getAs[Long]("true_bin") == trueBin)
      val scores = (0 until 64).map { b =>
        val uhex = java.lang.Long.parseLong(
          md5hex(s"em${seg}_$b").take(15), 16)
        val u = (uhex.toDouble + 0.5) / 1152921504606846976.0
        (0.125 * -math.abs(2 * cum(b) - n).toDouble +
          -math.log(-math.log(u)), b)
      }
      val pick = scores.maxBy { case (s, b) => (s, -b) }._2
      assert(r.getAs[Long]("dp_bin") == pick.toLong,
        s"$seg: replay picked $pick, query ${r.getAs[Long]("dp_bin")}")
    }
  }

  test("q328 kappa: po identity, kappa bounded, confusion replay") {
    val rows = run("q328_cohens_kappa")
    assert(rows.nonEmpty)
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
    for (r <- rows) {
      val lang = r.getAs[String]("lang")
      val ds = docs.filter(_.getString(0) == lang)
      val cells = ds.map { d =>
        val t = d.getString(1).split(" ", -1)
        val a = t.length >= 25 && t.length <= 90
        val b = t.count(stop) >= 2
        (a, b)
      }
      val n = cells.length.toLong
      val n11 = cells.count(c => c._1 && c._2).toLong
      val n00 = cells.count(c => !c._1 && !c._2).toLong
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n11") == n11 && r.getAs[Long]("n00") == n00)
      assert(r.getAs[Long]("po_milli") == 1000 * (n11 + n00) / n)
      val k = r.getAs[Long]("kappa_milli")
      assert(k >= -1000 && k <= 1000)
    }
  }
}
