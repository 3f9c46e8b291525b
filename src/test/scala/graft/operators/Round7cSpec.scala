package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-3 operators (q313–q317) —
  * laws the oracle hash gate cannot express, checked at sf0.001. */
class Round7cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q313 balance: arms cover all customers, balanced flag matches the bar") {
    val rows = run("q313_covariate_balance")
    assert(rows.map(_.getAs[String]("feature")).sorted.toSeq ==
      Seq("acctbal_cents", "n_orders", "spend_cents"))
    val nCust = graft.Tables.customer(spark, dir).count()
    for (r <- rows) {
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nCust)
      assert((r.getAs[Long]("balanced") == 1L) ==
        (math.abs(r.getAs[Long]("smd_milli")) <= 100), s"flag mismatch: $r")
    }
    // the hashed coin must not be degenerate
    assert(rows.forall(r => r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0))
  }

  test("q314 Hill: alpha positive, xmin descending in k, replay at k=50") {
    val rows = run("q314_tail_index")
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(50L, 100L, 200L))
    val xmins = rows.map(_.getAs[Long]("xmin_cents")).toSeq
    assert(xmins.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      s"deeper tail cannot raise the threshold: $xmins")
    rows.foreach(r => assert(r.getAs[Long]("hill_milli") > 0))
    // driver replay with the same floor-per-term integer contract
    val cents = graft.Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, k) => (-c, k) }
    val k = 50
    val xmin = cents(k)._1 // rank k+1 (0-based index k)
    val sum = cents.take(k).map { case (c, _) =>
      math.floor(1e9 * math.log(c.toDouble / xmin.toDouble)).toLong
    }.sum
    val expect = k.toLong * 1000000000000L / sum
    assert(rows.head.getAs[Long]("hill_milli") == expect,
      s"k=50 replay: got ${rows.head.getAs[Long]("hill_milli")}, want $expect")
  }

  test("q315 capture-recapture: estimator identity and bounds") {
    val r = run("q315_capture_recapture").head
    val (n1, n2, m, nTrue, nHat) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"), r.getAs[Long]("n_true"), r.getAs[Long]("n_hat"))
    assert(nHat == (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(m <= math.min(n1, n2))
    // every user seen in at least one half
    assert(nTrue <= n1 + n2 && nTrue >= math.max(n1, n2))
    // Chapman is >= the union lower bound observed
    assert(nHat >= m)
    val err = r.getAs[Long]("err_ppm")
    assert(math.abs(err) == 1000000L * math.abs(nHat - nTrue) / nTrue)
  }

  test("q316 power: larger lift needs fewer samples, rarer baseline needs more") {
    val rows = run("q316_power_analysis")
    assert(rows.nonEmpty && rows.length % 3 == 0)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    for ((_, rs) <- byType) {
      val sorted = rs.sortBy(_.getAs[Long]("lift_pct"))
      assert(sorted.map(_.getAs[Long]("lift_pct")).toSeq == Seq(2L, 5L, 10L))
      val ns = sorted.map(_.getAs[Long]("n_per_arm")).toSeq
      assert(ns.sliding(2).forall { case Seq(a, b) => a > b; case _ => true },
        s"n must fall as lift grows: $ns")
      ns.foreach(n => assert(n > 0))
    }
  }

  test("q317 W1: zero against itself, bounded by 1000 milli, global is mixture") {
    val rows = run("q317_wasserstein")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val w = r.getAs[Long]("w1_milli")
      assert(w >= 0 && w <= 1000, s"W1 on normalized support is in [0,1]: $r")
    }
    // total orders must reconcile
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      graft.Tables.orders(spark, dir).count())
  }
}
