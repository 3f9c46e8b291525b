package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-8 operators (q332–q335),
  * checked at sf0.001 with brute-force replays. */
class Round7hSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q332 committee: vote bounds, queue ordering, odd half only") {
    val rows = run("q332_committee")
    assert(rows.length == 20)
    for (r <- rows) {
      assert(r.getAs[Long]("vec_id") % 2 == 1)
      val c = r.getAs[Long]("n_correct")
      val d = r.getAs[Long]("n_distinct_preds")
      assert(c >= 0 && c <= 8)
      assert(d >= 1 && d <= 8)
    }
    val key = rows.map(r => (r.getAs[Long]("n_correct"),
      -r.getAs[Long]("n_distinct_preds"), r.getAs[Long]("vec_id"))).toSeq
    assert(key == key.sorted, "queue must be (correct asc, ambiguity desc)")
  }

  test("q333 simhash radius: block join is COMPLETE — all-pairs replay agrees") {
    val rows = run("q333_simhash_radius")
    assert(rows.map(_.getAs[Long]("d")).toSeq == Seq(0L, 1L, 2L, 3L))
    // brute-force signature + all-pairs Hamming histogram
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val sigs = docs.map { case (_, toks) =>
      val n = toks.length
      (0 until 16).map { b =>
        val s = toks.map(t => md5hex(t)(b).toInt % 2).sum
        if (2 * s > n) 1 << b else 0
      }.sum
    }
    val hist = Array.fill(4)(0L)
    for (i <- sigs.indices; j <- i + 1 until sigs.length) {
      val d = Integer.bitCount(sigs(i) ^ sigs(j))
      if (d <= 3) hist(d) += 1
    }
    for (r <- rows)
      assert(r.getAs[Long]("n_pairs") == hist(r.getAs[Long]("d").toInt),
        s"d=${r.getAs[Long]("d")}: ${r.getAs[Long]("n_pairs")} vs " +
          s"${hist(r.getAs[Long]("d").toInt)}")
  }

  test("q334 temporal leakage: overlap bounded, identity holds") {
    val rows = run("q334_temporal_leakage")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (tr, te, ov) = (r.getAs[Long]("n_train_users"),
        r.getAs[Long]("n_test_users"), r.getAs[Long]("n_overlap"))
      assert(ov <= math.min(tr, te))
      assert(te > 0)
      assert(r.getAs[Long]("leak_ppm") == 1000000L * ov / te)
    }
  }

  test("q335 stratification: halves cover the corpus, terms non-negative") {
    val rows = run("q335_split_stratification")
    assert(rows.length == 10)
    val n = rows.map(r => r.getAs[Long]("n_even") + r.getAs[Long]("n_odd")).sum
    assert(n == graft.Tables.embeddings(spark, dir).count())
    rows.foreach(r => assert(r.getAs[Long]("term_milli") >= 0))
    // vec_ids are assigned independently of label: the split should
    // not be wildly unbalanced (chi2(9) at alpha=1e-6 is ~45)
    assert(rows.map(_.getAs[Long]("term_milli")).sum <= 45000L,
      "even/odd label split reads as systematically stratified")
  }

  test("q336 DKW: bands bracket the estimate and widen with tail p") {
    val rows = run("q336_dkw_bands")
    assert(rows.map(_.getAs[Long]("p_milli")).toSeq == Seq(500L, 900L, 990L))
    val n = graft.Tables.orders(spark, dir).count()
    for (r <- rows) {
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("est_cents"))
      assert(r.getAs[Long]("est_cents") <= r.getAs[Long]("hi_cents"))
      val eps = r.getAs[Long]("eps_ppm")
      val expectEps = math.floor(1e6 *
        math.sqrt(math.log(40.0) / (2.0 * n))).toLong
      assert(eps == expectEps)
    }
    // estimates are monotone in p
    val ests = rows.map(_.getAs[Long]("est_cents")).toSeq
    assert(ests.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true })
  }

  test("q337 collision curve: fewer collisions with bigger tables, prediction replay") {
    val rows = run("q337_hash_collision_curve")
    assert(rows.map(_.getAs[Long]("b")).toSeq == Seq(1024L, 4096L, 16384L))
    val ms = rows.map(_.getAs[Long]("measured_ppm")).toSeq
    assert(ms.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      s"collision rate must fall with table size: $ms")
    for (r <- rows) {
      val (n, b) = (r.getAs[Long]("n_distinct"), r.getAs[Long]("b"))
      assert(r.getAs[Long]("n_buckets") <= math.min(n, b))
      assert(r.getAs[Long]("measured_ppm") ==
        1000000L * (n - r.getAs[Long]("n_buckets")) / n)
      val pred = math.floor(1e6 * (n.toDouble - b.toDouble *
        (1.0 - math.exp(n.toDouble * math.log(1.0 - 1.0 / b)))) / n).toLong
      assert(r.getAs[Long]("predicted_ppm") == pred)
      // md5 behaves like a uniform hash: measured within 4x of the
      // birthday prediction, and not absurdly below it either
      assert(r.getAs[Long]("measured_ppm") <= 4 * pred + 2000)
    }
  }
}
