package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-2 operators (q306–q312) —
  * laws the oracle hash gate cannot express, checked at sf0.001. */
class Round7bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q306 gopher rules: union bound holds, counts reconcile with a driver replay") {
    val rows = run("q306_gopher_rules")
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      val kills = Seq("kill_len", "kill_mwl", "kill_stop", "kill_rep")
        .map(r.getAs[Long])
      val pass = r.getAs[Long]("n_pass")
      kills.foreach(k => assert(k >= 0 && k <= n))
      assert(pass <= n)
      // union bound: at most sum(kills) docs were killed
      assert(pass >= n - kills.sum, s"union bound violated: $r")
    }
    // full driver replay of the rule battery (500 docs — trivial)
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
    val expect = docs.groupBy(_.getString(0)).map { case (lang, ds) =>
      var (kl, km, ks, kr, pass) = (0L, 0L, 0L, 0L, 0L)
      for (d <- ds) {
        val toks = d.getString(1).split(" ", -1)
        val n = toks.length.toLong
        val chr = toks.map(_.length.toLong).sum
        val mwl = 1000 * chr / n
        val topw = toks.groupBy(identity).values.map(_.length).max.toLong
        val fl = n < 25 || n > 90
        val fm = mwl < 4000 || mwl > 5100
        val fs = toks.count(stop) < 2
        val fr = 1000000 * topw / n > 125000
        if (fl) kl += 1; if (fm) km += 1; if (fs) ks += 1; if (fr) kr += 1
        if (!fl && !fm && !fs && !fr) pass += 1
      }
      lang -> ((kl, km, ks, kr, pass))
    }
    for (r <- rows) {
      val (kl, km, ks, kr, pass) = expect(r.getAs[String]("lang"))
      assert((r.getAs[Long]("kill_len"), r.getAs[Long]("kill_mwl"),
        r.getAs[Long]("kill_stop"), r.getAs[Long]("kill_rep"),
        r.getAs[Long]("n_pass")) == ((kl, km, ks, kr, pass)),
        s"replay mismatch for ${r.getAs[String]("lang")}: $r vs " +
          s"($kl,$km,$ks,$kr,$pass)")
    }
  }

  test("q307 DSIR: raw-only docs, descending avg weight, ratio identity") {
    val rows = run("q307_dsir_weights")
    assert(rows.length == 20)
    for (r <- rows) {
      assert(!Set("src0", "src1")(r.getAs[String]("source")),
        s"target-domain doc in raw ranking: $r")
      assert(r.getAs[Double]("avg_nn") ==
        r.getAs[Long]("logw_nn").toDouble / r.getAs[Long]("n_tok").toDouble)
    }
    val avgs = rows.map(_.getAs[Double]("avg_nn")).toSeq
    assert(avgs.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      s"not descending: $avgs")
  }

  test("q308 dedup growth: quartiles cover the corpus, driver replay agrees on totals") {
    val rows = run("q308_dedup_growth")
    assert(rows.length == 4)
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    for (r <- rows)
      assert(r.getAs[Long]("red_ppm") ==
        1000000L * r.getAs[Long]("n_redundant") / r.getAs[Long]("n_docs"))
    // brute-force replay of "shares a 5-span with an earlier doc"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val firstSeen = collection.mutable.Map[String, Long]()
    for ((id, t) <- docs.sortBy(_._1); i <- 0 to t.length - 5) {
      val sp = t.slice(i, i + 5).mkString(" ")
      if (!firstSeen.contains(sp) || firstSeen(sp) > id) firstSeen(sp) = id
    }
    val redundant = docs.count { case (id, t) =>
      (0 to t.length - 5).exists(i => firstSeen(t.slice(i, i + 5).mkString(" ")) < id)
    }
    assert(rows.map(_.getAs[Long]("n_redundant")).sum == redundant,
      s"replay says $redundant redundant docs")
  }

  test("q309 JM grid: one row per lambda, same test mass, positive NLL") {
    val rows = run("q309_jm_grid")
    assert(rows.map(_.getAs[Long]("lam_milli")).toSeq ==
      Seq(100L, 300L, 500L, 700L, 900L))
    assert(rows.map(_.getAs[Long]("n_bigrams")).distinct.length == 1,
      "every lambda must score the same held-out mass")
    rows.foreach(r => assert(r.getAs[Long]("avg_nll_nn") > 0))
  }

  test("q310 sign ANN: recall identity, bounded overlap, signal above zero") {
    val rows = run("q310_sign_ann")
    assert(rows.length == 10)
    for (r <- rows) {
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 10)
      assert(r.getAs[Long]("recall_ppm") == 100000L * n)
    }
    assert(rows.map(_.getAs[Long]("n_overlap")).sum > 0,
      "sign-bit Hamming found zero cosine-top-10 neighbors across all probes")
  }

  test("q311 JL distortion: mean near 1.0, min/mean/max ordered, all positive") {
    val rows = run("q311_jl_distortion")
    assert(rows.length == 1)
    val r = rows.head
    val (mn, mean, mx) = (r.getAs[Long]("min_milli"),
      r.getAs[Long]("mean_milli"), r.getAs[Long]("max_milli"))
    assert(r.getAs[Long]("n_pairs") == 32L * 31 / 2)
    assert(mn > 0 && mn <= mean && mean <= mx)
    assert(mean >= 700 && mean <= 1300,
      s"JL ratio mean should concentrate near 1000 milli, got $mean")
  }

  test("q312 effective rank: PR in [1, dim], exact BigInt replay per label") {
    val rows = run("q312_effective_rank")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val pr = r.getAs[Long]("pr_milli")
      assert(pr >= 1000 && pr <= 64000, s"PR outside [1, 64]: $r")
    }
    // exact replay with BigInt on one label
    val lbl = rows.head.getAs[Long]("label")
    val vecs = graft.Tables.embeddings(spark, dir)
      .filter(col("label") === lbl)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(v =>
        BigInt(math.floor(v.toDouble * 1000000).toLong)).toArray)
    val n = BigInt(vecs.length)
    val d = vecs.head.length
    var trA = BigInt(0); var trA2 = BigInt(0)
    for (i <- 0 until d; j <- 0 until d) {
      val q = vecs.map(v => v(i) * v(j)).sum
      val si = vecs.map(_(i)).sum
      val sj = vecs.map(_(j)).sum
      val a = n * q - si * sj
      if (i == j) trA += a
      trA2 += a * a
    }
    val expectPr = (BigDecimal(1000) * BigDecimal(trA) * BigDecimal(trA) /
      BigDecimal(trA2)).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    val got = rows.head.getAs[Long]("pr_milli")
    assert((got - expectPr).abs <= 1,
      s"label $lbl: got $got, exact replay $expectPr")
  }
}
