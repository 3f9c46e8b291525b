package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8 operators (q369+) — laws the
  * oracle hash gate cannot express, checked at sf0.001. */
class Round8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q369 HLL: estimate lands within the m=64 error regime") {
    val rows = run("q369_hll")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("exact")
      val est = r.getAs[Long]("hll_est")
      val v = r.getAs[Long]("v_zero")
      assert(v >= 0 && v <= 64)
      assert(est > 0)
      // 1.04/sqrt(64) = 13% standard error; 4 sigma = 52%
      assert(math.abs(est - exact).toDouble / exact < 0.52,
        s"HLL est $est vs exact $exact out of regime")
    }
  }

  test("q370 data Shapley: efficiency axiom holds exactly") {
    val rows = run("q370_data_shapley")
    assert(rows.length == 5, "five vendor shards")
    val vFull = rows.head.getAs[Long]("v_full")
    val nTest = rows.head.getAs[Long]("n_test")
    // sum of Shapley values = v(N) - v(empty) = v(N), in 1/120 units
    assert(rows.map(_.getAs[Long]("phi_120")).sum == 120L * vFull,
      "Shapley efficiency: sum phi = v(full)")
    assert(vFull >= 0 && vFull <= nTest)
    for (r <- rows)
      assert(math.abs(r.getAs[Long]("phi_120")) <= 120L * nTest)
  }

  test("q371 log-rank: O/E accounting and decision consistency") {
    val r = run("q371_logrank").head
    val o1 = r.getAs[Long]("obs_err_churn")
    val nErr = r.getAs[Long]("n_err")
    assert(nErr > 0 && r.getAs[Long]("n_ok") > 0,
      "median split must yield two non-empty groups")
    assert(o1 >= 0 && o1 <= nErr)
    val chi = Option(r.getAs[Any]("chi2_milli")).map(_.asInstanceOf[Long])
    chi.foreach { c =>
      assert(c >= 0)
      assert((c > 3841) == (r.getAs[Int]("reject_5pct") == 1))
    }
  }

  test("q372 DTW: LB_Keogh <= DTW <= lockstep, and a memoized replay agrees") {
    val r = run("q372_dtw").head
    val (lb, dtw, lock) = (r.getAs[Long]("lb_keogh"), r.getAs[Long]("dtw"),
      r.getAs[Long]("lockstep"))
    assert(lb <= dtw, s"LB_Keogh $lb must lower-bound DTW $dtw")
    assert(dtw <= lock, s"DTW $dtw must beat-or-match lockstep $lock")
    // independent top-down memoized replay of the banded DP
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("ts").cast("date").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
      .orderBy("d").collect()
    val as = daily.map(_.getAs[Long]("a"))
    val bs = daily.map(_.getAs[Long]("b"))
    val W = 7
    val n = as.length
    val memo = collection.mutable.Map[(Int, Int), Long]()
    val INF = Long.MaxValue / 4
    def f(i: Int, j: Int): Long =
      if (i < 0 || j < 0 || math.abs(i - j) > W) INF
      else memo.getOrElseUpdate((i, j), {
        val c = math.abs(as(i) - bs(j))
        if (i == 0 && j == 0) c
        else c + math.min(f(i - 1, j - 1), math.min(f(i - 1, j), f(i, j - 1)))
      })
    assert(f(n - 1, n - 1) == dtw, "banded DP replay diverged")
  }

  test("q373 PPR: the seed node carries the maximum personalized rank") {
    val rows = run("q373_ppr")
    assert(rows.length == 25)
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.sameElements(ranks.sortBy(-_)), "sorted by rank desc")
    // the seed is the min customer node; teleport mass keeps it on top
    val seed = graft.Tables.orders(spark, dir)
      .agg(min(col("o_custkey"))).head().getLong(0)
    assert(rows.head.getAs[Long]("node") == seed,
      s"seed $seed must head its own personalized ranking")
    // personalization: rank mass is conserved-ish (integer div leaks
    // only downward) — total never exceeds the teleport fixpoint SCALE
    assert(ranks.sum <= 1000000L)
  }

  test("q375 UCB1: play accounting and the per-round-oracle bound") {
    val rows = run("q375_ucb_regret")
    assert(rows.nonEmpty)
    // the clairvoyant per-round maximum dominates ANY policy (the
    // best-FIXED-arm baseline does not: adaptive switching may beat it)
    val hourly = graft.Tables.events(spark, dir)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"),
        col("event_type").as("s"))
      .agg(sum(floor(col("value") * 1000).cast("bigint")).as("v"))
      .collect()
    val vmax = hourly.map(_.getAs[Long]("v")).max
    val perHourMax = hourly.groupBy(_.getAs[Long]("h")).view
      .mapValues(_.map(r => 1000L * r.getAs[Long]("v") / vmax).max).toMap
    val hours = perHourMax.keys.toSeq.sorted
    var lastAlg = -1L
    for (r <- rows) {
      val (t, alg) = (r.getAs[Long]("t"), r.getAs[Long]("alg_milli"))
      assert(r.getAs[Long]("n_plays") == t, "exactly one play per round")
      val oracle = hours.take(t.toInt).map(perHourMax).sum
      assert(alg <= oracle, s"round $t: gain $alg beats the clairvoyant $oracle")
      assert(alg >= lastAlg, "rewards are non-negative, gain is monotone")
      lastAlg = alg
    }
  }

  test("q376 entropy rate: conditioning reduces entropy") {
    val rows = run("q376_entropy_rate")
    assert(rows.nonEmpty)
    val rate = rows.head.getAs[Long]("rate_nano")
    val h0 = rows.head.getAs[Long]("h0_nano")
    // rate <= H0 up to the per-term nano-floor slop (<= ~30 terms)
    assert(rate <= h0 + 50, s"entropy rate $rate must not exceed H0 $h0")
    assert(rate > 0 && h0 <= math.ceil(1e9 * math.log(5.0)).toLong + 50,
      "H0 is capped by ln(5) for five states")
    // pi is a near-distribution (integer-div mass leak only downward)
    val piSum = rows.map(_.getAs[Long]("pi_ppm")).sum
    assert(piSum <= 1000000L && piSum > 990000L, s"pi mass $piSum")
  }

  test("q377 IPW: stratification accounting") {
    val r = run("q377_ipw_ate").head
    assert(r.getAs[Long]("n_used") <= r.getAs[Long]("n_users"))
    assert(r.getAs[Long]("n_strata_used") >= 1 &&
      r.getAs[Long]("n_strata_used") <= 5)
    assert(r.getAs[Long]("n_treated") > 0 &&
      r.getAs[Long]("n_treated") < r.getAs[Long]("n_users"),
      "median split yields two arms")
  }

  test("q378 Fleiss kappa: vote accounting and range") {
    val r = run("q378_fleiss_kappa").head
    val nd = r.getAs[Long]("n_docs")
    val s1 = r.getAs[Long]("n_pos_votes")
    assert(s1 == r.getAs[Long]("p_len") + r.getAs[Long]("p_ttr") +
      r.getAs[Long]("p_mwl"))
    assert(s1 >= 0 && s1 <= 3 * nd)
    // strictly-above-median positives can never exceed half per rater
    for (c <- Seq("p_len", "p_ttr", "p_mwl"))
      assert(r.getAs[Long](c) <= nd / 2, s"$c above-median overflow")
    val k = r.getAs[Long]("kappa_micro")
    assert(k >= -1000000L && k <= 1000000L)
  }

  test("q379 Kruskal-Wallis: rank accounting identities") {
    val rows = run("q379_kruskal_wallis")
    assert(rows.length == 5)
    val n = rows.head.getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("n_g")).sum == n)
    // total doubled-rank mass: sum over groups of R2 = 2*(1+...+N) = N(N+1)
    assert(rows.map(_.getAs[Long]("rank2_sum")).sum == n * (n + 1),
      "doubled midranks must sum to N(N+1)")
    val h = rows.head.getAs[Long]("h_milli")
    val hc = rows.head.getAs[Long]("h_corrected_milli")
    assert(h >= 0 && hc >= h, "tie correction only inflates H")
  }

  test("q380 Holt-Winters: error accounting and forecast skill") {
    val rows = run("q380_holt_winters")
    assert(rows.nonEmpty)
    var (lastHw, lastSn) = (-1L, -1L)
    for (r <- rows) {
      val (hw, sn) = (r.getAs[Long]("sae_hw"), r.getAs[Long]("sae_sn"))
      assert(hw >= lastHw && sn >= lastSn, "absolute errors accumulate")
      lastHw = hw; lastSn = sn
    }
    val skill = rows.last.getAs[Long]("skill_milli")
    assert(skill > 0 && skill < 1000,
      s"HW must beat seasonal-naive on this seasonal feed (skill $skill)")
  }

  test("q381 k-truss: peel is monotone and lands on a fixpoint") {
    val rows = run("q381_ktruss")
    assert(rows.length == 5)
    var prev = Long.MaxValue
    for (r <- rows) {
      val (e, s) = (r.getAs[Long]("n_edges"), r.getAs[Long]("n_survivors"))
      assert(s <= e, "peeling never adds edges")
      assert(e <= prev, "edge sets are nested across rounds")
      prev = r.getAs[Long]("n_survivors")
    }
    val last = rows.last
    assert(last.getAs[Long]("n_edges") == last.getAs[Long]("n_survivors"),
      "final round must be a fixpoint: every survivor keeps its support")
  }

  test("q382 MI matrix: information inequalities hold") {
    val rows = run("q382_mi_matrix")
    assert(rows.length == 3)
    for (r <- rows) {
      val (mi, hx, hy) = (r.getAs[Long]("mi_nano"), r.getAs[Long]("hx_nano"),
        r.getAs[Long]("hy_nano"))
      // MI >= 0 up to per-cell nano-floor slop (<= 25 cells)
      assert(mi >= -50, s"MI must be non-negative: $mi")
      assert(mi <= math.min(hx, hy) + 50, "MI is capped by either entropy")
      val nmi = Option(r.getAs[Any]("nmi_milli")).map(_.asInstanceOf[Long])
      nmi.foreach(v => assert(v >= -1 && v <= 1000))
    }
  }

  test("q383 Gumbel top-k: a driver replay picks the identical sample, and it skews heavy") {
    val rows = run("q383_gumbel_topk")
    assert(rows.length == 50)
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      math.floor(1e9 * math.log((h.toDouble + 0.5) / 1152921504606846976.0)
        / w.toDouble).toLong
    }
    val expect = docs.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(50)
    val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"),
      r.getAs[Long]("key_nano")))
    assert(got.sameElements(expect), "exponential-key replay diverged")
    // weight-proportional sampling must oversample heavy docs
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean <= corpus mean $corpusMean")
  }

  test("q384 Cochran-Armitage: trend accounting") {
    val rows = run("q384_cochran_armitage")
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("score")).toSet == Set(1L, 2L, 3L, 4L, 5L))
    for (r <- rows)
      assert(r.getAs[Long]("n_fulfilled") <= r.getAs[Long]("n_g"))
    val chi = Option(rows.head.getAs[Any]("chi2_milli"))
      .map(_.asInstanceOf[Long])
    chi.foreach { c =>
      assert(c >= 0)
      assert((c > 3841) == (rows.head.getAs[Int]("reject_5pct") == 1))
    }
  }

  test("q385 Kendall W: rank-mass identity and range") {
    val r = run("q385_kendall_w").head
    val n = r.getAs[Long]("n_docs")
    // three raters' doubled midranks each sum to n(n+1)
    assert(r.getAs[Long]("rank2_total") == 3 * n * (n + 1),
      "doubled midrank mass must be 3n(n+1)")
    val w = r.getAs[Long]("w_milli")
    assert(w >= 0 && w <= 1000, s"tie-corrected W out of [0,1]: $w")
  }

  test("q386 n-gram novelty: monotone in n and properly bounded") {
    val rows = run("q386_ngram_novelty")
    assert(rows.length == 5)
    var last = -1L
    for (r <- rows) {
      val ppm = r.getAs[Long]("novelty_ppm")
      assert(ppm >= 0 && ppm <= 1000000)
      assert(r.getAs[Long]("novel_instances") <= r.getAs[Long]("test_instances"))
      assert(r.getAs[Long]("novel_types") <= r.getAs[Long]("n_types"))
      // longer contexts can only be MORE novel: a novel (n-1)-gram
      // makes every containing n-gram novel
      assert(ppm >= last, s"novelty must rise with n: $ppm after $last")
      last = ppm
    }
    assert(rows.last.getAs[Long]("novelty_ppm") > 0,
      "5-grams must show novelty or the split leaks")
  }

  test("q387 Ljung-Box: Q accounting against a driver ACF replay") {
    val rows = run("q387_ljung_box")
    assert(rows.length == 10)
    val q = rows.head.getAs[Long]("q_milli")
    assert(q >= 0)
    assert((q > 18307) == (rows.head.getAs[Int]("reject_5pct") == 1))
    // Q must equal the fold of the reported r_micro terms
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")).cast("bigint").as("x")).collect()
    val n = daily.length.toLong
    val fold = rows.map { r =>
      val (lag, rm) = (r.getAs[Long]("lag"), r.getAs[Long]("r_micro"))
      rm * rm / (1000 * (n - lag))
    }.sum
    assert(q == n * (n + 2) * fold / 1000000L, "Q fold mismatch")
  }

  test("q388 runs test: differenced white noise mean-reverts") {
    val r = run("q388_runs_test").head
    val (n, n1, n2) = (r.getAs[Long]("n"), r.getAs[Long]("n_up"),
      r.getAs[Long]("n_down"))
    assert(n1 + n2 == n)
    val runs = r.getAs[Long]("n_runs")
    assert(runs >= 1 && runs <= n)
    // day-over-day deltas of iid daily sums are MA(1) with rho=-1/2:
    // the test must detect EXCESS runs (mean reversion), not momentum
    val expected = 1.0 + 2.0 * n1 * n2 / n
    assert(runs > expected, s"runs $runs <= E[R] $expected on differenced noise")
    assert(r.getAs[Int]("reject_5pct") == 1,
      "alternation in differenced white noise must reject")
  }

  test("q389 Cook's distance: leverage and influence sanity") {
    val rows = run("q389_cooks_distance")
    assert(rows.length == 10)
    val ds = rows.map(_.getAs[Long]("d_nano"))
    assert(ds.sameElements(ds.sortBy(-_)), "sorted by influence")
    for (r <- rows) {
      val h = r.getAs[Long]("h_nano")
      // leverage of a 2-parameter fit lies in [1/n, 1]
      assert(h > 0 && h <= 1000000000L, s"leverage out of range: $h")
      assert(r.getAs[Long]("d_nano") >= 0)
    }
  }

  test("q390 LOF: density-ratio semantics and the brute-force replay on resolved points") {
    val rows = run("q390_lof")
    assert(rows.length == 15)
    val lofs = rows.map(_.getAs[Long]("lof_milli"))
    assert(lofs.sameElements(lofs.sortBy(-_)), "sorted by LOF desc")
    assert(lofs.head > 1000, "the top outlier must be sparser than its neighbors")
    for (r <- rows) assert(r.getAs[Long]("lrd_ppb") > 0)
    // brute-force kNN check: for each RESOLVED top row, the block
    // k-distance must equal the true global k-distance
    val pts = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        (floor(element_at(col("embedding"), 1).cast("double") * 1000000L)
          .cast("long") + 10000000L).as("qx"),
        (floor(element_at(col("embedding"), 2).cast("double") * 1000000L)
          .cast("long") + 10000000L).as("qy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (r <- rows if r.getAs[Int]("resolved") == 1) {
      val id = r.getAs[Long]("vec_id")
      val (_, ax, ay) = pts.find(_._1 == id).get
      val d5 = pts.filter(_._1 != id)
        .map { case (_, bx, by) =>
          val d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
          math.floor(math.sqrt(d2.toDouble)).toLong
        }.sorted.apply(4)
      assert(d5 == r.getAs[Long]("kdist_micro"),
        s"vec $id: resolved block k-dist must be the exact global k-dist")
    }
  }

  test("q391 Friedman: within-block rank mass is conserved") {
    val rows = run("q391_friedman")
    assert(rows.length == 7)
    val n = rows.head.getAs[Long]("n_weeks")
    assert(rows.forall(_.getAs[Long]("n_weeks") == n), "complete blocks only")
    // each block's doubled midranks sum to 7*8 = 56; totals to 56n
    assert(rows.map(_.getAs[Long]("rank2_sum")).sum == 56 * n,
      "block rank mass must be conserved")
    val chi = rows.head.getAs[Long]("chi2_milli")
    assert(chi >= 0)
    assert((chi > 12592) == (rows.head.getAs[Int]("reject_5pct") == 1))
  }

  test("q374 TextTiling: boundary counts are gap-bounded and rules fire") {
    val rows = run("q374_texttiling")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (g, b) = (r.getAs[Long]("n_gaps"), r.getAs[Long]("n_boundaries"))
      assert(b >= 0 && b <= g)
      assert(r.getAs[Long]("boundary_rate_milli") == 1000 * b / g)
    }
    assert(rows.map(_.getAs[Long]("n_boundaries")).sum > 0,
      "the cutoff must actually segment something")
  }
}
