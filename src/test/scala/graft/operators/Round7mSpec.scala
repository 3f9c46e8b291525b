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

  test("q350 RAKE: driver replay of segmentation, scoring, ranking") {
    val rows = run("q350_rake_keywords")
    assert(rows.length <= 20 && rows.nonEmpty)
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    // phrases: maximal stopword-free runs, capped at 4 words
    val phrases = docs.flatMap { case (d, t) =>
      val runs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      for (w <- t.split(" ")) {
        if (stop(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.filter(_.length <= 4).map(ws => (d, ws))
    }
    val freq = phrases.flatMap(_._2).groupBy(identity).map {
      case (w, xs) => w -> xs.length.toLong
    }
    val deg = phrases.flatMap { case (_, ws) =>
      ws.map(w => w -> ws.length.toLong)
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val wscore = freq.map { case (w, f) => w -> 1000000L * deg(w) / f }
    val expected = phrases
      .map { case (_, ws) => (ws.mkString(" "), ws.length.toLong,
        ws.map(wscore).sum) }
      .groupBy(p => (p._1, p._2, p._3))
      .map { case ((p, nw, sc), xs) => (p, nw, xs.length.toLong, sc) }
      .toSeq.sortBy(t => (-t._4, t._1)).take(rows.length)
    val got = rows.map(r => (r.getAs[String]("phrase"),
      r.getAs[Long]("n_words"), r.getAs[Long]("n_occ"),
      r.getAs[Long]("score_ppm"))).toSeq
    assert(got == expected)
  }

  test("q351 Fellegi-Sunter: driver EM replay, posterior sanity") {
    val rows = run("q351_fellegi_sunter")
    assert(rows.length <= 8 && rows.nonEmpty)
    // pattern counts replay with the same md5 coins
    val cust = graft.Tables.customer(spark, dir).selectExpr(
      "c_custkey", "c_nationkey", "c_name",
      "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal",
      "c_mktsegment",
      "CAST(conv(substring(md5(concat('fsn', CAST(c_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 100 AS cn",
      "CAST(conv(substring(md5(concat('fsb', CAST(c_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 100 AS cb",
      "CAST(conv(substring(md5(concat('fss', CAST(c_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 100 AS cs")
      .collect().map(r => (r.getAs[Number]("c_custkey").longValue,
        r.getAs[Number]("c_nationkey").longValue, r.getAs[String]("c_name"),
        r.getAs[Long]("bal"), r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("cn"), r.getAs[Long]("cb"), r.getAs[Long]("cs")))
    val twins = cust.map { case (k, nat, name, bal, seg, cn, cb, cs) =>
      (nat, if (cn < 20) name.dropRight(1) else name,
        if (cb < 30) bal + 100 else bal,
        if (cs < 10) "CORRUPTED" else seg)
    }
    val byNat = twins.groupBy(_._1)
    val counts = scala.collection.mutable.Map[(Int, Int, Int), Long]()
      .withDefaultValue(0L)
    for ((_, nat, name, bal, seg, _, _, _) <- cust;
         (_, n2, b2, s2) <- byNat.getOrElse(nat, Array.empty[(Long, String, Long, String)])) {
      val g = (if (name == n2) 1 else 0, if (bal == b2) 1 else 0,
        if (seg == s2) 1 else 0)
      counts(g) += 1L
    }
    val got = rows.map(r => (r.getAs[Long]("g1").toInt,
      r.getAs[Long]("g2").toInt, r.getAs[Long]("g3").toInt) ->
      r.getAs[Long]("n_pairs")).toMap
    assert(got == counts.toMap, "pattern counts")
    // EM replay in nano-int arithmetic, exactly as the shared chains
    var p = 100000000L
    var m = Array(900000000L, 900000000L, 900000000L)
    var u = Array(100000000L, 100000000L, 100000000L)
    def weight(g: (Int, Int, Int)): Long = {
      val gs = Array(g._1, g._2, g._3)
      var a = p.toDouble / 1e9; var b = 1.0 - p.toDouble / 1e9
      for (i <- 0 until 3) {
        a *= (if (gs(i) == 1) m(i).toDouble / 1e9 else 1.0 - m(i).toDouble / 1e9)
        b *= (if (gs(i) == 1) u(i).toDouble / 1e9 else 1.0 - u(i).toDouble / 1e9)
      }
      if (a + b == 0.0) 0L else math.floor(1e9 * (a / (a + b))).toLong
    }
    for (_ <- 1 to 2) {
      val ws = counts.toSeq.map { case (g, c) => (g, c, weight(g)) }
      val sw = ws.map { case (_, c, w) => BigInt(w) * c }.sum
      val vw = ws.map { case (_, c, w) => BigInt(1000000000L - w) * c }.sum
      val scnt = ws.map(_._2).sum
      val sg = Array(0, 1, 2).map(i => ws.map { case (g, c, w) =>
        BigInt(w) * c * Array(g._1, g._2, g._3)(i) }.sum)
      val vg = Array(0, 1, 2).map(i => ws.map { case (g, c, w) =>
        BigInt(1000000000L - w) * c * Array(g._1, g._2, g._3)(i) }.sum)
      p = if (scnt == 0) 0L
        else math.floor(sw.toDouble / scnt.toDouble).toLong
      m = sg.zipWithIndex.map { case (s, _) =>
        if (sw.toDouble == 0.0) 0L
        else math.floor(1e9 * s.toDouble / sw.toDouble).toLong }
      u = vg.zipWithIndex.map { case (s, _) =>
        if (vw.toDouble == 0.0) 0L
        else math.floor(1e9 * s.toDouble / vw.toDouble).toLong }
    }
    for (r <- rows) {
      assert(r.getAs[Long]("p_nano") == p)
      assert(Seq("m1_nano", "m2_nano", "m3_nano").map(r.getAs[Long])
        == m.toSeq)
      assert(Seq("u1_nano", "u2_nano", "u3_nano").map(r.getAs[Long])
        == u.toSeq)
      val g = (r.getAs[Long]("g1").toInt, r.getAs[Long]("g2").toInt,
        r.getAs[Long]("g3").toInt)
      assert(r.getAs[Long]("w_nano") == weight(g), s"posterior $g")
    }
    // the linkage decision table must separate: all-agree posterior
    // above 0.99, all-disagree below 0.01 (the corruption rates and
    // field entropies guarantee it at any SF)
    val w111 = rows.find(r => r.getAs[Long]("g1") == 1 &&
      r.getAs[Long]("g2") == 1 && r.getAs[Long]("g3") == 1)
    val w000 = rows.find(r => r.getAs[Long]("g1") == 0 &&
      r.getAs[Long]("g2") == 0 && r.getAs[Long]("g3") == 0)
    assert(w111.forall(_.getAs[Long]("w_nano") > 990000000L))
    assert(w000.forall(_.getAs[Long]("w_nano") < 10000000L))
  }

  test("q352 VaR/ES: sequential replay of the loss order statistics") {
    val rows = run("q352_var_es")
    assert(rows.map(_.getAs[Long]("alpha_milli")).toSeq == Seq(950L, 990L))
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE '1970-01-01') AS BIGINT)").as("d"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 " +
        "AS BIGINT)")).cast("bigint").as("rev"))
      .collect().map(r => (r.getAs[Long]("d"), r.getAs[Long]("rev")))
      .sortBy(_._1)
    val losses = daily.sliding(2).collect {
      case Array((_, r1), (d2, r2)) => (d2, r1 - r2) // loss = -(r2 - r1)
    }.toSeq.sortBy(t => (t._2, t._1)).map(_._2)
    val n = losses.length.toLong
    for (r <- rows) {
      val alpha = r.getAs[Long]("alpha_milli")
      val rk = ((alpha * n + 999) / 1000).toInt
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("var_cents") == losses(rk - 1), s"VaR a=$alpha")
      val tail = losses.drop(rk - 1)
      assert(r.getAs[Long]("n_tail") == tail.length.toLong)
      assert(r.getAs[Long]("es_cents") ==
        math.floor(tail.sum.toDouble / tail.length.toDouble).toLong)
      // the tail mean can never sit below its own minimum
      assert(r.getAs[Long]("es_cents") >= r.getAs[Long]("var_cents"))
    }
  }

  test("q353 Good-Turing: frequency-of-frequencies replay") {
    val rows = run("q353_good_turing")
    assert(rows.map(_.getAs[Long]("r")).toSeq == (1L to 10L))
    val counts = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getAs[Long]("count"))
    val nTok = counts.sum
    val ff = counts.groupBy(identity).map { case (c, xs) =>
      c -> xs.length.toLong
    }
    for (r <- rows) {
      val rr = r.getAs[Long]("r")
      val nr = ff.getOrElse(rr, 0L); val nr1 = ff.getOrElse(rr + 1, 0L)
      assert(r.getAs[Long]("n_r") == nr && r.getAs[Long]("n_r1") == nr1)
      if (nr > 0) {
        assert(r.getAs[Long]("r_star_ppm") ==
          math.floor(1e6 * (rr + 1) * nr1.toDouble / nr.toDouble).toLong)
        assert(r.getAs[Long]("gt_prob_ppb") ==
          math.floor(1e9 * (rr + 1) * nr1.toDouble /
            (nr.toDouble * nTok.toDouble)).toLong)
      } else {
        assert(r.isNullAt(r.fieldIndex("r_star_ppm")))
      }
      assert(r.getAs[Long]("p0_ppm") ==
        1000000L * ff.getOrElse(1L, 0L) / nTok)
      assert(r.getAs[Long]("n_tokens") == nTok)
      assert(r.getAs[Long]("n_types") == counts.length.toLong)
    }
  }

  test("q354 newsvendor: fractile optimality certificate and replay") {
    val rows = run("q354_newsvendor")
    assert(rows.nonEmpty)
    val dem = graft.Tables.lineitem(spark, dir)
      .join(graft.Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') " +
          "AS BIGINT)").as("d"))
      .agg(sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)"))
        .cast("bigint").as("q"))
      .collect().map(r => (r.getAs[String]("brand"), r.getAs[Long]("q")))
    val byBrand = dem.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map(_._2).sorted
    }
    def cost(ds: Seq[Long], s: Long, cu: Long, co: Long): Long =
      ds.map(q => cu * math.max(q - s, 0L) + co * math.max(s - q, 0L)).sum
    for (r <- rows) {
      val (b, cu, co) = (r.getAs[String]("brand"), r.getAs[Long]("cu"),
        r.getAs[Long]("co"))
      val ds = byBrand(b)
      val n = ds.length.toLong
      assert(r.getAs[Long]("n_days") == n)
      // replay the critical fractile: min s in the support with
      // F(s)·(cu+co) >= cu·n
      val sStar = ds.distinct.sorted.find(s =>
        ds.count(_ <= s).toLong * (cu + co) >= cu * n).get
      assert(r.getAs[Long]("s_star") == sStar, s"$b $cu:$co s*")
      assert(r.getAs[Long]("s_mean") == ds.sum / n)
      assert(r.getAs[Long]("s_max") == ds.max)
      val c1 = r.getAs[Long]("cost_star_milli")
      assert(c1 == 1000L * cost(ds, sStar, cu, co) / n)
      // discrete newsvendor optimality: the critical fractile beats
      // EVERY integer stock level, hence both heuristics
      assert(c1 <= r.getAs[Long]("cost_mean_milli"), s"$b $cu:$co vs mean")
      assert(c1 <= r.getAs[Long]("cost_max_milli"), s"$b $cu:$co vs max")
      val exhaustive = (ds.min to ds.max).map(cost(ds, _, cu, co)).min
      assert(cost(ds, sStar, cu, co) == exhaustive, s"$b $cu:$co optimal")
    }
  }

  test("q355 bursts: DP replay, objective identity, 1-flip optimality") {
    val G = 2L
    val rows = run("q355_burst_intervals")
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE '1970-01-01') AS BIGINT)").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getAs[Long]("d"), r.getAs[Long]("c")))
      .sortBy(_._1)
    val n = daily.length
    val tot = daily.map(_._2).sum
    val high = daily.map { case (_, c) => if (c * n > tot) 1L else 0L }
    def labelingCost(st: Seq[Long]): Long = {
      val ham = st.zip(high).count { case (s, h) => s != h }.toLong
      val sw = (Seq(0L) ++ st).sliding(2).count {
        case Seq(a, b) => a != b; case _ => false
      }.toLong
      ham + G * sw
    }
    // replay the fwd/bwd DP
    val f0 = new Array[Long](n); val f1 = new Array[Long](n)
    f0(0) = high(0); f1(0) = G + (1 - high(0))
    for (i <- 1 until n) {
      f0(i) = math.min(f0(i - 1), f1(i - 1) + G) + high(i)
      f1(i) = math.min(f1(i - 1), f0(i - 1) + G) + (1 - high(i))
    }
    val b0 = new Array[Long](n); val b1 = new Array[Long](n)
    for (i <- n - 2 to 0 by -1) {
      val h = high(i + 1)
      b0(i) = math.min(h + b0(i + 1), G + (1 - h) + b1(i + 1))
      b1(i) = math.min((1 - h) + b1(i + 1), G + h + b0(i + 1))
    }
    val obj = math.min(f0(n - 1), f1(n - 1))
    val st = (0 until n).map(i =>
      if (f0(i) + b0(i) <= f1(i) + b1(i)) 0L else 1L)
    // intervals replay (rank space)
    val ivs = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    var s0 = -1
    for (i <- 0 to n) {
      val cur = if (i < n) st(i) else 0L
      if (cur == 1L && s0 < 0) s0 = i
      if (cur == 0L && s0 >= 0) {
        ivs += ((daily(s0)._1, daily(i - 1)._1, (i - s0).toLong,
          (s0 until i).map(high).sum))
        s0 = -1
      }
    }
    val got = rows.map(r => (r.getAs[Long]("start_d"), r.getAs[Long]("end_d"),
      r.getAs[Long]("len_days"), r.getAs[Long]("n_high"))).toSeq
    assert(got == ivs.toSeq)
    for (r <- rows) {
      assert(r.getAs[Long]("obj_cost") == obj)
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Long]("n_bursts") == ivs.length.toLong)
    }
    // the fwd+bwd argmin labeling achieves the DP optimum exactly
    assert(labelingCost(st) == obj, "labeling cost equals DP objective")
    // 1-flip local optimality: no single-day state change improves it
    for (i <- 0 until n) {
      val flipped = st.updated(i, 1L - st(i))
      assert(labelingCost(flipped) >= obj, s"flip at $i improves")
    }
  }

  test("q356 depth-2 tree: root = q173 winner, refinement, replay") {
    val rows = run("q356_tree_depth2")
    assert(rows.map(_.getAs[String]("node")).sorted.toSeq ==
      Seq("left", "right", "root"))
    val byNode = rows.map(r => r.getAs[String]("node") -> r).toMap
    val root = byNode("root")
    // the root split IS q173's argmax (identical machinery)
    val stumpTop = run("q173_stump").head
    assert(root.getAs[Long]("pos") == stumpTop.getAs[Long]("pos"))
    assert(root.getAs[Long]("thr") == stumpTop.getAs[Long]("thr"))
    assert(root.getAs[Long]("gain_nn") == stumpTop.getAs[Long]("gain_nn"))
    // side sizes partition the corpus
    assert(byNode("left").getAs[Long]("n_node") +
      byNode("right").getAs[Long]("n_node") ==
      root.getAs[Long]("n_node"))
    // a finer partition's majority vote can never be less accurate
    val acc1 = root.getAs[Long]("acc_stump_ppm")
    val acc2 = root.getAs[Long]("acc_tree_ppm")
    assert(acc2 >= acc1, s"tree $acc2 < stump $acc1")
    // full replay of sides, leaves, and both accuracies from raw data
    val B = 125000L
    val emb = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("label").longValue,
        r.getAs[scala.collection.Seq[Float]]("embedding")))
    def q(v: Float): Long = math.floor(v.toDouble * 1000000L).toLong
    def bucket(x: Long): Long = math.floorDiv(x, B)
    val rp = root.getAs[Long]("pos").toInt
    val rt = root.getAs[Long]("thr")
    val sides = emb.map { case (id, lbl, e) =>
      (id, lbl, e, if (bucket(q(e(rp - 1))) <= rt) "left" else "right")
    }
    for (nd <- Seq("left", "right"))
      assert(byNode(nd).getAs[Long]("n_node") ==
        sides.count(_._4 == nd).toLong, s"$nd size")
    val hit1 = sides.groupBy(_._4).values.map(g =>
      g.groupBy(_._2).values.map(_.length).max).sum
    assert(acc1 == 1000000L * hit1 / emb.length)
    val hit2 = sides.groupBy(_._4).map { case (nd, g) =>
      val cp = byNode(nd).getAs[Long]("pos").toInt
      val ct = byNode(nd).getAs[Long]("thr")
      g.groupBy(x => bucket(q(x._3(cp - 1))) <= ct).values.map(lf =>
        lf.groupBy(_._2).values.map(_.length).max).sum
    }.sum
    assert(acc2 == 1000000L * hit2 / emb.length)
  }

  test("q357 POT/GPD: moment replay and tail-model sanity") {
    val r = run("q357_pot_gpd").head
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE '1970-01-01') AS BIGINT)").as("d"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 " +
        "AS BIGINT)")).cast("bigint").as("rev"))
      .collect().map(x => (x.getAs[Long]("d"), x.getAs[Long]("rev")))
      .sortBy(_._1)
    val losses = daily.sliding(2).collect {
      case Array((_, r1), (_, r2)) => r1 - r2
    }.toSeq.sorted
    val n = losses.length
    assert(r.getAs[Long]("n_days") == n.toLong)
    val u = losses((900 * n + 999) / 1000 - 1)
    assert(r.getAs[Long]("u_cents") == u)
    assert(r.getAs[Long]("var99_emp_cents") ==
      losses((990 * n + 999) / 1000 - 1))
    val exc = losses.filter(_ > u).map(_ - u)
    val k = exc.length
    assert(r.getAs[Long]("n_exceed") == k.toLong)
    val s1 = exc.map(BigInt(_)).sum.toDouble
    val s2 = exc.map(e => BigInt(e) * BigInt(e)).sum.toDouble
    val m = s1 / k; val v = s2 / k - m * m
    val xi = 0.5 * (1.0 - m * m / v)
    val beta = 0.5 * m * (1.0 + m * m / v)
    assert(r.getAs[Long]("mean_exc_cents") == math.floor(m).toLong)
    assert(r.getAs[Long]("xi_micro") == math.floor(1e6 * xi).toLong)
    assert(r.getAs[Long]("beta_cents") == math.floor(beta).toLong)
    val ratio = k.toDouble / (n.toDouble * 0.01)
    val var99 = if (xi == 0.0) u + beta * math.log(ratio)
      else u + (beta / xi) * (math.exp(xi * math.log(ratio)) - 1.0)
    assert(r.getAs[Long]("var99_gpd_cents") == math.floor(var99).toLong)
    // method-of-moments structure: v > 0 forces xi < 0.5; the implied
    // 99% quantile must sit strictly above the 90% threshold
    assert(r.getAs[Long]("xi_micro") < 500000L)
    assert(r.getAs[Long]("var99_gpd_cents") > r.getAs[Long]("u_cents"))
  }

  test("q358 adaptation: per-word replay of stats and the null chain") {
    val rows = run("q358_word_adaptation")
    assert(rows.nonEmpty)
    val dw = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").count().collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tok"),
        r.getAs[Long]("count")))
    val nTok = dw.map(_._3).sum
    val nDoc = dw.map(_._1).distinct.length.toLong
    val ws = dw.groupBy(_._2).map { case (_, xs) =>
      (xs.map(_._3).sum, xs.length.toLong, xs.count(_._3 >= 2).toLong)
    }.filter(_._2 >= 5L).toSeq
    val byBand = ws.groupBy { case (nw, _, _) =>
      math.floor(math.log(nw.toDouble) / math.log(2.0)).toLong
    }
    assert(rows.map(_.getAs[Long]("band")).toSet == byBand.keySet)
    for (r <- rows) {
      val g = byBand(r.getAs[Long]("band"))
      assert(r.getAs[Long]("n_types") == g.length.toLong)
      val sdf = g.map(_._2).sum; val sr2 = g.map(_._3).sum
      assert(r.getAs[Long]("sum_df") == sdf)
      assert(r.getAs[Long]("sum_r2") == sr2)
      assert(r.getAs[Long]("adapt_ppm") == 1000000L * sr2 / sdf)
      val sn = g.map { case (nw, _, _) =>
        val p = nw.toDouble / nTok.toDouble
        val l = nTok.toDouble / nDoc.toDouble
        val ql = math.exp(l * math.log(1.0 - p))
        val ql1 = math.exp((l - 1.0) * math.log(1.0 - p))
        math.floor(1e9 * ((1.0 - ql - l * p * ql1) / (1.0 - ql))).toLong
      }.sum
      assert(r.getAs[Long]("null_ppm") == sn / (1000L * g.length))
    }
  }

  test("q359 tail dependence: threshold and count replay") {
    val rows = run("q359_tail_dependence")
    assert(rows.map(_.getAs[Long]("q_milli")).toSeq == Seq(900L, 950L, 990L))
    val pts = graft.Tables.lineitem(spark, dir)
      .selectExpr("CAST(floor(l_quantity + 0.5) AS BIGINT) AS x",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val n = pts.length
    val xs = pts.map(_._1).sorted; val ys = pts.map(_._2).sorted
    for (r <- rows) {
      val q = r.getAs[Long]("q_milli")
      val rk = ((q * n + 999) / 1000).toInt
      val (tx, ty) = (xs(rk - 1), ys(rk - 1))
      assert(r.getAs[Long]("thr_x") == tx && r.getAs[Long]("thr_y_cents") == ty)
      val cnt = pts.count { case (x, y) => x > tx && y > ty }.toLong
      val nx = pts.count(_._1 > tx).toLong
      val ny = pts.count(_._2 > ty).toLong
      assert(r.getAs[Long]("n_joint") == cnt)
      assert(r.getAs[Long]("n_exc_x") == nx && r.getAs[Long]("n_exc_y") == ny)
      assert(r.getAs[Long]("lambda_ppm") ==
        math.floor(1000000.0 * cnt * 1000.0 / (n.toDouble * (1000 - q))).toLong)
      if (nx == 0 || ny == 0)
        assert(r.isNullAt(r.fieldIndex("dep_ratio_ppm")))
      else
        assert(r.getAs[Long]("dep_ratio_ppm") ==
          math.floor(1000000.0 * cnt * n / (nx.toDouble * ny.toDouble)).toLong)
      // exceedance structure: joint <= each margin, margins <= n - rk + ties
      assert(cnt <= math.min(nx, ny))
    }
  }

  test("q360 Diebold-Mariano: sequential error replay") {
    val r = run("q360_diebold_mariano").head
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE '1970-01-01') AS BIGINT)").as("d"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 " +
        "AS BIGINT)")).cast("bigint").as("y"))
      .collect().map(x => (x.getAs[Long]("d"), x.getAs[Long]("y")))
      .sortBy(_._1).map(_._2)
    val errs = (7 until daily.length).map { i =>
      (math.abs(daily(i) - daily(i - 7)), math.abs(daily(i) - daily(i - 1)))
    }
    val n = errs.length
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("mae_seasonal_cents") == errs.map(_._1).sum / n)
    assert(r.getAs[Long]("mae_rw_cents") == errs.map(_._2).sum / n)
    val ds = errs.map { case (a, b) => a - b }
    assert(r.getAs[Long]("sum_diff_cents") == ds.sum)
    val sd = ds.sum.toDouble
    val sdd = ds.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val m = sd / n; val v = sdd / n - m * m
    assert(r.getAs[Long]("dm_z_milli") ==
      math.floor(1000.0 * m / math.sqrt(v / n)).toLong)
  }

  test("q361 densest subgraph: full peel replay, density structure") {
    val rows = run("q361_densest_subgraph")
    assert(rows.map(_.getAs[Long]("round")).toSeq == (0L to 12L))
    // driver peel replay from the raw basket projection
    val basket = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("o"), r.getAs[Long]("p")))
    // NOTE: Map.collect producing pairs rebuilds a MAP (keys collapse
    // by first node) — keySet after filter keeps the edge tuples intact
    var edges = basket.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    for (r <- rows) {
      val deg = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((a, b) <- edges) { deg(a) += 1; deg(b) += 1 }
      val vN = deg.size.toLong; val eN = edges.size.toLong
      assert(r.getAs[Long]("n_nodes") == vN, s"round ${r.getAs[Long]("round")}")
      assert(r.getAs[Long]("n_edges") == eN)
      if (vN > 0) assert(r.getAs[Long]("density_milli") == 1000L * eN / vN)
      else assert(r.isNullAt(r.fieldIndex("density_milli")))
      val surv = deg.collect {
        case (node, d) if d * vN > 2L * eN => node
      }.toSet
      edges = edges.filter { case (a, b) => surv(a) && surv(b) }
    }
    // the peel is monotone and the trace contains its own certificate:
    // the best round dominates round 0 (the whole graph)
    val vs = rows.map(_.getAs[Long]("n_nodes"))
    assert(vs.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
    val ds = rows.flatMap(r =>
      if (r.isNullAt(r.fieldIndex("density_milli"))) None
      else Some(r.getAs[Long]("density_milli")))
    assert(ds.max >= ds.head)
  }

  test("q362 KT regret: sequential replay and the KT theorem bound") {
    val r = run("q362_kt_regret").head
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("event_type", "unix_micros(ts) AS tsu", "event_id")
      .collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("tsu"),
        x.getAs[Long]("event_id")))
      .sortBy(t => (t._2, t._3))
    val n = ev.length.toLong
    val k = ev.map(_._1).distinct.length.toLong
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == k)
    // sequential KT replay: -ln p = ln(2t-2+k) - ln(2c-1), per-term nano
    val seen = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    var cl = 0L
    for ((t, (s, _, _)) <- (1L to n).zip(ev)) {
      val c = seen(s) + 1L; seen(s) = c
      cl += math.floor(1e9 * math.log((2 * t - 2 + k).toDouble)).toLong -
        math.floor(1e9 * math.log((2 * c - 1).toDouble)).toLong
    }
    assert(r.getAs[Long]("cl_nano") == cl)
    val nh = seen.values.map(ns =>
      math.floor(1e9 * ns.toDouble *
        (math.log(n.toDouble) - math.log(ns.toDouble))).toLong).sum
    assert(r.getAs[Long]("nh_nano") == nh)
    val regret = r.getAs[Long]("regret_nano")
    assert(regret == cl - nh)
    // the KT theorem: 0 <= regret <= ((k-1)/2) ln n + O(1); allow the
    // per-term flooring slop (2 nano per event + k entropy terms)
    assert(regret >= -(2L * n + k), s"regret $regret below zero")
    assert(regret <= r.getAs[Long]("kt_bound_nano"),
      s"regret $regret exceeds the KT bound")
  }

  test("q363 Jonckheere: brute-force pair replay confirms the identity") {
    val r = run("q363_jonckheere").head
    val pts = graft.Tables.orders(spark, dir)
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) " +
          "div 10000 AS b")
      .collect().map(x => (x.getAs[Long]("g"), x.getAs[Long]("b")))
    val n = pts.length
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("k") == pts.map(_._1).distinct.length.toLong)
    // brute force: 2*JT = sum over ordered-group pairs of
    // (2*[x < y] + [x == y])
    var jt2 = 0L
    for ((gi, bi) <- pts; (gj, bj) <- pts if gi < gj) {
      if (bi < bj) jt2 += 2L else if (bi == bj) jt2 += 1L
    }
    assert(r.getAs[Long]("jt2") == jt2, "prefix-sum identity vs brute force")
    val ni = pts.groupBy(_._1).values.map(_.length.toLong).toSeq
    val e2 = (n.toLong * n - ni.map(x => x * x).sum) / 2
    assert(r.getAs[Long]("e_jt2") == e2)
    // tie-corrected variance replay (Hollander & Wolfe 6.2)
    val t = pts.groupBy(_._2).values.map(_.length.toLong).toSeq
    def s3(xs: Seq[Long]) = xs.map(x =>
      BigInt(x) * (x - 1) * (2 * x + 5)).sum.toDouble
    def sc(xs: Seq[Long]) = xs.map(x =>
      BigInt(x) * (x - 1) * (x - 2)).sum.toDouble
    def s2(xs: Seq[Long]) = xs.map(x => x * (x - 1)).sum.toDouble
    val nD = n.toDouble
    val vv = (nD * (nD - 1) * (2 * nD + 5) - s3(ni) - s3(t)) / 72.0 +
      (sc(ni) * sc(t)) / (36.0 * nD * (nD - 1) * (nD - 2)) +
      (s2(ni) * s2(t)) / (8.0 * nD * (nD - 1))
    assert(r.getAs[Long]("var_floor") == math.floor(vv).toLong)
    assert(r.getAs[Long]("z_milli") ==
      math.floor(1000.0 * (jt2 - e2).toDouble / (2.0 * math.sqrt(vv))).toLong)
  }

  test("q364 Sinkhorn: quantized scaling replay and OT certificates") {
    val rows = run("q364_sinkhorn")
    assert(rows.length == 49)
    // marginals replay
    val days = graft.Tables.orders(spark, dir)
      .selectExpr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().map(x => (x.getAs[Long]("d"), x.getAs[Long]("cents")))
    val mid = (days.map(_._1).min + days.map(_._1).max) / 2
    val a = new Array[Long](7); val b = new Array[Long](7)
    for ((d, c) <- days) {
      if (d < mid) a((d % 7).toInt) += c else b((d % 7).toInt) += c
    }
    val ta = a.sum; val tb = b.sum
    def cost(i: Int, j: Int) = math.min(math.abs(i - j), 7 - math.abs(i - j))
    val kN = Array.tabulate(7, 7)((i, j) =>
      math.floor(1e9 * math.exp(-cost(i, j).toDouble)).toLong)
    var u = Array.fill(7)(1000000000L)
    var v = Array.fill(7)(0L)
    for (_ <- 1 to 3) {
      v = Array.tabulate(7) { j =>
        val s = (0 until 7).map(i =>
          math.floor(kN(i)(j).toDouble * u(i).toDouble / 1e9).toLong).sum
        math.floor(1e18 * (b(j).toDouble / tb.toDouble) / s.toDouble).toLong
      }
      u = Array.tabulate(7) { i =>
        val s = (0 until 7).map(j =>
          math.floor(kN(i)(j).toDouble * v(j).toDouble / 1e9).toLong).sum
        math.floor(1e18 * (a(i).toDouble / ta.toDouble) / s.toDouble).toLong
      }
    }
    var sink = 0L; var indep = 0L; var mass = 0L
    for (r <- rows) {
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      assert(r.getAs[Long]("c") == cost(i, j).toLong)
      val p = math.floor(
        u(i).toDouble * kN(i)(j).toDouble * v(j).toDouble / 1e21).toLong
      assert(r.getAs[Long]("plan_ppm") == p, s"cell ($i,$j)")
      val q = math.floor(1e6 * (a(i).toDouble / ta) * (b(j).toDouble / tb))
        .toLong
      assert(r.getAs[Long]("indep_ppm") == q)
      sink += p * cost(i, j); indep += q * cost(i, j); mass += p
    }
    val r0 = rows.head
    assert(r0.getAs[Long]("cost_sink_micro") == sink)
    assert(r0.getAs[Long]("cost_indep_micro") == indep)
    // entropic optimality: the eps-optimum must beat the independence
    // coupling on raw cost (it pays the KL penalty instead)
    assert(sink <= indep, s"sinkhorn $sink > independence $indep")
    // three rounds land the marginals within quantization slop, and
    // the plan carries (almost) unit mass
    assert(r0.getAs[Long]("max_marg_err_ppm") <= 100L)
    assert(math.abs(mass - 1000000L) <= 200L, s"plan mass $mass")
  }

  test("q365 Hedge: sequential replay and the adversarial regret bound") {
    val ARMS = Seq("click", "error", "purchase", "signup", "view")
    val ETA = 0.1
    val rows = run("q365_hedge_regret")
    assert(rows.nonEmpty)
    val hr = graft.Tables.events(spark, dir)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"),
        col("event_type").as("s"))
      .agg(sum(floor(col("value") * 1000).cast("bigint")).as("v"))
      .collect().map(x => ((x.getAs[Long]("h"), x.getAs[String]("s")),
        x.getAs[Long]("v"))).toMap
    val vmax = hr.values.max
    val hours = hr.keys.map(_._1).toSeq.distinct.sorted
    val k = ARMS.length
    val w = Array.fill(k)(200000000L)
    val g = new Array[Long](k)
    var alg = 0L
    val got = rows.map(r => r.getAs[Long]("t") ->
      (r.getAs[Long]("alg_micro"), r.getAs[Long]("best_micro"),
        r.getAs[Long]("regret_micro"), r.getAs[Long]("bound_micro"))).toMap
    for ((h, idx) <- hours.zipWithIndex) {
      val t = idx + 1L
      val r = ARMS.map(a => 1000L * hr.getOrElse((h, a), 0L) / vmax).toArray
      alg += (0 until k).map(i => w(i) * r(i)).sum / 1000000L
      val u = (0 until k).map(i =>
        math.floor(w(i).toDouble * math.exp(ETA * r(i).toDouble / 1000.0)))
      val usum = u.sum
      for (i <- 0 until k)
        w(i) = math.floor(1000000000.0 * u(i) / usum).toLong
      for (i <- 0 until k) g(i) += r(i)
      if (t % 120 == 0 || t == hours.length.toLong) {
        val (ga, gb, gr, bound) = got(t)
        val best = g.max * 1000L
        assert(ga == alg, s"t=$t alg")
        assert(gb == best, s"t=$t best")
        assert(gr == best - alg)
        assert(bound == math.floor(
          1e6 * (math.log(5.0) / ETA + ETA * t / 8.0)).toLong)
        // the Hedge guarantee holds for ANY bounded reward sequence
        assert(gr <= bound, s"t=$t regret $gr exceeds Hedge bound $bound")
      }
    }
    assert(got.keySet == hours.indices.map(_ + 1L)
      .filter(t => t % 120 == 0 || t == hours.length.toLong).toSet)
  }

  test("q366 Brier decomposition: Murphy identity and q96 agreement") {
    val r = run("q366_brier_decomposition").head
    // the identity REL - RES + UNC = Brier is exact for bin-center
    // forecasts, up to the documented nano->micro flooring slop
    val brier = r.getAs[Long]("brier_micro")
    val rel = r.getAs[Long]("rel_micro")
    val res = r.getAs[Long]("res_micro")
    val unc = r.getAs[Long]("unc_micro")
    assert(math.abs((rel - res + unc) - brier) <= 3L,
      s"Murphy identity: $rel - $res + $unc vs $brier")
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 250000L)
    val n = r.getAs[Long]("n"); val kt = r.getAs[Long]("n_correct")
    assert(kt >= 0 && kt <= n && n > 0)
    assert(unc == math.floor(
      1e6 * (kt.toDouble / n) * (1.0 - kt.toDouble / n)).toLong)
    // cross-query consistency: the same test-split classifier feeds
    // q96, so n and the correct count must equal its confusion matrix
    val conf = run("q96_centroid_classify")
    val total = conf.map(_.getAs[Long]("n")).sum
    val diag = conf.filter(x =>
      x.getAs[Number]("label").longValue ==
        x.getAs[Number]("pred").longValue).map(_.getAs[Long]("n")).sum
    assert(n == total, s"n $n vs q96 total $total")
    assert(kt == diag, s"correct $kt vs q96 diagonal $diag")
  }

  test("q367 Anderson-Darling: ranked replay, md5 uniformity holds") {
    val r = run("q367_anderson_darling").head
    val hs = graft.Tables.orders(spark, dir)
      .selectExpr("CAST(conv(substring(md5(concat('adu', " +
        "CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT) AS h")
      .collect().map(_.getAs[Long]("h")).sorted
    val n = hs.length
    assert(r.getAs[Long]("n") == n.toLong)
    val two61 = 2305843009213693952.0
    var s = BigInt(0)
    for ((h, j0) <- hs.zipWithIndex) {
      val j = j0 + 1
      val u = (2.0 * h + 1.0) / two61
      s += BigInt(math.floor(1000000.0 *
        ((2.0 * j - 1.0) * math.log(u) +
          (2.0 * n + 1.0 - 2.0 * j) * math.log(1.0 - u))).toLong)
    }
    val ad = math.floor(
      1000.0 * (-n.toDouble - (s.toDouble / 1e6) / n)).toLong
    assert(r.getAs[Long]("ad_milli") == ad)
    // the engine's portable-RNG contract: md5-prefix uniforms must
    // pass AD at the 5% level (a biased substring/parse bug would
    // blow far past the critical value)
    assert(r.getAs[Long]("ad_milli") < r.getAs[Long]("crit5_milli"),
      s"md5 uniformity rejected: ${r.getAs[Long]("ad_milli")}")
    assert(r.getAs[Number]("reject5").longValue == 0L)
  }

  test("q368 Theil: per-row replay and the exact decomposability") {
    val r = run("q368_theil_decomposition").head
    val seg = graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 " +
        "AS BIGINT)")).cast("bigint").as("x"))
      .join(graft.Tables.customer(spark, dir)
        .selectExpr("c_custkey AS ck", "c_mktsegment AS g"), Seq("ck"))
      .collect().map(x => (x.getAs[String]("g"), x.getAs[Long]("x")))
    val n = seg.length.toLong
    val sTot = seg.map(x => BigInt(x._2)).sum
    val gs = seg.groupBy(_._1).map { case (g, xs) =>
      g -> (xs.length.toLong, xs.map(x => BigInt(x._2)).sum)
    }
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == gs.size.toLong)
    def nano(x: Long, nC: Double, sC: Double): Long =
      math.floor(1e9 * (x.toDouble / sTot.toDouble) *
        math.log(x.toDouble * nC / sC)).toLong
    val tNn = seg.map { case (_, x) =>
      BigInt(nano(x, n.toDouble, sTot.toDouble)) }.sum
    val wNn = seg.map { case (g, x) =>
      val (ng, sg) = gs(g); BigInt(nano(x, ng.toDouble, sg.toDouble)) }.sum
    val bNn = gs.values.map { case (ng, sg) =>
      BigInt(math.floor(1e9 * (sg.toDouble / sTot.toDouble) *
        math.log(sg.toDouble * n / (sTot.toDouble * ng))).toLong)
    }.sum
    assert(r.getAs[Long]("theil_micro") ==
      math.floor(tNn.toDouble / 1000.0).toLong)
    assert(r.getAs[Long]("within_micro") ==
      math.floor(wNn.toDouble / 1000.0).toLong)
    assert(r.getAs[Long]("between_micro") ==
      math.floor(bNn.toDouble / 1000.0).toLong)
    // Theil's exact additive decomposability, up to per-term floors
    val slop = (2 * n + gs.size) / 1000 + 3
    val t = r.getAs[Long]("theil_micro")
    val w = r.getAs[Long]("within_micro")
    val b = r.getAs[Long]("between_micro")
    assert(math.abs(t - (w + b)) <= slop, s"T=$t vs W+B=${w + b}")
    // both components are non-negative (between is KL-like)
    assert(b >= -slop && w >= -slop && t >= -slop)
  }
}
