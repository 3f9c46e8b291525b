package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q345–q347, checked at sf0.001 with
  * sequential/brute-force replays of each closed form. */
class Round7lSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q345 knapsack: DP dominates greedy, exact driver DP replay") {
    val rows = run("q345_knapsack_mix")
    assert(rows.map(_.getAs[Long]("budget_units")).toSeq == Seq(20L, 40L, 60L))
    val dps = rows.map(_.getAs[Long]("dp_value")).toSeq
    assert(dps.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
      "a bigger budget cannot lower the optimum")
    for (r <- rows) {
      assert(r.getAs[Long]("gap") ==
        r.getAs[Long]("dp_value") - r.getAs[Long]("greedy_value"))
      assert(r.getAs[Long]("gap") >= 0, s"greedy beat the DP optimum: $r")
    }
    // independent DP replay from the raw per-source stats
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
    val bySrc = docs.groupBy(_.getString(0)).toSeq.sortBy(_._1)
    val stats = bySrc.map { case (_, ds) =>
      var v = 0L; var adm = 0L
      for (d <- ds) {
        val t = d.getString(1).split(" ", -1)
        val n = t.length.toLong
        val mwl = 1000 * t.map(_.length.toLong).sum / n
        val topw = t.groupBy(identity).values.map(_.length).max.toLong
        val pass = n >= 25 && n <= 90 && mwl >= 4000 && mwl <= 5100 &&
          t.count(stop) >= 2 && 1000000 * topw / n <= 125000
        if (pass) { v += 1; adm += n }
      }
      (v, adm)
    }
    val total = stats.map(_._2).sum
    val items = stats.map { case (v, adm) =>
      (v, math.max(1L, 100 * adm / total))
    }
    val dp = Array.fill(101)(0L)
    for ((v, w) <- items; b <- 100L to w by -1)
      dp(b.toInt) = math.max(dp(b.toInt), dp((b - w).toInt) + v)
    for (r <- rows)
      assert(r.getAs[Long]("dp_value") ==
        dp(r.getAs[Long]("budget_units").toInt),
        s"DP replay mismatch at ${r.getAs[Long]("budget_units")}")
  }

  test("q346 clustering spectrum: cc bounded, brute-force local-cc replay") {
    val rows = run("q346_clustering_spectrum")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_cc_ppm") >= 0 &&
        r.getAs[Long]("avg_cc_ppm") <= 1000000L)
    }
    // brute edges (minPair=2, canonical a<b) and per-node local cc
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = collection.mutable.Map[(Long, Long), Int]()
    for ((_, ps) <- li.groupBy(_._1).view.mapValues(_.map(_._2).sorted);
        i <- ps.indices; j <- i + 1 until ps.length)
      counts((ps(i), ps(j))) = counts.getOrElse((ps(i), ps(j)), 0) + 1
    val edges = counts.filter(_._2 >= 2).keySet
    val adj = collection.mutable.Map[Long, collection.mutable.Set[Long]]()
    for ((a, b) <- edges) {
      adj.getOrElseUpdate(a, collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, collection.mutable.Set()) += a
    }
    val ccByDeg = adj.toSeq.map { case (v, ns) =>
      val d = ns.size.toLong
      val t = ns.toSeq.combinations(2).count { case Seq(p, q) =>
        edges(if (p < q) (p, q) else (q, p))
      }.toLong
      (d, if (d >= 2) Some(2000000L * t / (d * (d - 1))) else None)
    }.collect { case (d, Some(cc)) => (d, cc) }
      .groupBy(_._1).view.mapValues(v =>
        (v.length.toLong, v.map(_._2).sum / v.length)).toMap
    for (r <- rows) {
      val (n, avg) = ccByDeg(r.getAs[Long]("deg"))
      assert(r.getAs[Long]("n_nodes") == n)
      assert(r.getAs[Long]("avg_cc_ppm") == avg,
        s"deg ${r.getAs[Long]("deg")}: ${r.getAs[Long]("avg_cc_ppm")} vs $avg")
    }
  }

  test("q347 token bucket: closed form equals the sequential leaky-bucket replay") {
    val rows = run("q347_token_bucket")
    assert(rows.nonEmpty, "tuned refill period must exercise the violation path")
    for (r <- rows)
      assert(r.getAs[Long]("viol_ppm") ==
        1000000L * r.getAs[Long]("n_violations") / r.getAs[Long]("n_events"))
    // sequential replay: L += 1 per event after draining 1 token per P
    val P = 21600000000L; val CAP = 5L
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expect = collection.mutable.Map[Long, Long]()
    for ((u, es) <- byUser) {
      val sorted = es.sortBy(e => (e._3, e._2))
      var level = 0.0; var last = sorted.head._3; var viol = 0L
      for ((_, _, t) <- sorted) {
        level = math.max(0.0, level - (t - last).toDouble / P)
        level += 1
        if (level > CAP + 1e-9) viol += 1
        last = t
      }
      if (viol > 0) expect(u) = viol
    }
    for (r <- rows)
      assert(r.getAs[Long]("n_violations") ==
        expect(r.getAs[Long]("user_id")),
        s"user ${r.getAs[Long]("user_id")}: closed form vs replay")
    // the leaderboard is the true top-15 by violations
    val top = expect.toSeq.sortBy { case (u, v) => (-v, u) }.take(15)
    assert(rows.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("n_violations"))).toSeq == top.take(rows.length))
  }
}
