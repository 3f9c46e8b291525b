package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-5 graph-structure
  * operators (q323–q325), checked at sf0.001 against a driver replay
  * of the co-purchase edge build. */
class Round7eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  /** Brute-force co-purchase edges at minPair=2 (canonical a < b). */
  private lazy val edges: Set[(Long, Long)] = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val counts = collection.mutable.Map[(Long, Long), Int]()
    for ((_, ps) <- byOrder; i <- ps.indices; j <- i + 1 until ps.length)
      counts((ps(i), ps(j))) = counts.getOrElse((ps(i), ps(j)), 0) + 1
    counts.filter(_._2 >= 2).keySet.toSet
  }

  test("q323 assortativity: r in [-1, 1], exact moment replay") {
    val r = run("q323_assortativity").head
    assert(r.getAs[Long]("n_edges") == edges.size)
    val rm = r.getAs[Long]("r_milli")
    assert(rm >= -1000 && rm <= 1000)
    // replay the Pearson fold over directed edges with BigInt moments
    val ed = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(r.getAs[Long]("n_nodes") == deg.size)
    val xs = ed.map { case (s, d) => (deg(s), deg(d)) }
    val m = BigInt(xs.size)
    val sx = xs.map(p => BigInt(p._1)).sum
    val sy = xs.map(p => BigInt(p._2)).sum
    val sxx = xs.map(p => BigInt(p._1) * p._1).sum
    val syy = xs.map(p => BigInt(p._2) * p._2).sum
    val sxy = xs.map(p => BigInt(p._1) * p._2).sum
    val expect = math.floor(1e3 *
      ((m * sxy - sx * sy).toDouble /
        math.sqrt((m * sxx - sx * sx).toDouble *
          (m * syy - sy * sy).toDouble))).toLong
    assert(rm == expect, s"replay: got $rm, want $expect")
  }

  test("q324 rich club: density bounded, membership shrinks with k, replay") {
    val rows = run("q324_rich_club")
    assert(rows.nonEmpty)
    val ed = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for (r <- rows) {
      val (k, nk, ek, phi) = (r.getAs[Long]("k"), r.getAs[Long]("n_k"),
        r.getAs[Long]("e_k"), r.getAs[Long]("phi_ppm"))
      assert(phi >= 0 && phi <= 1000000L)
      val rich = deg.filter(_._2 > k).keySet
      assert(nk == rich.size, s"k=$k membership: $nk vs ${rich.size}")
      val expectEk = edges.count { case (a, b) => rich(a) && rich(b) }
      assert(ek == expectEk, s"k=$k edges: $ek vs $expectEk")
      assert(phi == 2000000L * ek / (nk * (nk - 1)))
    }
    val nks = rows.map(_.getAs[Long]("n_k")).toSeq
    assert(nks.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("q326 corr matrix: six pairs, r bounded, price-quantity replay") {
    val rows = run("q326_corr_matrix")
    assert(rows.map(_.getAs[String]("pair")).sorted.toSeq ==
      Seq("disc__tax", "price__disc", "price__tax", "qty__disc",
        "qty__price", "qty__tax").sorted)
    rows.foreach { r =>
      val v = r.getAs[Long]("r_milli")
      assert(v >= -1000 && v <= 1000)
    }
    // the synthetic generator draws price independent of quantity, so
    // no directional claim here — the exact replay below is the law
    val qp = rows.find(_.getAs[String]("pair") == "qty__price").get
    // BigInt replay of the qty/price cell
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (BigInt(math.floor(r.getDouble(0) * 100 + 0.5).toLong),
        BigInt(math.floor(r.getDouble(1) * 100 + 0.5).toLong)))
    val n = BigInt(li.length)
    val (sx, sy) = (li.map(_._1).sum, li.map(_._2).sum)
    val sxx = li.map(p => p._1 * p._1).sum
    val syy = li.map(p => p._2 * p._2).sum
    val sxy = li.map(p => p._1 * p._2).sum
    val expect = math.floor(1e3 * (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble *
        (n * syy - sy * sy).toDouble)).toLong
    assert(qp.getAs[Long]("r_milli") == expect)
  }

  test("q325 partition quality: cut replay, skew floor at the balanced bound") {
    val r = run("q325_partition_quality").head
    assert(r.getAs[Long]("n_edges") == edges.size)
    val cut = edges.count { case (a, b) => a % 32 != b % 32 }
    assert(r.getAs[Long]("cut_edges") == cut)
    assert(r.getAs[Long]("cut_ppm") == 1000000L * cut / edges.size)
    assert(r.getAs[Long]("skew_ppm") >= 1000000L,
      "max/avg cannot dip below 1")
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }
    assert(r.getAs[Long]("n_nodes") == nodes.size)
  }
}
