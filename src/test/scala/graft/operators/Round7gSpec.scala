package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-7 operators (q329–q331),
  * checked at sf0.001 with BigInt replays of the integer contracts. */
class Round7gSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  /** (vec_id, label, quantized micro coords). */
  private lazy val vecs: Array[(Long, Int, Array[Long])] =
    graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v =>
          math.floor(v.toDouble * 1000000).toLong).toArray))

  test("q329 OOD: descending z2 on odd half, exact replay of the top score") {
    val rows = run("q329_ood_mahalanobis")
    assert(rows.length == 20)
    val z2s = rows.map(_.getAs[Long]("z2_micro")).toSeq
    assert(z2s.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    z2s.foreach(z => assert(z >= 0))
    rows.foreach(r => assert(r.getAs[Long]("vec_id") % 2 == 1))
    val top = rows.head
    val lbl = top.getAs[Long]("label").toInt
    val train = vecs.filter(v => v._1 % 2 == 0 && v._2 == lbl)
    val x = vecs.find(_._1 == top.getAs[Long]("vec_id")).get._3
    val n = BigInt(train.length)
    val z2 = (0 until 64).map { d =>
      val s = train.map(v => BigInt(v._3(d))).sum
      val q = train.map(v => BigInt(v._3(d)) * v._3(d)).sum
      val varN = n * q - s * s
      if (varN > 0) (BigInt(1000000) * (n * x(d) - s) * (n * x(d) - s)) / varN
      else BigInt(0)
    }.sum
    assert(BigInt(top.getAs[Long]("z2_micro")) == z2,
      s"replay ${z2} vs ${top.getAs[Long]("z2_micro")}")
  }

  test("q330 budget: greedy fill exactly exhausts the 60% budget") {
    val rows = run("q330_token_budget")
    assert(rows.length == 20)
    for (r <- rows) {
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("quality_ppm") ==
        1000000L * r.getAs[Long]("n_pass") / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("alloc_tokens") >= 0 &&
        r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("adm_tokens"))
    }
    val total = rows.map(_.getAs[Long]("adm_tokens")).sum
    val budget = 60L * total / 100
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == budget,
      "greedy fill with a boundary slice must spend the budget exactly")
    // allocation respects the quality ranking: any source with a
    // partial/zero allocation has quality <= every fully-funded source
    val full = rows.filter(r =>
      r.getAs[Long]("alloc_tokens") == r.getAs[Long]("adm_tokens"))
    val starved = rows.filter(r => r.getAs[Long]("alloc_tokens") == 0)
    if (full.nonEmpty && starved.nonEmpty)
      assert(starved.map(_.getAs[Long]("quality_ppm")).max <=
        full.map(_.getAs[Long]("quality_ppm")).min)
  }

  test("q331 margin queue: ascending margins, d1<=d2, replay of the head") {
    val rows = run("q331_al_margin")
    assert(rows.length == 20)
    val ms = rows.map(_.getAs[Long]("margin")).toSeq
    assert(ms.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true })
    for (r <- rows) {
      assert(r.getAs[Long]("d1") <= r.getAs[Long]("d2"))
      assert(r.getAs[Long]("margin") ==
        r.getAs[Long]("d2") - r.getAs[Long]("d1"))
      assert(r.getAs[Long]("vec_id") % 2 == 1)
    }
    // replay the two nearest centroid distances for the head vector
    val head = rows.head
    val x = vecs.find(_._1 == head.getAs[Long]("vec_id")).get._3
    val cents = vecs.filter(_._1 % 2 == 0).groupBy(_._2).map { case (l, vs) =>
      // truncating division: both engines' integer div/'//' truncate
      // toward zero (Math.floorDiv would diverge on negative sums)
      l -> (0 until 64).map(d => vs.map(_._3(d)).sum / vs.length).toArray
    }
    val dists = cents.map { case (l, c) =>
      (l, (0 until 64).map(d => {
        val diff = BigInt(x(d) - c(d)); diff * diff
      }).sum)
    }.toSeq.sortBy { case (l, d) => (d, BigInt(l)) }
    assert(BigInt(head.getAs[Long]("d1")) == dists(0)._2)
    assert(BigInt(head.getAs[Long]("d2")) == dists(1)._2)
    assert(head.getAs[Long]("pred") == dists(0)._1.toLong)
  }
}
