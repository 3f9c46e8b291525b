package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 wave-4 operators (q318–q322) —
  * laws the oracle hash gate cannot express, checked at sf0.001. */
class Round7dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q318 bloom: occupancy bounded, measured identity, theo replay") {
    val r = run("q318_bloom_fpr").head
    val (nm, np, nfp, bits) = (r.getAs[Long]("n_members"),
      r.getAs[Long]("n_probes"), r.getAs[Long]("n_fp"),
      r.getAs[Long]("bits_set"))
    assert(nm > 0 && np > 0)
    assert(bits <= math.min(4096L, 3 * nm))
    assert(nfp >= 0 && nfp <= np)
    assert(r.getAs[Long]("measured_ppm") == 1000000L * nfp / np)
    // JVM replay of the shared exp/ln chain
    val theo = math.floor(1e6 * math.exp(3.0 *
      math.log(1.0 - math.exp(3.0 * nm.toDouble *
        math.log(1.0 - 1.0 / 4096.0))))).toLong
    assert(r.getAs[Long]("theo_ppm") == theo)
    // probe space is the full (disjoint-key) customer domain; members
    // are the order-holding subset of customers
    val nCust = graft.Tables.customer(spark, dir).count()
    assert(np == nCust && nm <= nCust)
  }

  test("q319 SRM: units reconcile, chi2 identity, alarm consistent") {
    val rows = run("q319_srm")
    assert(rows.map(_.getAs[String]("assignment")).sorted.toSeq ==
      Seq("customers_bal", "users_exp"))
    for (r <- rows) {
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na > 0 && nb > 0)
      val d = na - nb
      assert(r.getAs[Long]("chi2_milli") == 1000 * d * d / (na + nb))
      assert((r.getAs[Long]("srm_alarm") == 1L) ==
        (1000 * d * d > 3841 * (na + nb)))
    }
    val cust = rows.find(_.getAs[String]("assignment") == "customers_bal").get
    assert(cust.getAs[Long]("n_a") + cust.getAs[Long]("n_b") ==
      graft.Tables.customer(spark, dir).count())
  }

  test("q320 novelty: unique <= total, ppm identity, uniques reconcile globally") {
    val rows = run("q320_source_novelty")
    assert(rows.length == 20)
    for (r <- rows) {
      val (n, u) = (r.getAs[Long]("n_spans"), r.getAs[Long]("n_unique"))
      assert(u >= 0 && u <= n)
      assert(r.getAs[Long]("novelty_ppm") == 1000000L * u / n)
    }
    // sum of single-source spans over sources == count of spans with
    // exactly one source, recomputed directly
    val docs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
    val bySpan = collection.mutable.Map[String, collection.mutable.Set[String]]()
    for (r <- docs) {
      val t = r.getString(1).split(" ", -1)
      for (i <- 0 to t.length - 5)
        bySpan.getOrElseUpdate(t.slice(i, i + 5).mkString(" "),
          collection.mutable.Set()) += r.getString(0)
    }
    val singles = bySpan.values.count(_.size == 1)
    assert(rows.map(_.getAs[Long]("n_unique")).sum == singles)
  }

  test("q321 char entropy: bounded by ln of distinct successors, exact replay for one lang") {
    val rows = run("q321_char_entropy")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("h_cond_nn") >= 0)
      // conditional entropy <= ln(n_distinct) (uniform over all bigrams)
      assert(r.getAs[Long]("h_cond_nn") <=
        math.ceil(1e9 * math.log(r.getAs[Long]("n_distinct").toDouble)).toLong)
    }
    // replay the floored-term fold for the first language
    val lang = rows.head.getAs[String]("lang")
    val texts = graft.Tables.documents(spark, dir)
      .filter(col("lang") === lang).select(col("text")).collect()
      .map(_.getString(0)).filter(_.length >= 2)
    val c2 = collection.mutable.Map[String, Long]()
    for (t <- texts; i <- 0 until t.length - 1)
      c2(t.substring(i, i + 2)) = c2.getOrElse(t.substring(i, i + 2), 0L) + 1
    val c1 = c2.groupBy(_._1.substring(0, 1)).map { case (x, m) =>
      x -> m.values.sum
    }
    val n = c2.values.sum
    val swn = c2.map { case (g, cxy) =>
      BigInt(cxy) * BigInt(math.floor(1e9 *
        -math.log(cxy.toDouble / c1(g.substring(0, 1)).toDouble)).toLong)
    }.sum
    assert(rows.head.getAs[Long]("n_bigrams") == n)
    assert(BigInt(rows.head.getAs[Long]("h_cond_nn")) == swn / BigInt(n))
  }

  test("q322 class weights: monotone in n, normalization sums to ~1e6") {
    val rows = run("q322_class_weights")
    assert(rows.length == 10)
    val byN = rows.sortBy(_.getAs[Long]("n"))
    // larger class -> larger effective number, smaller-or-equal weight
    assert(byN.map(_.getAs[Long]("enb_milli")).toSeq ==
      byN.map(_.getAs[Long]("enb_milli")).sortBy(identity).toSeq)
    assert(byN.map(_.getAs[Long]("w_ppm")).toSeq ==
      byN.map(_.getAs[Long]("w_ppm")).sortBy(identity).reverse.toSeq)
    for (r <- rows) {
      // effective number never exceeds n, nor 1/(1-beta)
      assert(r.getAs[Long]("enb_milli") <= 1000 * r.getAs[Long]("n"))
      assert(r.getAs[Long]("enb_milli") <= 1000000L)
    }
    val tot = rows.map(_.getAs[Long]("w_ppm")).sum
    assert(tot <= 1000000L && tot >= 1000000L - rows.length,
      s"floor-div normalization drift: $tot")
  }
}
