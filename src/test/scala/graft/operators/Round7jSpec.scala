package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q340–q341, checked at sf0.001 with a full
  * quantile-regression replay. */
class Round7jSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q340 quantile regression: full grid replay picks the same line") {
    val rows = run("q340_quantile_regression")
    assert(rows.map(_.getAs[Long]("p_milli")).toSeq == Seq(500L, 900L))
    val f = graft.Tables.lineitem(spark, dir)
      .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val slopes = (-4 to 4).map(_ * 10000L)
    for (row <- rows) {
      val p = row.getAs[Long]("p_milli")
      val best = slopes.map { m =>
        val rs = f.map { case (x, y) => y - m * x }.sorted
        val rk = (1 + (rs.length - 1).toLong * p / 1000).toInt
        val b = rs(rk - 1) // lower order statistic at rank rk (1-based)
        val loss = rs.map { r =>
          val d = r - b
          BigInt(if (d >= 0) p * d else (p - 1000) * d)
        }.sum
        (loss, m, b)
      }.min
      assert(row.getAs[Long]("slope_cents") == best._2,
        s"p=$p slope: ${row.getAs[Long]("slope_cents")} vs ${best._2}")
      assert(row.getAs[Long]("icept_cents") == best._3)
      assert(BigInt(row.getAs[Long]("loss_milli")) == best._1)
    }
  }

  test("q341 threshold curve: monotone counts, precision identity") {
    val rows = run("q341_cos_label_curve")
    assert(rows.map(_.getAs[Long]("tau_milli")).toSeq ==
      Seq(100L, 150L, 200L, 250L, 300L))
    val np = rows.map(_.getAs[Long]("n_pairs")).toSeq
    assert(np.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      s"raising tau cannot admit more pairs: $np")
    for (r <- rows) {
      val (n, same) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_same"))
      assert(same >= 0 && same <= n)
      if (n > 0)
        assert(r.getAs[Long]("precision_ppm") == 1000000L * same / n)
      else assert(r.isNullAt(r.fieldIndex("precision_ppm")))
    }
  }

  test("q342 energy distance: brute-force pair replay confirms the prefix-sum identity") {
    val r = run("q342_energy_distance").head
    val o = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect()
    val x = o.filter(_.getString(0) == "BUILDING").map(_.getLong(1))
    val y = o.filter(_.getString(0) != "BUILDING").map(_.getLong(1))
    assert(r.getAs[Long]("nx") == x.length && r.getAs[Long]("ny") == y.length)
    def cross(a: Array[Long], b: Array[Long]): BigInt =
      a.foldLeft(BigInt(0))((acc, av) =>
        acc + b.foldLeft(BigInt(0))((in, bv) => in + BigInt((av - bv).abs)))
    val (sxy, sxx, syy) = (cross(x, y), cross(x, x), cross(y, y))
    assert(BigInt(r.getAs[Long]("sxy_cents")) == sxy)
    assert(BigInt(r.getAs[Long]("sxx_cents")) == sxx)
    assert(BigInt(r.getAs[Long]("syy_cents")) == syy)
    val e = math.floor(1e6 * (2.0 * sxy.toDouble / (x.length.toDouble * y.length)
      - sxx.toDouble / (x.length.toDouble * x.length)
      - syy.toDouble / (y.length.toDouble * y.length))).toLong
    assert(r.getAs[Long]("e_micro") == e)
    assert(r.getAs[Long]("e_micro") >= 0, "energy distance is non-negative")
  }
}
