package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q338–q339, checked at sf0.001. */
class Round7iSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q338 NB fit: moments sane, (r, p) only where overdispersed, identity") {
    val rows = run("q338_nb_fit")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val m = r.getAs[Long]("mean_milli")
      val v = r.getAs[Long]("var_milli")
      assert(m >= 1000, "every observed user has >= 1 event")
      if (r.get(r.fieldIndex("r_milli")) != null) {
        assert(v > m, "an NB fit exists only when overdispersed")
        assert(r.getAs[Long]("r_milli") > 0)
        val p = r.getAs[Long]("p_milli")
        assert(p > 0 && p <= 1000)
      }
    }
  }

  test("q339 largest remainder: exact-sum apportionment, near-quota") {
    val rows = run("q339_largest_remainder")
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L,
      "apportionment must hit the sample size exactly")
    val total = rows.map(_.getAs[Long]("n")).sum
    for (r <- rows) {
      val (n, base, alloc) = (r.getAs[Long]("n"), r.getAs[Long]("base"),
        r.getAs[Long]("alloc"))
      assert(base == 1000L * n / total)
      assert(alloc == base || alloc == base + 1)
      assert(r.getAs[Long]("extra") == alloc - base)
    }
  }
}
