package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q343–q344, checked at sf0.001. */
class Round7kSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q343 AB funnel: reach shrinks down the funnel, identities hold") {
    val rows = run("q343_ab_funnel")
    assert(rows.map(_.getAs[String]("event_type")).toSeq ==
      Seq("view", "click", "purchase"))
    for (r <- rows) {
      val (ka, na, kb, nb) = (r.getAs[Long]("ka"), r.getAs[Long]("na"),
        r.getAs[Long]("kb"), r.getAs[Long]("nb"))
      assert(ka <= na && kb <= nb)
      assert(r.getAs[Long]("conv_a_ppm") == 1000000L * ka / na)
      assert(r.getAs[Long]("conv_b_ppm") == 1000000L * kb / nb)
    }
    // each step's base is the previous step's reach
    for (w <- rows.sliding(2); if w.length == 2) {
      val (prev, next) = (w(0), w(1))
      assert(next.getAs[Long]("na") == prev.getAs[Long]("ka"))
      assert(next.getAs[Long]("nb") == prev.getAs[Long]("kb"))
    }
  }

  test("q344 trigram selectivity: estimate is a sound upper bound, brute replay") {
    val rows = run("q344_trgm_selectivity")
    assert(rows.length == 4)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("text")).collect().map(_.getString(0))
    for (r <- rows) {
      val pat = r.getAs[String]("pat")
      val actual = docs.count(_.contains(pat)).toLong
      assert(r.getAs[Long]("true_docs") == actual, s"truth replay: $pat")
      // the trigram intersection bound can NEVER undercount
      assert(r.getAs[Long]("est_docs") >= actual,
        s"index bound undercounts for '$pat': $r")
      // and replays exactly as the every-trigram containment count
      val grams = pat.sliding(3).toSet
      val est = docs.count(d => grams.forall(d.contains)).toLong
      assert(r.getAs[Long]("est_docs") == est, s"estimate replay: $pat")
    }
  }
}
