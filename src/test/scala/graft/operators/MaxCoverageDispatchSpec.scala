package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Value-equality gate for q254's source-domain dispatch (r14): the
  * mask-histogram greedy (≤62 sources) and the pre-r13 anti-join
  * greedy (the >62-source fallback) must emit the identical rounds —
  * same gains, same (max gain, min source) argmax, same NULL rows for
  * all-covered rounds, same cumulative coverage. Tested on both sides
  * of the 62-source boundary, including a domain wide enough that the
  * old `require` would have crashed. */
class MaxCoverageDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** (source, g) dictionary from explicit pairs. */
  private def dict(pairs: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("source", "g")
  }

  test("mask greedy ≡ anti-join greedy on a small domain (incl. all-covered NULL rounds)") {
    // 3 sources, 5 greedy rounds: rounds 4-5 are all-covered → NULL
    // rows; overlaps exercise the marginal-gain (not raw-count) argmax
    val pairs = Seq(
      "s1" -> "a", "s1" -> "b", "s1" -> "c", "s1" -> "d",
      "s2" -> "c", "s2" -> "d", "s2" -> "e",
      "s3" -> "e", "s3" -> "f")
    val sg = dict(pairs)
    val mask = rows(TextAnalysis.maxCoverageGreedy(spark, sg))
    val anti = rows(TextAnalysis.maxCoverageGreedy(spark, sg,
      forceAntiJoin = true))
    assert(mask == anti)
    // argmax sanity: s1 first (4 fresh), then s2 (+1: e), then s3 (+1: f
    // already... f only) — round 2 tie s2/s3 at gain 1 breaks to min name
    assert(mask.head.contains("s1"))
  }

  test("a >62-source domain dispatches to the anti-join arm instead of crashing") {
    // 65 sources: src00..src64, each with a private shingle plus one
    // shared shingle, so the greedy has real tie-breaking to do
    val pairs = (0 until 65).flatMap { i =>
      val s = f"src$i%02d"
      Seq(s -> s"p$i", s -> "shared")
    }
    val sg = dict(pairs)
    // the old code threw require(srcs.length <= 62) here
    val out = TextAnalysis.maxCoverageGreedy(spark, sg).collect()
    assert(out.length == 5)
    // round 1: every source has gain 2 (private + shared) → min name
    assert(out.head.getString(1) == "src00")
    assert(out.head.getLong(2) == 2L)
    // rounds 2..5: marginal gain 1 (shared now covered), min names
    assert(out(1).getString(1) == "src01" && out(1).getLong(2) == 1L)
    assert(out(4).getString(1) == "src04")
    // cumulative coverage: 2, 3, 4, 5, 6
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 3L, 4L, 5L, 6L))
  }

  test("boundary: exactly 62 sources still takes the mask arm and matches the fallback") {
    val pairs = (0 until 62).flatMap { i =>
      val s = f"s$i%02d"
      Seq(s -> s"p$i")
    }
    val sg = dict(pairs)
    val mask = rows(TextAnalysis.maxCoverageGreedy(spark, sg))
    val anti = rows(TextAnalysis.maxCoverageGreedy(spark, sg,
      forceAntiJoin = true))
    assert(mask == anti)
  }
}
