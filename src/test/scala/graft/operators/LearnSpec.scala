package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the q95–q98 oracles can't isolate: assignment tie-breaks,
  * truncating-division centroid means (the Spark `div` ≡ DuckDB `//`
  * contract), the count-min overestimate guarantee, and greedy BPE
  * encoding — hand-computed cases plus corpus-level properties. */
class LearnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  test("kmeans assign: nearest centroid wins, distance ties break to the smaller cid") {
    // 1-dim points at q=0 and q=10; centroids at 0 and 10; a third
    // point at q=5 is equidistant -> must go to cid 0
    val pts = Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 5L))
      .toDF("vec_id", "pos", "q")
    val cent = Seq((0L, 1L, 0L), (1L, 1L, 10L)).toDF("cid", "pos", "c")
    val got = Learn.assign(pts, cent).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 25L)))
  }

  test("kmeans update: centroid mean is TRUNCATING integer division (matches DuckDB //)") {
    // cluster 0 holds q = -3 and -4 at pos 1: sum -7, count 2 ->
    // -7 div 2 = -3 (toward zero), NOT floor(-3.5) = -4
    val pts = Seq((1L, 1L, -3L), (2L, 1L, -4L)).toDF("vec_id", "pos", "q")
    val asg = Seq((1L, 0L, 0L), (2L, 0L, 0L)).toDF("vec_id", "cid", "dist")
    val got = Learn.update(asg, pts).collect()
    assert(got.length == 1 && got(0).getLong(2) == -3L, got.mkString(","))
  }

  test("q95 clusters partition the corpus; inertia is non-negative") {
    val df = SparkEntry.queries("q95_kmeans")(spark, SF)
      .agg(sum("n_points"), min("inertia")).head()
    val n = graft.Tables.embeddings(spark, SF).count()
    assert(df.getLong(0) == n, s"cluster sizes must sum to the corpus ($n)")
    assert(df.getLong(1) >= 0L)
  }

  test("q96 confusion matrix covers exactly the odd-vec_id half") {
    val df = SparkEntry.queries("q96_centroid_classify")(spark, SF)
    val scored = df.agg(sum("n")).head().getLong(0)
    val odd = graft.Tables.embeddings(spark, SF)
      .filter(col("vec_id") % 2 === 1).count()
    assert(scored == odd, s"scored $scored of $odd held-out vectors")
  }

  test("q97 count-min never underestimates, and is exact when no bucket collides") {
    val rows = SparkEntry.queries("q97_countmin")(spark, SF).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}")
  }

  test("bpe encode: learned merges replay greedily on new text") {
    // train on 'aaaa aaa b' for 2 merges: (a,a)->aa, then (aa,a)->aaa
    // (BpeSpec pins that). Encoding 'aaaaa': round 1 greedy gives
    // [aa, aa, a]; round 2 fuses the SECOND aa with a -> [aa, aaa]
    val train = Seq("aaaa aaa b").toDF("text")
    val enc = Seq("aaaaa").toDF("text")
    val syms = Bpe.encodeState(train, enc, 2)
      .orderBy("pos").select("sym").as[String].collect().toSeq
    assert(syms == Seq("aa", "aaa"), syms.mkString("[", ",", "]"))
  }
}
