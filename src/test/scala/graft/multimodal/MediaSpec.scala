package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the multimodal plumbing: schema, batch shape,
  * determinism of the stubbed codec, frame sampling. */
class MediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image payload body", "en", "s0", 21L),
    (1L, "an audio payload body with more bytes in it " * 4, "en", "s0", 176L),
    (2L, "a video payload body " * 20, "en", "s1", 420L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("ingest: kinds route by id, payload carries magic + utf8 body") {
    val assets = Media.ingest(spark, docs).collect().sortBy(_.asset_id)
    assert(assets.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assets.foreach { a =>
      val magic = new String(a.payload.take(4), "UTF-8")
      assert(magic == Media.Magics(a.kind))
      assert(a.payload_bytes == a.payload.length - 4 + 4)
    }
  }

  test("decode stub: deterministic, schema-complete, kind-aware frames") {
    val f1 = Media.decode(spark, Media.ingest(spark, docs)).collect().sortBy(_.asset_id)
    val f2 = Media.decode(spark, Media.ingest(spark, docs)).collect().sortBy(_.asset_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    val byKind = f1.map(f => f.kind -> f).toMap
    assert(byKind("image").n_frames == 1)
    assert(byKind("audio").n_frames > 1)
    assert(f1.forall(_.feature.length == Media.FeatureDim))
    // feature is a normalized histogram: sums to ~1
    f1.foreach(f => assert(math.abs(f.feature.sum - 1f) < 1e-3))
  }

  test("resize stub: shrinks payload quadratically with scale, keeps magic") {
    val assets = Media.ingest(spark, docs)
    val resized = Media.resize(spark, assets, maxDim = 20).collect().sortBy(_.asset_id)
    val originals = assets.collect().sortBy(_.asset_id)
    resized.zip(originals).foreach { case (r, o) =>
      assert(r.payload_bytes <= o.payload_bytes)
      assert(new String(r.payload.take(4), "UTF-8") == Media.Magics(r.kind))
    }
    // determinism
    val again = Media.resize(spark, assets, maxDim = 20).collect().sortBy(_.asset_id)
    assert(resized.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("frame sampling: stride-spaced indices within frame count") {
    val feats = Media.decode(spark, Media.ingest(spark, docs)).toDF()
    val sampled = Media.sampleFrames(feats, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(sampled.nonEmpty)
    val nFrames = feats.filter(col("kind") === "video")
      .select("n_frames").head().getInt(0)
    val idxs = sampled.filter(_._1 == 2L).map(_._2).sorted
    assert(idxs.head == 0 && idxs.last < nFrames)
    assert(idxs.sliding(2).forall { case Array(a, b) => b - a == 2; case _ => true })
  }
}
