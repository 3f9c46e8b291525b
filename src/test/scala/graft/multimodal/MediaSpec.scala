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

  test("ppm codec: encode/decode roundtrip is exact") {
    val img = Ppm.decode(Ppm.encode(13, 7, (x, y) => (x << 16) | (y << 8) | 42)).get
    assert(img.width == 13 && img.height == 7)
    assert(img.pixels.length == 13 * 7 * 3)
    // pixel (5, 3) = RGB(5, 3, 42)
    val i = (3 * 13 + 5) * 3
    assert((img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff, img.pixels(i + 2) & 0xff) == ((5, 3, 42)))
    // non-PPM payloads are rejected, not mis-parsed
    assert(Ppm.decode("RIFFsome audio".getBytes).isEmpty)
    assert(Ppm.decode("P6\n4 4\n255\nshort".getBytes).isEmpty) // truncated
    // adversarial dims whose w*h*3 overflows Int must be rejected, not crash
    assert(Ppm.decode("P6\n46341 46341\n255\nxxxx".getBytes).isEmpty)
    assert(Ppm.decode("P6\n37838 37838\n255\nxxxx".getBytes).isEmpty)
  }

  test("ppm pipeline: real decode reports true dims, real resize rescales pixels") {
    val feats = Media.decode(spark, Media.ingestPpm(spark, docs))
      .collect().sortBy(_.asset_id)
    // dims follow the ingest formula: w = 8 + id%9, h = 8 + (id/9)%9
    feats.foreach { f =>
      assert(f.width == 8 + (f.asset_id % 9).toInt, f.toString)
      assert(f.height == 8 + ((f.asset_id / 9) % 9).toInt, f.toString)
      assert(f.n_frames == 1)
      assert(f.feature.length == Media.FeatureDim)
      // first three feature dims are channel means in [0, 1]
      assert(f.feature.take(3).forall(v => v >= 0f && v <= 1f))
    }
    // real resize: longest side becomes exactly maxDim, payload stays P6
    val resized = Media.resize(spark, Media.ingestPpm(spark, docs), maxDim = 6)
      .collect().sortBy(_.asset_id)
    resized.foreach { a =>
      val img = Ppm.decode(a.payload).get
      assert(math.max(img.width, img.height) == 6, img.toString)
      assert(a.payload_bytes == a.payload.length.toLong)
    }
    // resized pixels come from the source image (nearest-neighbor),
    // e.g. corner pixel (0,0) is preserved exactly
    val src = Ppm.decode(Media.ingestPpm(spark, docs).collect().sortBy(_.asset_id).head.payload).get
    val dst = Ppm.decode(resized.head.payload).get
    assert(dst.pixels.take(3).toSeq == src.pixels.take(3).toSeq)
  }

  test("wav codec: encode/decode roundtrip is exact; non-wav RIFF rejected") {
    val samples = Array.tabulate(200)(i => ((i * 173) % 65536 - 32768).toShort)
    val au = Wav.decode(Wav.encode(11000, samples)).get
    assert(au.sampleRate == 11000 && au.channels == 1)
    assert(au.samples.toSeq == samples.toSeq)
    // the stand-in "RIFF"+text payloads are NOT WAVE: must reject
    assert(Wav.decode("RIFFsome audio payload body".getBytes).isEmpty)
    assert(Wav.decode(Wav.encode(8000, samples).take(50)).isEmpty) // truncated
    // adversarial chunk size near 2^31 must fail the bounds check, not
    // wrap negative and crash / allocate gigabytes
    val evil = "RIFF0000WAVEjunk".getBytes("US-ASCII")
    evil(12) = 'j'; evil(13) = 'u'; evil(14) = 'n'; evil(15) = 'k'
    val withSize = evil ++ Array[Byte](0xf4.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte)
    assert(Wav.decode(withSize).isEmpty)
  }

  test("wav resize is identity: audio payloads stay decodable") {
    val assets = Media.ingestWav(spark, docs)
    val resized = Media.resize(spark, assets, maxDim = 4).collect().sortBy(_.asset_id)
    val originals = assets.collect().sortBy(_.asset_id)
    resized.zip(originals).foreach { case (r, o) =>
      assert(r.payload.toSeq == o.payload.toSeq)
      assert(Wav.decode(r.payload).isDefined)
    }
  }

  test("wav pipeline: real decode reports true rate and chunk count") {
    val feats = Media.decode(spark, Media.ingestWav(spark, docs))
      .collect().sortBy(_.asset_id)
    feats.foreach { f =>
      assert(f.width == 8000 + (f.asset_id % 8).toInt * 1000, f.toString)
      assert(f.height == 1) // mono
      val n = 64 + (f.asset_id % 100).toInt
      assert(f.n_frames == 1 + (n - 1) / 64, f.toString)
      assert(f.feature.length == Media.FeatureDim)
      // RMS and zero-crossing-rate are normalized
      assert(f.feature(0) >= 0f && f.feature(0) <= 1f)
      assert(f.feature(2) >= 0f && f.feature(2) <= 1f)
    }
  }

  test("zppm codec: deflate roundtrip is exact, compresses, rejects corruption") {
    val ppm = Ppm.encode(32, 24, (x, y) => (x << 16) | (y << 8) | ((x + y) & 0xff))
    val z = Zppm.encode(ppm)
    assert(Zppm.isZppm(z))
    assert(z.length < ppm.length, s"no compression: ${z.length} >= ${ppm.length}")
    val img = Zppm.decode(z).get
    assert(img.width == 32 && img.height == 24)
    assert(java.util.Arrays.equals(img.pixels, Ppm.decode(ppm).get.pixels))
    // corruption and lying length headers must return None, not throw
    assert(Zppm.decode(z.dropRight(5)).isEmpty) // truncated stream
    val lying = z.clone(); lying(4) = 0x7f.toByte // giant length header
    assert(Zppm.decode(lying).isEmpty)
    assert(Zppm.decode("ZP6\nnotdeflate".getBytes("US-ASCII")).isEmpty)
    // FDICT zlib header (0x78 0xBB): preset-dictionary streams must
    // return None, not spin in the inflate loop
    val fdict = ("ZP6\n".getBytes("US-ASCII") :+ 0.toByte :+ 0.toByte :+ 0.toByte :+ 16.toByte) ++
      Array[Byte](0x78, 0xbb.toByte, 1, 2, 3, 4)
    assert(Zppm.decode(fdict).isEmpty)
  }

  test("zppm pipeline: decode inflates for real, resize re-compresses in-container") {
    val assets = Media.ingestZppm(spark, docs)
    val feats = Media.decode(spark, assets).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.width == 8 + (f.asset_id % 9).toInt, f.toString) // real dims,
      assert(f.height == 8 + ((f.asset_id / 9) % 9).toInt, f.toString) // not stub hash dims
    }
    val resized = Media.resize(spark, assets, maxDim = 10).collect()
    resized.foreach { a =>
      assert(Zppm.isZppm(a.payload), "resize left the compressed container")
      val img = Zppm.decode(a.payload).get
      assert(math.max(img.width, img.height) <= 10, s"${img.width}x${img.height}")
    }
  }

  test("vid codec: container walk is lazy, per-frame seek decodes real pixels") {
    val id = 23L
    val w = 8 + (id % 9).toInt; val h = 8 + ((id / 9) % 9).toInt
    val n = 1 + (id % 7).toInt
    val frames = (0 until n).map { f =>
      Zppm.encode(Ppm.encode(w, h, (x, y) =>
        (((id + x + f) % 256).toInt << 16) | (((id + y) % 256).toInt << 8) | ((x ^ y ^ f) % 256)))
    }
    val payload = Vid.encode(frames)
    val v = Vid.decode(payload).get
    assert(v.nFrames == n)
    // seek straight to the LAST frame and verify its pixel formula —
    // proves the length-prefix walk lands on real frame boundaries
    val last = v.frame(n - 1).get
    assert(last.width == w && last.height == h)
    val f = n - 1
    assert((last.pixels(0) & 0xff) == ((id + 0 + f) % 256).toInt)     // R(0,0)
    assert((last.pixels(1) & 0xff) == ((id + 0) % 256).toInt)         // G(0,0)
    assert((last.pixels(2) & 0xff) == ((0 ^ 0 ^ f) % 256))            // B(0,0)
    assert(v.frame(n).isEmpty && v.frame(-1).isEmpty)
    // corrupt index: a length field walking past the payload is rejected
    val bad = payload.clone(); bad(8) = 0x7f.toByte
    assert(Vid.decode(bad).isEmpty) // giant length: Long-guarded bound
    assert(Vid.decode(payload.dropRight(3)).isEmpty)
  }

  test("vid resize: every frame really resampled, container stays decodable") {
    val resized = Media.resize(spark, Media.ingestVid(spark, docs), maxDim = 10).collect()
    assert(resized.length == docs.count())
    resized.foreach { a =>
      val v = Vid.decode(a.payload).getOrElse(fail(s"asset ${a.asset_id} no longer parses"))
      assert(v.nFrames == 1 + (a.asset_id % 7).toInt)
      (0 until v.nFrames).foreach { i =>
        val f = v.frame(i).getOrElse(fail(s"frame $i of ${a.asset_id} undecodable"))
        assert(math.max(f.width, f.height) <= 10, s"${f.width}x${f.height}")
      }
    }
  }

  test("vid pipeline: decode reports frame-0 dims and the real frame count") {
    val feats = Media.decode(spark, Media.ingestVid(spark, docs)).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.kind == "video")
      assert(f.width == 8 + (f.asset_id % 9).toInt, f.toString)
      assert(f.height == 8 + ((f.asset_id / 9) % 9).toInt, f.toString)
      assert(f.n_frames == 1 + (f.asset_id % 7).toInt, f.toString)
    }
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
