package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based contracts for the byte-level codecs — random dims,
  * pixels, rates and samples catch header/offset edge cases that
  * hand-picked vectors miss. Pure JVM (no SparkSession), so these run
  * in milliseconds. */
object CodecProperties extends Properties("codecs") {

  private val dim = Gen.choose(1, 40)

  property("ppm roundtrip is exact for any dims and pixels") =
    Prop.forAll(dim, dim, Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val img = Ppm.decode(Ppm.encode(w, h, (x, y) => px(y * w + x))).get
      img.width == w && img.height == h &&
        img.pixels.grouped(3).zipWithIndex.forall { case (rgb, i) =>
          val p = px(i)
          (rgb(0) & 0xff) == ((p >> 16) & 0xff) &&
            (rgb(1) & 0xff) == ((p >> 8) & 0xff) &&
            (rgb(2) & 0xff) == (p & 0xff)
        }
    }

  property("ppm resize hits the target longest side and keeps aspect order") =
    Prop.forAll(Gen.choose(2, 40), Gen.choose(2, 40), Gen.choose(1, 39), Gen.long) {
      (w, h, maxDim, seed) =>
        val rnd = new scala.util.Random(seed)
        val img = Ppm.decode(Ppm.encode(w, h, (_, _) => rnd.nextInt(1 << 24))).get
        val r = Ppm.resizeNearest(img, maxDim)
        val shrunk = math.max(w, h) > maxDim
        val longestOk =
          if (shrunk) math.max(r.width, r.height) == maxDim
          else (r.width, r.height) == ((w, h))
        // the longest source side maps to the longest result side
        // (non-strict: the short side may clamp to 1 and tie)
        val orientationOk =
          if (w >= h) r.width >= r.height || r.height == 1
          else r.height >= r.width || r.width == 1
        longestOk && r.pixels.length == r.width * r.height * 3 && orientationOk
    }

  property("ppm decode never throws on arbitrary bytes") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      Ppm.decode(bytes); true // Option result, no exception
    }

  property("wav roundtrip is exact for any rate and samples") =
    Prop.forAll(Gen.choose(1, 192000), Gen.containerOf[Array, Short](
      Gen.choose(Short.MinValue, Short.MaxValue))) { (rate, samples) =>
      val au = Wav.decode(Wav.encode(rate, samples)).get
      au.sampleRate == rate && au.channels == 1 && au.samples.toSeq == samples.toSeq
    }

  property("wav decode never throws on arbitrary bytes") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      Wav.decode(bytes); true
    }

  property("wav decode never throws on corrupted valid payloads") =
    Prop.forAll(Gen.choose(0, 99), Gen.choose(Byte.MinValue, Byte.MaxValue), Gen.long) {
      (pos, b, seed) =>
        val rnd = new scala.util.Random(seed)
        val payload = Wav.encode(8000, Array.fill(20)(rnd.nextInt().toShort))
        val corrupted = payload.clone()
        corrupted(pos % payload.length) = b
        Wav.decode(corrupted); true
    }

  property("zppm roundtrip is exact for any dims and pixels") =
    Prop.forAll(dim, dim, Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val ppm = Ppm.encode(w, h, (x, y) => px(y * w + x))
      val img = Zppm.decode(Zppm.encode(ppm)).get
      img.width == w && img.height == h &&
        java.util.Arrays.equals(img.pixels, Ppm.decode(ppm).get.pixels)
    }

  property("zppm decode never throws or hangs on corrupted valid payloads") =
    Prop.forAll(Gen.choose(0, 999), Gen.choose(Byte.MinValue, Byte.MaxValue), Gen.long) {
      (pos, b, seed) =>
        val rnd = new scala.util.Random(seed)
        val payload = Zppm.encode(Ppm.encode(5, 5, (_, _) => rnd.nextInt(1 << 24)))
        val corrupted = payload.clone()
        corrupted(pos % payload.length) = b
        Zppm.decode(corrupted); true // Option or None — never throw/spin
    }

  property("vid roundtrip: every frame seekable and exact") =
    Prop.forAll(Gen.choose(1, 6), Gen.choose(1, 12), Gen.choose(1, 12), Gen.long) {
      (n, w, h, seed) =>
        val rnd = new scala.util.Random(seed)
        val pixelSets = Vector.fill(n)(Array.fill(w * h)(rnd.nextInt(1 << 24)))
        val payload = Vid.encode(pixelSets.map(px =>
          Zppm.encode(Ppm.encode(w, h, (x, y) => px(y * w + x)))))
        val v = Vid.decode(payload).get
        v.nFrames == n && (0 until n).forall { i =>
          val f = v.frame(i).get
          f.width == w && f.height == h &&
            java.util.Arrays.equals(f.pixels,
              Ppm.decode(Ppm.encode(w, h, (x, y) => pixelSets(i)(y * w + x))).get.pixels)
        }
    }

  property("vid decode never throws on corrupted valid payloads") =
    Prop.forAll(Gen.choose(0, 9999), Gen.choose(Byte.MinValue, Byte.MaxValue), Gen.long) {
      (pos, b, seed) =>
        val rnd = new scala.util.Random(seed)
        val payload = Vid.encode(Seq.fill(3)(
          Zppm.encode(Ppm.encode(4, 4, (_, _) => rnd.nextInt(1 << 24)))))
        val corrupted = payload.clone()
        corrupted(pos % payload.length) = b
        Vid.decode(corrupted).foreach(v => (0 until v.nFrames).foreach(v.frame))
        true
    }
}
