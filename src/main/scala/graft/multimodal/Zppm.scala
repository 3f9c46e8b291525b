package graft.multimodal

import java.util.zip.{Deflater, Inflater}

/** A real COMPRESSED image container, no libraries: DEFLATE-wrapped
  * PPM (`ZP6\n` magic + 4-byte big-endian uncompressed length + one
  * zlib stream of a full P6 payload). PNG is exactly this idea
  * (zlib-compressed raster behind a magic); the JDK ships the real
  * DEFLATE codec (`java.util.zip`), so unlike the PNG/RIFF/FTYP
  * stand-ins this path performs genuine compression and decompression
  * on the binary column — closing the "compressed formats are
  * stubbed" gap with an honest codec.
  */
object Zppm {

  private val Magic: Array[Byte] = "ZP6\n".getBytes("US-ASCII")
  /** Decode allocation cap — an adversarial length header must not be
    * able to allocate gigabytes before the inflate fails (zip bomb). */
  val MaxDecodedBytes: Int = 1 << 26

  /** Compress a P6 payload (level 6 — deterministic for a given JVM's
    * zlib, which is all the determinism a content-addressed pipeline
    * needs within one run). */
  def encode(ppm: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    try {
      d.setInput(ppm); d.finish()
      val buf = new Array[Byte](ppm.length + 64)
      val out = new java.io.ByteArrayOutputStream(ppm.length / 2 + 16)
      out.write(Magic)
      out.write(Array[Byte](
        (ppm.length >>> 24).toByte, (ppm.length >>> 16).toByte,
        (ppm.length >>> 8).toByte, ppm.length.toByte))
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  def isZppm(payload: Array[Byte]): Boolean =
    payload.length > 8 && payload(0) == 'Z' && payload(1) == 'P' &&
      payload(2) == '6' && payload(3) == '\n'

  /** Inflate and decode; None on wrong magic, oversized/lying length
    * header, or a corrupt stream. */
  def decode(payload: Array[Byte]): Option[Ppm.Image] = {
    if (!isZppm(payload)) return None
    val len = ((payload(4) & 0xff) << 24) | ((payload(5) & 0xff) << 16) |
      ((payload(6) & 0xff) << 8) | (payload(7) & 0xff)
    if (len <= 0 || len > MaxDecodedBytes) return None
    val inf = new Inflater()
    try {
      inf.setInput(payload, 8, payload.length - 8)
      val out = new Array[Byte](len)
      var got = 0
      while (got < len && !inf.finished()) {
        val n = inf.inflate(out, got, len - got)
        // 0 with needsInput: truncated; 0 with needsDictionary (FDICT
        // streams): unsupported — either way bail, never spin
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
      if (got != len) return None
      // drive the inflater to the stream end so the zlib Adler32
      // trailer is actually verified — stopping at `len` bytes would
      // accept a truncated or checksum-corrupt stream
      if (!inf.finished() &&
        (inf.inflate(new Array[Byte](1)) != 0 || !inf.finished())) return None
      Ppm.decode(out)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }
}
