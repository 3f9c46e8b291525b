package graft.multimodal

/** A real audio codec, no libraries: PCM WAV (RIFF/WAVE with a 16-bit
  * mono `fmt ` + `data` chunk) — the audio counterpart of [[Ppm]].
  * Little-endian byte math only, so decoded rate/sample counts are
  * exact test oracles. Payloads that merely start with "RIFF" but are
  * not WAVE (the stand-in magic payloads) are rejected, not
  * mis-parsed. */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rd16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Encode 16-bit mono PCM. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
    out.put("RIFF".getBytes("US-ASCII")).put(le32(36 + dataSize))
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).put(le32(16))
      .put(le16(1)).put(le16(1)) // PCM, mono
      .put(le32(sampleRate)).put(le32(sampleRate * 2))
      .put(le16(2)).put(le16(16)) // block align, bits
      .put("data".getBytes("US-ASCII")).put(le32(dataSize))
    samples.foreach(s => out.put(le16(s & 0xffff)))
    out.array()
  }

  def isWav(p: Array[Byte]): Boolean =
    p.length > 12 &&
      new String(p, 0, 4, "US-ASCII") == "RIFF" &&
      new String(p, 8, 4, "US-ASCII") == "WAVE"

  /** Decode; None unless a well-formed 16-bit PCM RIFF/WAVE. Walks the
    * chunk list (fmt before data, unknown chunks skipped) like a real
    * reader. */
  def decode(payload: Array[Byte]): Option[Audio] = {
    if (!isWav(payload)) return None
    var i = 12
    var rate = -1; var channels = -1; var bits = -1
    while (i + 8 <= payload.length) {
      val id = new String(payload, i, 4, "US-ASCII")
      // chunk sizes are u32: read into Long so an adversarial size near
      // 2^31 can't wrap the bounds check negative and pass it
      val size = rd32(payload, i + 4) & 0xffffffffL
      if (i + 8 + size > payload.length) return None
      val sz = size.toInt // safe: bounded by payload.length above
      id match {
        case "fmt " =>
          if (sz < 16 || rd16(payload, i + 8) != 1) return None // PCM only
          channels = rd16(payload, i + 10)
          rate = rd32(payload, i + 12)
          bits = rd16(payload, i + 22)
        case "data" =>
          if (rate <= 0 || channels != 1 || bits != 16) return None
          val n = sz / 2
          val samples = new Array[Short](n)
          var k = 0
          while (k < n) { samples(k) = rd16(payload, i + 8 + 2 * k).toShort; k += 1 }
          return Some(Audio(rate, channels, samples))
        case _ => () // skip unknown chunk
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    None
  }
}
