package graft.multimodal

/** A real video container, no libraries: motion-ZPPM (`VID8` magic +
  * 4-byte big-endian frame count + per frame a 4-byte length prefix
  * and one [[Zppm]] payload). Motion-JPEG is exactly this layout —
  * independently compressed frames behind a length-prefixed index —
  * so seek-to-frame is an O(frames) header walk with NO inflation of
  * skipped frames: the property real frame-sampling pipelines rely on.
  */
object Vid {

  private val Magic: Array[Byte] = "VID8".getBytes("US-ASCII")
  val MaxFrames: Int = 1 << 16

  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(frames.map(_.length + 4).sum + 8)
    out.write(Magic)
    writeInt(out, frames.length)
    frames.foreach { f => writeInt(out, f.length); out.write(f) }
    out.toByteArray
  }

  private def writeInt(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }

  private def readInt(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  def isVid(payload: Array[Byte]): Boolean =
    payload.length > 8 && payload(0) == 'V' && payload(1) == 'I' &&
      payload(2) == 'D' && payload(3) == '8'

  final case class Video(nFrames: Int, frameOffsets: Array[Int], payload: Array[Byte]) {
    /** Decode one frame by index — walks the length-prefix index, only
      * the requested frame is inflated. */
    def frame(i: Int): Option[Ppm.Image] = {
      if (i < 0 || i >= nFrames) return None
      val off = frameOffsets(i)
      val len = readInt(payload, off)
      Zppm.decode(java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len))
    }
  }

  /** Parse the container index; None on wrong magic, a frame count or
    * length that walks outside the payload, or zero frames. Frames are
    * NOT inflated here — decode stays lazy per frame. */
  def decode(payload: Array[Byte]): Option[Video] = {
    if (!isVid(payload)) return None
    val n = readInt(payload, 4)
    if (n <= 0 || n > MaxFrames) return None
    val offsets = new Array[Int](n)
    var off = 8
    var i = 0
    while (i < n) {
      if (off + 4 > payload.length) return None
      val len = readInt(payload, off)
      // Long arithmetic: a crafted 2^31-ish length would overflow the
      // Int sum and slip past the bound (same guard class as Ppm)
      if (len <= 0 || off.toLong + 4L + len > payload.length) return None
      offsets(i) = off
      off += 4 + len
      i += 1
    }
    if (off != payload.length) return None // trailing garbage
    Some(Video(n, offsets, payload))
  }
}
