package graft.multimodal

/** A real image codec, no libraries: binary PPM (P6), the simplest
  * uncompressed raster format (`P6\n<w> <h>\n255\n` + w*h*3 RGB
  * bytes). This is the genuine decode path for uncompressed payloads —
  * [[Media.decodeStub]] remains only for the compressed-format
  * stand-ins (PNG/RIFF/FTYP magics) whose codecs aren't in this
  * environment. Everything here is deterministic byte math, so decoded
  * dims/pixels are exact test oracles.
  */
object Ppm {

  /** Encode w×h pixels; `rgb(x, y)` returns the packed 0xRRGGBB int. */
  def encode(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = rgb(x, y)
        out(i) = ((p >> 16) & 0xff).toByte
        out(i + 1) = ((p >> 8) & 0xff).toByte
        out(i + 2) = (p & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  def isPpm(payload: Array[Byte]): Boolean =
    payload.length > 2 && payload(0) == 'P' && payload(1) == '6'

  /** Decode a P6 payload; None if not P6 or malformed/truncated. */
  def decode(payload: Array[Byte]): Option[Image] = {
    if (!isPpm(payload)) return None
    // header: three whitespace-separated tokens after "P6" (w, h, max)
    var i = 2
    def nextInt(): Int = {
      while (i < payload.length && payload(i).toChar.isWhitespace) i += 1
      var v = 0; var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = nextInt(); val h = nextInt(); val mx = nextInt()
    if (w <= 0 || h <= 0 || mx != 255 || i >= payload.length) return None
    i += 1 // single whitespace after maxval
    // Long arithmetic: crafted dims like 46341x46341 overflow w*h*3 in
    // Int and would bypass the truncation check (then crash downstream)
    val need = w.toLong * h * 3L
    if (payload.length - i < need) return None
    Some(Image(w, h, java.util.Arrays.copyOfRange(payload, i, i + need.toInt)))
  }

  /** Nearest-neighbor resample so the longest side becomes `maxDim`
    * (no-op if already within). Integer source-index math — exact and
    * engine/platform independent. */
  def resizeNearest(img: Image, maxDim: Int): Image = {
    val longest = math.max(img.width, img.height)
    if (longest <= maxDim) return img
    val w2 = math.max(1, (img.width.toLong * maxDim / longest).toInt)
    val h2 = math.max(1, (img.height.toLong * maxDim / longest).toInt)
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1); out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }
}
