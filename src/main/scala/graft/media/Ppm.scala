package graft.media

/** Second real pure-JVM image codec: binary PPM (netpbm P6, maxval 255).
  * Exists to prove the media frame is codec-GENERIC — the decode/resize
  * pipelines accept any (encode, decode) pair that round-trips RGB, and a
  * second format with a completely different container shape (ASCII header
  * with whitespace/comment tokenization + raw top-down RGB body, vs BMP's
  * little-endian binary headers + padded bottom-up BGR rows) exercises the
  * frame rather than one parser's quirks.
  *
  * The header parser is real: magic check, whitespace tokenization with
  * `#`-comment skipping (comments are legal anywhere whitespace is, per the
  * netpbm spec), decimal dims/maxval, and the single whitespace byte that
  * separates the header from the binary body.
  */
object Ppm {

  private val MaxDim = 1 << 20 // same sanity bound as Bmp.decode

  /** Encode a top-down row-major RGB byte array as binary PPM (P6). */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be width*height*3 bytes")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode a binary PPM to (width, height, top-down row-major RGB). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def isSpace(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
    // one whitespace/comment run; comments run to end-of-line
    def skipSpace(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        if (isSpace(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def decimalToken(): Int = {
      skipSpace()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        require(v <= Int.MaxValue, "PPM header value overflows Int")
        pos += 1
      }
      require(pos > start, "malformed PPM header: expected a decimal value")
      v.toInt
    }
    require(bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte,
      "bad PPM magic (only binary P6 supported)")
    pos = 2
    val width = decimalToken()
    val height = decimalToken()
    val maxval = decimalToken()
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"unreasonable PPM dimensions ${width}x$height")
    require(maxval == 255, "only maxval 255 (1 byte/sample) supported")
    // exactly ONE whitespace byte separates header from body (per spec) —
    // body bytes may legally start with values that look like whitespace
    require(pos < bytes.length && isSpace(bytes(pos)), "missing header/body separator")
    pos += 1
    val n = width.toLong * height * 3
    require(bytes.length.toLong >= pos.toLong + n, "truncated pixel data")
    val rgb = new Array[Byte](n.toInt)
    System.arraycopy(bytes, pos, rgb, 0, n.toInt)
    (width, height, rgb)
  }
}
