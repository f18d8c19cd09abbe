package graft.media

/** Sixth real pure-JVM media codec — and the first VIDEO one: YUV4MPEG2
  * ("Y4M"), the uncompressed video interchange container used by the
  * mjpegtools/ffmpeg toolchains. Extends the multimodal frame from images
  * (BMP/PPM/PNG/GIF) and audio (WAV) to multi-frame video with the same
  * discipline: a genuine container parser (ASCII stream header with tagged
  * parameters `W`/`H`/`F`/`C`, per-frame `FRAME` markers with optional
  * parameters, raw C444 Y/U/V planes), hardened against corrupt headers
  * the way [[Bmp.decode]] is (dimension sanity before size arithmetic,
  * Long-math truncation checks, bounded frame counts), with downstream
  * features computed from the DECODED planes only — the oracle recomputes
  * them from the generating formulas, never through the codec.
  *
  * C444 (no chroma subsampling) keeps every plane exactly width×height
  * bytes, so the round-trip is lossless for arbitrary dimensions — the
  * fixture does not have to dodge 4:2:0's even-dimension constraint, and
  * a plane-order or frame-boundary defect shifts bytes the pixel hash
  * catches.
  */
object Y4m {

  /** Sanity bounds: corrupt headers fail fast instead of allocating
    * unbounded arrays. 2^20 per axis mirrors [[Bmp]]; 4096 frames caps a
    * single asset's decode allocation (frame SAMPLING happens after parse,
    * so the parser itself must bound the worst case).
    */
  private val MaxDim = 1 << 20
  private val MaxFrames = 4096
  private val MaxTotalBytes = 1L << 31

  /** One decoded frame: C444 planes, each width*height bytes. */
  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** Encode C444 frames as a canonical YUV4MPEG2 stream
    * (`YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C444\n` then per frame
    * `FRAME\n` + Y + U + V planes).
    */
  def encode(width: Int, height: Int, frames: Seq[Frame]): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    // same Long-math bound as decode: without it the Int product wraps and
    // plane-length validation runs against the wrong (or zero) size
    require(width.toLong * height <= MaxTotalBytes / 3, "frame size exceeds bound")
    val planeLen = width * height
    frames.foreach { f =>
      require(f.y.length == planeLen && f.u.length == planeLen && f.v.length == planeLen,
        "every C444 plane must be width*height bytes")
    }
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (marker.length + 3 * planeLen))
    out.write(header)
    frames.foreach { f =>
      out.write(marker)
      out.write(f.y); out.write(f.u); out.write(f.v)
    }
    out.toByteArray
  }

  /** Decode a YUV4MPEG2 stream to (width, height, frames). A real parser:
    * validates the magic token, parses the tagged parameter list (order-
    * independent, unknown tags like `X...` metadata skipped per spec),
    * requires C444 explicitly (the spec's DEFAULT colorspace is 4:2:0, so
    * an absent `C` tag is a reject here, not a silent wrong-plane-size
    * read), walks `FRAME` markers tolerating per-frame parameters, and
    * requires the byte stream to end exactly on a frame boundary.
    */
  def decode(bytes: Array[Byte]): (Int, Int, IndexedSeq[Frame]) = {
    val headerEnd = bytes.indexOf('\n'.toByte)
    require(headerEnd > 0, "truncated Y4M: no stream-header terminator")
    val header = new String(bytes, 0, headerEnd, "US-ASCII")
    // the magic must sit at byte 0 — split-then-filter would tolerate
    // leading spaces, a malformed stream per spec
    require(header == "YUV4MPEG2" || header.startsWith("YUV4MPEG2 "), "bad Y4M magic")
    val tokens = header.split(" ").filter(_.nonEmpty)

    var width = -1
    var height = -1
    var colorspace: String = null
    tokens.tail.foreach { t =>
      (t.head, t.tail) match {
        case ('W', v) => width = parsePositiveInt(v, "W")
        case ('H', v) => height = parsePositiveInt(v, "H")
        case ('C', v) => colorspace = v
        case ('F', v) => // frame rate num:den — validated for shape only
          require(v.matches("[0-9]+:[0-9]+"), s"malformed frame-rate tag F$v")
        case _ => // I (interlacing), A (aspect), X (metadata): skip
      }
    }
    require(width > 0 && height > 0, "Y4M header missing W or H")
    require(width <= MaxDim && height <= MaxDim,
      s"unreasonable Y4M dimensions ${width}x$height")
    // the tag parse strips the leading 'C', so the stored value is "444" —
    // matching "C444" here would accept only the malformed token CC444
    require(colorspace == "444",
      s"only C444 supported (got ${Option(colorspace).fold("<absent — spec default 4:2:0>")("C" + _)})")

    // Long-math size bound BEFORE the Int product: 2^20 × 2^20 overflows Int
    require(width.toLong * height <= MaxTotalBytes / 3, "frame size exceeds bound")
    val planeLen = width * height
    val frames = IndexedSeq.newBuilder[Frame]
    var pos = headerEnd + 1
    var n = 0
    while (pos < bytes.length) {
      // frame header: "FRAME" + optional ' '-prefixed params, '\n'-terminated
      var lineEnd = pos
      while (lineEnd < bytes.length && bytes(lineEnd) != '\n'.toByte) lineEnd += 1
      require(lineEnd < bytes.length, "truncated Y4M: unterminated FRAME header")
      val line = new String(bytes, pos, lineEnd - pos, "US-ASCII")
      require(line == "FRAME" || line.startsWith("FRAME "),
        s"expected FRAME marker, got '${line.take(16)}'")
      n += 1
      require(n <= MaxFrames, s"implausible frame count > $MaxFrames")
      val body = lineEnd + 1
      require(body.toLong + 3L * planeLen <= bytes.length,
        s"truncated Y4M: frame $n planes exceed payload")
      frames += Frame(
        java.util.Arrays.copyOfRange(bytes, body, body + planeLen),
        java.util.Arrays.copyOfRange(bytes, body + planeLen, body + 2 * planeLen),
        java.util.Arrays.copyOfRange(bytes, body + 2 * planeLen, body + 3 * planeLen))
      pos = body + 3 * planeLen
    }
    (width, height, frames.result())
  }

  private def parsePositiveInt(s: String, tag: String): Int = {
    require(s.nonEmpty && s.forall(c => c >= '0' && c <= '9') && s.length <= 9,
      s"malformed $tag tag value '$s'")
    val v = s.toInt
    require(v > 0, s"$tag must be positive")
    v
  }
}
