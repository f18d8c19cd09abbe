package graft.media

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Third real pure-JVM image codec — and the first COMPRESSED one: PNG
  * (8-bit truecolor, non-interlaced). BMP and PPM prove uncompressed
  * container parsing; real multimodal ingestion is dominated by compressed
  * formats, and compression is where parse defects actually live. The JDK
  * ships DEFLATE (`java.util.zip`), so the whole format is reachable with
  * zero dependencies: signature → length-prefixed chunks with CRC-32
  * verification → IHDR validation → the concatenated IDAT zlib stream →
  * per-scanline unfiltering (all five filter types: None/Sub/Up/Average/
  * Paeth).
  *
  * The ENCODER deliberately cycles the filter type by row (`y % 5`), so a
  * round-trip exercises the decoder's entire filter suite — an unfilter
  * defect in any one of the five breaks the pixel hash the oracle
  * recomputes from first principles. IDAT is also split into two chunks:
  * decoders must treat consecutive IDATs as ONE zlib stream, a classic
  * parser bug when they don't.
  */
object Png {

  private val MaxDim = 1 << 20 // same sanity bound as Bmp/Ppm

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG's Paeth predictor: the neighbor (left, up, up-left) closest to
    * left + up − upleft, ties broken left, up, up-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: ByteArrayOutputStream, chunkType: String, data: Array[Byte]): Unit = {
    val tb = chunkType.getBytes("US-ASCII")
    require(tb.length == 4, "chunk type must be 4 bytes")
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    out.write(tb)
    out.write(data)
    val crc = new CRC32
    crc.update(tb)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode a top-down row-major RGB byte array as an 8-bit truecolor,
    * non-interlaced PNG. Filter type cycles 0..4 by row (see object doc).
    */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be width*height*3 bytes")
    val stride = width * 3
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = y % 5
      val rowBase = y * (1 + stride)
      raw(rowBase) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = rgb(y * stride + i) & 0xff
        val a = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case _ => x - paeth(a, b, c)
        }
        raw(rowBase + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater() // default = zlib wrapper, as PNG requires
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zOut.write(buf, 0, n)
    }
    deflater.end()
    val idat = zOut.toByteArray

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte)  // compression: deflate
      .put(0.toByte)  // filter method 0
      .put(0.toByte)  // non-interlaced
      .array()
    writeChunk(out, "IHDR", ihdr)
    // two IDATs on purpose: one zlib stream across chunk boundaries
    val mid = idat.length / 2
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, 0, mid))
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, mid, idat.length))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor non-interlaced PNG to (width, height,
    * top-down row-major RGB). A real parser: signature, chunk-length
    * bounds, per-chunk CRC-32 verification, IHDR field validation,
    * multi-IDAT concatenation, exact-size inflate (the expected raw size
    * is known from IHDR, so a zip-bomb or short stream both reject
    * cleanly), and full five-filter unfiltering. Rejects are always
    * `require` failures — never an index error or OOM.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= Signature.length + 12, "truncated PNG")
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, Signature.length), Signature),
      "bad PNG signature")
    var pos = Signature.length
    var width = 0
    var height = 0
    var sawIhdr = false
    var sawIend = false
    val idat = new ByteArrayOutputStream()
    while (!sawIend) {
      require(bytes.length - pos >= 12, "truncated PNG chunk header")
      val len = ByteBuffer.wrap(bytes, pos, 4).getInt
      require(len >= 0 && len <= bytes.length - pos - 12, s"bad chunk length $len")
      val typeStr = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      val stored = ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt
      require(crc.getValue.toInt == stored, s"CRC mismatch in $typeStr chunk")
      typeStr match {
        case "IHDR" =>
          require(!sawIhdr, "duplicate IHDR")
          require(len == 13, "bad IHDR length")
          val b = ByteBuffer.wrap(bytes, pos + 8, 13)
          width = b.getInt
          height = b.getInt
          require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
            s"unreasonable PNG dimensions ${width}x$height")
          require(b.get() == 8, "only bit depth 8 supported")
          require(b.get() == 2, "only truecolor (color type 2) supported")
          require(b.get() == 0, "bad compression method")
          require(b.get() == 0, "bad filter method")
          require(b.get() == 0, "only non-interlaced supported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" =>
          require(sawIhdr, "IEND before IHDR")
          require(len == 0, "bad IEND length")
          sawIend = true
        case other =>
          // unknown ancillary chunks are legal anywhere between IHDR and
          // IEND — skip, as real decoders do (the CRC was still verified)
          require(sawIhdr, s"$other chunk before IHDR")
      }
      pos += 12 + len
    }
    val stride = width * 3
    val rawLen = height.toLong * (1 + stride)
    require(rawLen <= Int.MaxValue, "raw image too large")
    // Allocation bound BEFORE allocating: PNG is compressed, so unlike
    // BMP/PPM the payload length cannot vouch for the claimed dimensions —
    // a tiny hostile file with a valid-CRC IHDR claiming huge dimensions
    // would otherwise force a ~2 GB raw+rgb allocation before a single
    // byte inflates. DEFLATE cannot exceed 1032:1 (258-byte match per
    // minimum-cost symbol), so raw bytes beyond idat×1032 are unreachable
    // and the claim is provably a lie.
    val idatLen = idat.size().toLong
    require(rawLen <= idatLen * 1032L,
      s"IDAT too small ($idatLen bytes) to inflate to the claimed ${width}x$height image")
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new Inflater() // zlib wrapper
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || inflater.finished(), "stalled or truncated IDAT stream")
        got += n
      }
      require(got == raw.length, s"short IDAT stream: $got of ${raw.length} bytes")
      // the stream must END here — trailing compressed data means the
      // image dimensions and the pixel payload disagree
      val probe = new Array[Byte](1)
      require(inflater.finished() || inflater.inflate(probe) == 0,
        "IDAT stream longer than the image")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT zlib stream: ${e.getMessage}")
    } finally inflater.end()

    val rgb = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val rowBase = y * (1 + stride)
      val ft = raw(rowBase) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      var i = 0
      while (i < stride) {
        val f = raw(rowBase + 1 + i) & 0xff
        val a = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case _ => f + paeth(a, b, c)
        }
        rgb(y * stride + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    (width, height, rgb)
  }
}
