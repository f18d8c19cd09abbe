package graft.media

import java.io.ByteArrayOutputStream

/** Fourth real pure-JVM image codec — and the second COMPRESSED one, from a
  * DIFFERENT compression family: GIF (87a/89a container, dynamic-dictionary
  * LZW). PNG covers DEFLATE (LZ77 + Huffman); GIF's LZW is a code-table
  * scheme with variable-width codes (minCodeSize+1 up to 12 bits,
  * LSB-first packing), explicit CLEAR/EOI control codes, and the classic
  * KwKwK corner case — an entirely different set of parser defects, which
  * is the point of carrying two compressed containers.
  *
  * The encoder builds an EXACT palette from the image's distinct colors in
  * first-appearance order (≤256 required — real GIF behavior), so for the
  * test fixtures (≤120 pixels) encode→decode round-trips losslessly.
  * The payload is split across multiple data sub-blocks (≤255 bytes each)
  * so the decoder's sub-block walker is genuinely exercised, and the
  * dictionary reset path (CLEAR at 4096 entries) is reachable with larger
  * images (covered in CodecFuzzSpec).
  *
  * Decode hardening mirrors Bmp/Ppm/Png: every read is bounds-checked,
  * rejects are always `IllegalArgumentException` (never an index error or
  * OOM), trailing bytes after the trailer reject, and — the PNG lesson —
  * the pixel allocation is bounded against the compressed payload size
  * BEFORE allocating (one LZW code is ≥ 3 bits and expands to ≤ 4096
  * pixels, so pixels beyond dataLen·(8/3)·4096 are provably a forged
  * header).
  */
object Gif {

  private val MaxPixels = 1 << 24 // 16M px (48 MB RGB) sanity bound

  /** Encode top-down row-major RGB as a single-frame GIF89a with a global
    * color table holding exactly the image's distinct colors (≤256).
    */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"unencodable GIF dimensions ${width}x$height")
    // Long math BEFORE any Int product: 43691×32768×3 overflows Int back to
    // a small positive number, which would sail past the length check and
    // die in a multi-GB allocation instead of a clean reject. The MaxPixels
    // bound (shared with decode) also caps the indices allocation.
    require(width.toLong * height <= MaxPixels,
      s"unreasonable GIF dimensions ${width}x$height")
    require(rgb.length == width * height * 3, "rgb must be width*height*3 bytes")

    // exact palette, first-appearance order
    val paletteIdx = new java.util.LinkedHashMap[Int, Int]()
    val indices = new Array[Int](width * height)
    var p = 0
    while (p < indices.length) {
      val c = ((rgb(3 * p) & 0xff) << 16) | ((rgb(3 * p + 1) & 0xff) << 8) | (rgb(3 * p + 2) & 0xff)
      val existing = paletteIdx.getOrDefault(c, -1)
      if (existing >= 0) indices(p) = existing
      else {
        require(paletteIdx.size < 256, "GIF encoding requires <= 256 distinct colors")
        indices(p) = paletteIdx.size
        paletteIdx.put(c, paletteIdx.size)
      }
      p += 1
    }
    val nColors = paletteIdx.size
    // color-table size is a power of two >= 2; minCodeSize >= 2 per spec
    var tableBits = 1
    while ((1 << tableBits) < nColors) tableBits += 1
    val minCodeSize = math.max(2, tableBits)
    val tableSize = 1 << tableBits

    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) } // little-endian
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    // GCT present, color resolution 7, unsorted, GCT size = tableBits-1
    u8(0x80 | (7 << 4) | (tableBits - 1)); u8(0); u8(0)
    val it = paletteIdx.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val c = it.next()
      u8(c >> 16); u8(c >> 8); u8(c)
      written += 1
    }
    while (written < tableSize) { u8(0); u8(0); u8(0); written += 1 }
    // image descriptor: full-frame, no local table, no interlace
    u8(0x2c); u16(0); u16(0); u16(width); u16(height); u8(0)
    u8(minCodeSize)
    val lzw = lzwCompress(indices, minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      u8(n); out.write(lzw, off, n); off += n
    }
    u8(0)    // block terminator
    u8(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW: variable-width codes minCodeSize+1..12, LSB-first,
    * CLEAR emitted first and again whenever the dictionary fills (4096).
    * The encoder widens after adding entry `next` when next == 2^width + 1
    * — one step after the decoder's `next == 2^width` rule, because the
    * encoder's dictionary runs one entry ahead of the decoder's at the
    * same stream position.
    */
  private def lzwCompress(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    var dict = new java.util.HashMap[Int, Int]()
    var next = eoi + 1
    def reset(): Unit = { dict = new java.util.HashMap[Int, Int](); next = eoi + 1; codeSize = minCodeSize + 1 }
    emit(clear)
    var cur = indices(0)
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      val key = (cur << 8) | k
      val ext = dict.getOrDefault(key, -1)
      if (ext >= 0) cur = ext
      else {
        emit(cur)
        if (next < 4096) {
          dict.put(key, next); next += 1
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else { emit(clear); reset() }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Decode a single-frame GIF to (width, height, top-down row-major RGB).
    * A real parser: signature, logical screen descriptor, global color
    * table, extension-block skipping, image descriptor validation, the
    * sub-block walker, and a full variable-width LZW decoder (CLEAR/EOI,
    * KwKwK case, 12-bit cap, exact pixel-count enforcement). Rejects are
    * always `require` failures — never an index error or OOM.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def need(n: Int, what: String): Unit =
      require(bytes.length - pos >= n, s"truncated GIF: $what")
    def u8(): Int = { need(1, "byte"); val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { need(2, "u16"); val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }

    need(6, "signature")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", "bad GIF signature")
    pos = 6
    val width = u16(); val height = u16()
    require(width > 0 && height > 0, s"bad GIF dimensions ${width}x$height")
    require(width.toLong * height <= MaxPixels, s"unreasonable GIF dimensions ${width}x$height")
    val flags = u8(); u8(); u8() // background index, aspect (ignored)
    require((flags & 0x80) != 0, "GIF without a global color table unsupported")
    val tableSize = 1 << ((flags & 7) + 1)
    need(3 * tableSize, "global color table")
    val palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * tableSize)
    pos += 3 * tableSize

    // skip extension blocks (mutations can synthesize them; real 89a files
    // carry graphic-control extensions) with full bounds checks
    var sep = u8()
    while (sep == 0x21) {
      u8() // label
      var len = u8()
      while (len != 0) { need(len, "extension sub-block"); pos += len; len = u8() }
      sep = u8()
    }
    require(sep == 0x2c, f"expected image descriptor, got 0x$sep%02x")
    val (left, top, fw, fh) = (u16(), u16(), u16(), u16())
    require(left == 0 && top == 0 && fw == width && fh == height,
      "only single full-frame GIFs supported")
    val idFlags = u8()
    require((idFlags & 0x80) == 0, "local color tables unsupported")
    require((idFlags & 0x40) == 0, "interlaced GIFs unsupported")

    val minCodeSize = u8()
    require(minCodeSize >= 2 && minCodeSize <= 11, s"bad LZW min code size $minCodeSize")
    // gather the LZW payload from the sub-block chain
    val data = new ByteArrayOutputStream()
    var len = u8()
    while (len != 0) { need(len, "image sub-block"); data.write(bytes, pos, len); pos += len; len = u8() }
    require(u8() == 0x3b, "missing GIF trailer")
    require(pos == bytes.length, "trailing bytes after GIF trailer")
    val lzw = data.toByteArray
    // allocation bound BEFORE allocating (the PNG lesson): a code is at
    // least 3 bits and expands to at most 4096 pixels, so a payload of L
    // bytes cannot legitimately produce more than L*(8/3)*4096 pixels
    require(width.toLong * height <= lzw.length.toLong * 10923L,
      s"LZW payload too small (${lzw.length} bytes) for the claimed ${width}x$height image")

    val nPixels = width * height
    val indices = lzwDecompress(lzw, minCodeSize, nPixels)
    val rgb = new Array[Byte](nPixels * 3)
    var p = 0
    while (p < nPixels) {
      val idx = indices(p)
      // minCodeSize is read independently of the table bits, so a mutated
      // header can make LZW roots overrun the palette — bound every index
      require(idx < tableSize, s"palette index $idx beyond the $tableSize-entry table")
      rgb(3 * p) = palette(3 * idx)
      rgb(3 * p + 1) = palette(3 * idx + 1)
      rgb(3 * p + 2) = palette(3 * idx + 2)
      p += 1
    }
    (width, height, rgb)
  }

  /** Variable-width LZW decode producing EXACTLY nPixels root indices:
    * short streams, streams that keep coding past EOI, and streams whose
    * expansion over- or under-shoots the pixel count all reject.
    */
  private def lzwDecompress(data: Array[Byte], minCodeSize: Int, nPixels: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Int](nPixels)
    var outLen = 0
    // dictionary as (prefixCode, lastChar) pairs with the first byte
    // cached — O(1) append; materialization only at emit time by walking
    // the prefix chain backwards writing each node's LAST char
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096) // last char of the entry's string
    val first = new Array[Int](4096)  // first char (for new-entry suffixes)
    val length = new Array[Int](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i; first(i) = i; length(i) = 1; i += 1 }
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var posIn = 0
    var finished = false
    def emit(code: Int): Unit = {
      val n = length(code)
      require(outLen + n <= nPixels, "LZW stream expands past the pixel count")
      var c = code
      var j = outLen + n - 1
      while (c != -1) { out(j) = suffix(c); j -= 1; c = prefix(c) }
      outLen += n
    }
    while (!finished) {
      while (bitCnt < codeSize && posIn < data.length) {
        bitBuf |= (data(posIn) & 0xffL) << bitCnt
        bitCnt += 8; posIn += 1
      }
      require(bitCnt >= codeSize, "truncated LZW stream")
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      if (code == clear) { next = eoi + 1; codeSize = minCodeSize + 1; prev = -1 }
      else if (code == eoi) {
        finished = true
      } else if (prev == -1) {
        require(code < clear, s"first LZW code after clear must be a root, got $code")
        emit(code); prev = code
      } else {
        require(code <= next && code < 4096, s"LZW code $code beyond dictionary size $next")
        if (next < 4096) {
          // entry = table(prev) + first byte of the current string; for
          // the KwKwK case (code == next) the current string IS this entry
          prefix(next) = prev
          suffix(next) = first(if (code == next) prev else code)
          first(next) = first(prev)
          length(next) = length(prev) + 1
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else require(code < next, s"LZW code $code with a full dictionary")
        emit(code); prev = code
      }
    }
    require(outLen == nPixels, s"LZW stream holds $outLen of $nPixels pixels")
    out
  }
}
