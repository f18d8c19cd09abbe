package graft.media

import java.io.ByteArrayOutputStream

/** Baseline sequential JPEG (ITU-T T.81), single-component (grayscale),
  * pure JVM — the first TRANSFORM-coded codec in the media suite, and the
  * format that actually dominates real image corpora. BMP/PPM prove
  * container parsing, PNG/GIF prove lossless entropy coding; JPEG adds the
  * remaining layer a multimodal ingest must parse: marker-segmented
  * streams, canonical Huffman tables carried IN the file (DHT), zigzag
  * coefficient order, DC prediction across blocks, byte stuffing
  * (0xFF 0x00) inside the entropy-coded segment, and a dequantize + 8×8
  * inverse DCT pixel path.
  *
  * Exactness design (what makes the DuckDB oracle possible): the IDCT is
  * the separable direct transform in 2^11 fixed point with a SINGLE final
  * rounding per sample —
  *
  *   out(x,y) = (Σ_u Σ_v F(u)(x) · F(v)(y) · S(v,u)  +  2^21) >> 22
  *
  * with F(v)(x) = round(c(v)/2 · cos((2x+1)vπ/16) · 2^11) (c(0)=1/√2,
  * else 1) — [[FTable]], 64 integer literals, spec-pinned against a
  * StrictMath recomputation. Because every intermediate stays in exact
  * Long arithmetic, the whole pixel value is one closed-form integer
  * expression of the quantized coefficients, and an arithmetic shift
  * (floor) is the only rounding — which DuckDB's `>>` reproduces exactly.
  * No float ever enters the decode path, so the oracle and the decoder
  * agree bit-for-bit on EVERY coefficient pattern, not just DC-only
  * blocks. (The classic fast butterfly IDCTs round at interior nodes,
  * which is why their outputs are implementation-defined; this one trades
  * ~2× multiplies for a provable closed form — the per-block cost is a
  * constant and the transform is the cheapest stage of the decode.)
  *
  * Entropy tables are the T.81 Annex K luminance tables (K.3/K.4 DC,
  * K.5 AC) — the tables virtually every real encoder ships — carried in
  * DHT segments and REBUILT FROM THE FILE by the decoder (the decoder
  * never assumes them). Restrictions, all validated with `require`:
  * baseline DCT (SOF0) only, 8-bit precision, one component, dimensions
  * multiples of 8 (no partial-MCU padding), no restart markers.
  *
  * Reference behavior studied from /root/reference (dbt-bigquery-udf);
  * the reference has no media surface at all (macros/udf_*.sql) — this
  * codec is part of the beyond-reference multimodal layer the build
  * brief mandates.
  */
object Jpeg {

  private val MaxDim = 1 << 14 // 16384 px per axis — sanity bound

  /** Zigzag position z → natural row (vertical frequency v). T.81 Fig. A.6. */
  val ZigRow: Array[Int] = Array(
    0, 0, 1, 2, 1, 0, 0, 1, 2, 3, 4, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 6, 5, 4,
    3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 2, 3, 4, 5, 6,
    7, 7, 6, 5, 4, 3, 4, 5, 6, 7, 7, 6, 5, 6, 7, 7)

  /** Zigzag position z → natural column (horizontal frequency u). */
  val ZigCol: Array[Int] = Array(
    0, 1, 0, 0, 1, 2, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0, 0, 1, 2,
    3, 4, 5, 6, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3,
    2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 5, 6, 7, 7, 6, 7)

  /** Fixed-point IDCT basis, F(v*8 + x) = round(c(v)/2·cos((2x+1)vπ/16)·2^11).
    * Literal so the SQL oracle can embed the SAME 64 numbers; JpegSpec pins
    * this array against the StrictMath recomputation.
    */
  val FTable: Array[Int] = Array(
    724, 724, 724, 724, 724, 724, 724, 724,
    1004, 851, 569, 200, -200, -569, -851, -1004,
    946, 392, -392, -946, -946, -392, 392, 946,
    851, -200, -1004, -569, 569, 1004, 200, -851,
    724, -724, -724, 724, 724, -724, -724, 724,
    569, -1004, 200, 851, -851, -200, 1004, -569,
    392, -946, 946, -392, -392, 946, -946, 392,
    200, -569, 851, -1004, 1004, -851, 569, -200)

  // ---- Annex K luminance Huffman tables (carried in DHT; decoder rebuilds
  // from the file — these constants are only the ENCODER's choice) ----

  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman table per T.81 Annex C: BITS (codes per length
    * 1..16) + HUFFVAL (symbols in code order) → codes assigned
    * sequentially, left-justified. Validates the Kraft property during
    * construction (code must fit its length), so a hostile DHT is rejected
    * here rather than desyncing the bit reader.
    */
  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    require(bits.length == 16, "DHT BITS must have 16 entries")
    require(bits.sum == vals.length && vals.length <= 256,
      s"DHT symbol count ${vals.length} != BITS sum ${bits.sum}")
    // symbol → (code, length) for the encoder
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    // per-length canonical decode bounds for the decoder
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valIdx = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        require(code <= (1 << l) - bits(l - 1),
          s"DHT overfull at length $l — not a prefix code")
        minCode(l) = code
        valIdx(l) = k
        var i = 0
        while (i < bits(l - 1)) {
          val sym = vals(k)
          require(sym >= 0 && sym <= 255, "DHT symbol out of range")
          require(lenOf(sym) == 0, s"duplicate DHT symbol $sym")
          codeOf(sym) = code
          lenOf(sym) = l
          maxCode(l) = code
          code += 1
          k += 1
          i += 1
        }
        code <<= 1
        l += 1
      }
    }
    def has(sym: Int): Boolean = lenOf(sym) != 0
    /** Canonical lookup — safe by construction for code ∈ [minCode(l), maxCode(l)]. */
    def symbolAt(l: Int, code: Int): Int = vals(valIdx(l) + code - minCode(l))
  }

  // ---- bit I/O over the entropy-coded segment ----

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit =
      if (nbits > 0) { put(0xff, 8 - nbits) }
  }

  private final class BitReader(bytes: Array[Byte], start: Int) {
    var pos: Int = start
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "truncated entropy-coded segment")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated after 0xFF in entropy data")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"marker 0xFF$m%02x inside entropy-coded segment")
          pos += 1 // consume the stuffed 0x00
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Drop padding bits so `pos` points at the next marker byte. */
    def align(): Unit = { nbits = 0 }
    def decodeSym(t: HuffTable): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | bit()
        if (t.maxCode(l) >= 0 && code >= t.minCode(l) && code <= t.maxCode(l))
          return t.symbolAt(l, code)
        l += 1
      }
      throw new IllegalArgumentException("invalid Huffman code in entropy data")
    }
  }

  // ---- encoder ----

  /** Magnitude category (T.81 F.12): bits needed for |v|; 0 for v == 0. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** One's-complement value bits for a signed coefficient (T.81 F.1.2.1.1):
    * negatives are encoded as v + 2^len − 1.
    */
  private def valueBits(v: Int, len: Int): Int =
    if (v < 0) v + (1 << len) - 1 else v

  private def u16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def marker(out: ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }

  /** Encode quantized coefficients as a baseline grayscale JPEG.
    *
    * @param width    pixels, multiple of 8
    * @param height   pixels, multiple of 8
    * @param quantZig 64 quantization steps in ZIGZAG order, each 1..255
    * @param blocks   one 64-entry ZIGZAG-order quantized-coefficient array
    *                 per 8×8 block, blocks in raster order (left→right,
    *                 top→bottom) — the scan order of a single-component
    *                 baseline JPEG
    */
  def encode(width: Int, height: Int, quantZig: Array[Int], blocks: Array[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "dimensions must be positive multiples of 8")
    require(quantZig.length == 64 && quantZig.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 one-byte steps >= 1")
    val nb = (width / 8) * (height / 8)
    require(blocks.length == nb, s"expected $nb blocks, got ${blocks.length}")
    require(blocks.forall(_.length == 64), "each block must carry 64 coefficients")

    val dcT = new HuffTable(DcBits, DcVals)
    val acT = new HuffTable(AcBits, AcVals)
    val out = new ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    // DQT: Pq=0 (8-bit), Tq=0
    marker(out, 0xdb); u16(out, 2 + 1 + 64); out.write(0x00)
    quantZig.foreach(out.write)
    // SOF0: precision 8, 1 component, H=V=1, quant table 0
    marker(out, 0xc0); u16(out, 2 + 6 + 3)
    out.write(8); u16(out, height); u16(out, width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DHT: DC table 0 then AC table 0, one segment each
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(out, 0xc4); u16(out, 2 + 1 + 16 + vals.length); out.write(tcTh)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0x00, DcBits, DcVals)
    dht(0x10, AcBits, AcVals)
    // SOS: 1 component, DC table 0 / AC table 0, full spectral range
    marker(out, 0xda); u16(out, 2 + 1 + 2 + 3)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0x00)

    val bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { blk =>
      val diff = blk(0) - pred
      pred = blk(0)
      val t = category(diff)
      require(t <= 11 && dcT.has(t), s"DC diff $diff outside table range")
      bw.put(dcT.codeOf(t), dcT.lenOf(t))
      if (t > 0) bw.put(valueBits(diff, t), t)
      var run = 0
      var z = 1
      while (z < 64) {
        val v = blk(z)
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.put(acT.codeOf(0xf0), acT.lenOf(0xf0)); run -= 16 } // ZRL
          val s = category(v)
          require(s <= 10, s"AC coefficient $v outside Annex K size range")
          val sym = (run << 4) | s
          require(acT.has(sym), s"AC symbol $sym absent from table")
          bw.put(acT.codeOf(sym), acT.lenOf(sym))
          bw.put(valueBits(v, s), s)
          run = 0
        }
        z += 1
      }
      if (run > 0) bw.put(acT.codeOf(0x00), acT.lenOf(0x00)) // EOB
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  /** Parse + entropy-decode + dequantize. Returns (width, height,
    * quantZig, dequantized blocks in ZIGZAG order, raster block order).
    * Hostile input fails with a `require` message — never an index error,
    * hang, or OOM. The Huffman tables used are the ones REBUILT from the
    * file's DHT segments.
    */
  def decodeCoeffs(bytes: Array[Byte]): (Int, Int, Array[Int], Array[Array[Int]]) = {
    require(bytes.length >= 4, "truncated JPEG")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing SOI")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0
    var height = 0
    var compQuant = -1
    var sawSof = false

    def u16at(p: Int): Int = {
      require(p + 1 < bytes.length, "truncated JPEG segment")
      ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    }

    var scanDc = -1
    var scanAc = -1
    // marker loop up to and including SOS
    var inScan = false
    while (!inScan) {
      require(pos + 1 < bytes.length, "truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker, got 0x${bytes(pos) & 0xff}%02x")
      val m = bytes(pos + 1) & 0xff
      require(m != 0xff, "fill bytes between segments not supported")
      pos += 2
      m match {
        case 0xdb => // DQT
          val len = u16at(pos); val end = pos + len
          require(len >= 2 && end <= bytes.length, "bad DQT length")
          var p = pos + 2
          while (p < end) {
            val pqTq = bytes(p) & 0xff
            require((pqTq >> 4) == 0, "only 8-bit quant precision supported")
            val tq = pqTq & 0x0f
            require(p + 65 <= end, "truncated DQT table")
            val q = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            require(q.forall(_ >= 1), "quant step 0 is invalid")
            quant(tq) = q
            p += 65
          }
          require(p == end, "DQT length does not match its tables")
          pos = end
        case 0xc0 => // SOF0 baseline
          val len = u16at(pos)
          require(len == 11, "only single-component SOF0 supported")
          require(pos + len <= bytes.length, "truncated SOF0")
          require((bytes(pos + 2) & 0xff) == 8, "only 8-bit precision supported")
          height = u16at(pos + 3); width = u16at(pos + 5)
          require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
            s"bad dimensions ${width}x$height")
          require(width % 8 == 0 && height % 8 == 0,
            "this decoder requires dimensions to be multiples of 8")
          require((bytes(pos + 7) & 0xff) == 1, "only one component supported")
          require((bytes(pos + 9) & 0xff) == 0x11, "only H=V=1 sampling supported")
          compQuant = bytes(pos + 10) & 0xff
          require(compQuant < 4, "bad quant table id")
          sawSof = true
          pos += len
        case sof if sof >= 0xc1 && sof <= 0xcf && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
          throw new IllegalArgumentException(f"unsupported SOF marker 0xff$sof%02x (baseline only)")
        case 0xc4 => // DHT
          val len = u16at(pos); val end = pos + len
          require(len >= 2 && end <= bytes.length, "bad DHT length")
          var p = pos + 2
          while (p < end) {
            val tcTh = bytes(p) & 0xff
            val tc = tcTh >> 4; val th = tcTh & 0x0f
            require(tc <= 1 && th < 4, "bad DHT class/id")
            require(p + 17 <= end, "truncated DHT BITS")
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            require(p + 17 + n <= end, "truncated DHT HUFFVAL")
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + n
          }
          require(p == end, "DHT length does not match its tables")
          pos = end
        case 0xda => // SOS
          val len = u16at(pos)
          require(len == 8, "only single-component SOS supported")
          require(pos + len <= bytes.length, "truncated SOS")
          require(sawSof, "SOS before SOF0")
          require((bytes(pos + 2) & 0xff) == 1, "SOS component count must be 1")
          val tdTa = bytes(pos + 4) & 0xff
          scanDc = tdTa >> 4; scanAc = tdTa & 0x0f
          require(scanDc < 4 && dcTables(scanDc) != null, "SOS references missing DC table")
          require(scanAc < 4 && acTables(scanAc) != null, "SOS references missing AC table")
          require((bytes(pos + 5) & 0xff) == 0 && (bytes(pos + 6) & 0xff) == 63 &&
            (bytes(pos + 7) & 0xff) == 0, "only full-spectrum sequential scan supported")
          pos += len
          inScan = true
        case 0xdd =>
          throw new IllegalArgumentException("restart intervals not supported")
        case app if (app >= 0xe0 && app <= 0xef) || app == 0xfe => // APPn / COM
          val len = u16at(pos)
          require(len >= 2 && pos + len <= bytes.length, "bad APP/COM length")
          pos += len
        case other =>
          throw new IllegalArgumentException(f"unexpected marker 0xff$other%02x")
      }
    }
    require(quant(compQuant) != null, "component references missing quant table")
    val q = quant(compQuant)
    val dcT = dcTables(scanDc)
    val acT = acTables(scanAc)

    val nb = (width / 8) * (height / 8)
    val br = new BitReader(bytes, pos)
    val blocks = new Array[Array[Int]](nb)
    var pred = 0
    var b = 0
    while (b < nb) {
      val blk = new Array[Int](64)
      val t = br.decodeSym(dcT)
      require(t <= 11, s"DC category $t out of range")
      val diff = if (t == 0) 0 else extend(br.bits(t), t)
      pred += diff
      blk(0) = pred * q(0)
      var z = 1
      while (z < 64) {
        val sym = br.decodeSym(acT)
        if (sym == 0x00) z = 64 // EOB
        else if (sym == 0xf0) { // ZRL
          require(z + 16 <= 64, "ZRL overruns the block")
          z += 16
        } else {
          val run = sym >> 4
          val s = sym & 0x0f
          require(s >= 1 && s <= 10, s"AC size $s out of baseline range")
          z += run
          require(z < 64, "AC run overruns the block")
          blk(z) = extend(br.bits(s), s) * q(z)
          z += 1
        }
      }
      blocks(b) = blk
      b += 1
    }
    br.align()
    pos = br.pos
    require(pos + 2 <= bytes.length, "truncated before EOI")
    require((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) == 0xd9,
      "expected EOI after entropy-coded segment")
    require(pos + 2 == bytes.length, "trailing bytes after EOI")
    (width, height, q.clone(), blocks)
  }

  /** T.81 F.12 EXTEND: map `len` magnitude bits back to a signed value. */
  private def extend(v: Int, len: Int): Int =
    if (v < (1 << (len - 1))) v - (1 << len) + 1 else v

  /** Exact fixed-point 8×8 IDCT (see object doc). Input: DEQUANTIZED
    * coefficients in natural order s(v*8+u); output: spatial samples
    * out(y*8+x) BEFORE level shift. Separable two-pass with no interior
    * rounding — bit-identical to the direct double sum.
    */
  def idct8x8(s: Array[Long]): Array[Int] = {
    require(s.length == 64, "IDCT input must be 64 coefficients")
    // pass 1: t(v*8+x) = Σ_u F(u)(x) · S(v,u)   (exact, no rounding)
    val t = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var u = 0
        while (u < 8) { acc += FTable(u * 8 + x).toLong * s(v * 8 + u); u += 1 }
        t(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    // pass 2: out(y*8+x) = (Σ_v F(v)(y) · t(v,x) + 2^21) >> 22
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var vv = 0
        while (vv < 8) { acc += FTable(vv * 8 + y).toLong * t(vv * 8 + x); vv += 1 }
        out(y * 8 + x) = ((acc + (1L << 21)) >> 22).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Full pixel decode: parse → entropy decode → dequantize → zigzag →
    * IDCT → level shift (+128) → clamp. Returns (width, height, row-major
    * pixel array, values 0..255).
    */
  def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, _, blocks) = decodeCoeffs(bytes)
    val wb = w / 8
    val px = new Array[Int](w * h)
    var b = 0
    while (b < blocks.length) {
      val nat = new Array[Long](64)
      var z = 0
      while (z < 64) {
        nat(ZigRow(z) * 8 + ZigCol(z)) = blocks(b)(z).toLong
        z += 1
      }
      val sp = idct8x8(nat)
      val bx = (b % wb) * 8
      val by = (b / wb) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val p = 128 + sp(y * 8 + x)
          px((by + y) * w + bx + x) = if (p < 0) 0 else if (p > 255) 255 else p
          x += 1
        }
        y += 1
      }
      b += 1
    }
    (w, h, px)
  }
}
