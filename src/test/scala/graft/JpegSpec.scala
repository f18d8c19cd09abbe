package graft

import graft.media.{Jpeg, Media}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property coverage for the baseline JPEG codec ([[graft.media.Jpeg]]):
  * the shared-constant pins (FTable vs StrictMath, zigzag vs the algorithmic
  * scan), exact round-trips over random sparse spectra, the closed-form
  * DC-only pixel law the SQL oracle generalizes, IDCT accuracy vs a
  * double-precision reference, and the standard hostile-input bar
  * (truncations, single-byte mutations, unsupported-mode markers).
  */
class JpegSpec extends AnyFunSuite {

  private val fixtureQuant = Array.tabulate(64)(Media.jpegQuant)

  test("FTable matches round(c(v)/2·cos((2x+1)vπ/16)·2^11) under StrictMath") {
    for (v <- 0 until 8; x <- 0 until 8) {
      val c = if (v == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      val b = c / 2.0 * StrictMath.cos((2 * x + 1) * v * StrictMath.PI / 16.0)
      assert(Jpeg.FTable(v * 8 + x) == StrictMath.round(b * 2048.0).toInt,
        s"FTable($v,$x)")
    }
  }

  test("zigzag tables trace the T.81 diagonal scan") {
    var r = 0; var c = 0
    for (z <- 0 until 64) {
      assert(Jpeg.ZigRow(z) == r && Jpeg.ZigCol(z) == c, s"zigzag at $z")
      if ((r + c) % 2 == 0) { // moving up-right
        if (c == 7) r += 1 else if (r == 0) c += 1 else { r -= 1; c += 1 }
      } else {
        if (r == 7) c += 1 else if (c == 0) r += 1 else { r += 1; c -= 1 }
      }
    }
  }

  private def randomCase(seed: Long): (Int, Int, Array[Int], Array[Array[Int]]) = {
    val rnd = new scala.util.Random(seed)
    val wb = 1 + rnd.nextInt(3)
    val hb = 1 + rnd.nextInt(2)
    val quant = Array.fill(64)(1 + rnd.nextInt(255))
    val blocks = Array.fill(wb * hb) {
      val blk = new Array[Int](64)
      blk(0) = rnd.nextInt(601) - 300
      for (z <- 1 until 64 if rnd.nextInt(100) < 15) {
        val m = 1 + rnd.nextInt(1023) // sizes 1..10, the full baseline AC range
        blk(z) = if (rnd.nextBoolean()) m else -m
      }
      blk
    }
    (wb, hb, quant, blocks)
  }

  test("encode → decodeCoeffs round-trips 300 random sparse spectra exactly") {
    var sawStuffing = false
    for (i <- 0 until 300) {
      val (wb, hb, quant, blocks) = randomCase(0x1DC7L + i)
      val bytes = Jpeg.encode(wb * 8, hb * 8, quant, blocks)
      // the entropy segment must eventually produce an 0xFF byte that the
      // writer stuffs — prove the stuffing path is actually exercised
      sawStuffing ||= bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
      val (w, h, dq, out) = Jpeg.decodeCoeffs(bytes)
      assert(w == wb * 8 && h == hb * 8 && out.length == wb * hb)
      assert(java.util.Arrays.equals(dq, quant), s"case $i quant table")
      for (b <- out.indices; z <- 0 until 64)
        assert(out(b)(z) == blocks(b)(z) * quant(z), s"case $i block $b z $z")
    }
    assert(sawStuffing, "no fuzz case produced a stuffed 0xFF00 — widen the corpus")
  }

  test("DC-only blocks decode to the closed-form uniform pixel at every DC level") {
    val quant1 = Array.fill(64)(1)
    for (dc <- -1024 to 1023) {
      val bytes = Jpeg.encode(8, 8, quant1, Array(Array.tabulate(64)(z => if (z == 0) dc else 0)))
      val (w, h, px) = Jpeg.decodePixels(bytes)
      assert(w == 8 && h == 8)
      val raw = 128 + ((724L * 724L * dc + (1L << 21)) >> 22)
      val expect = math.min(255L, math.max(0L, raw)).toInt
      assert(px.forall(_ == expect), s"dc=$dc expected uniform $expect, got ${px.toSeq.distinct}")
    }
  }

  // NB: this is an accuracy CHARACTERIZATION, not the correctness contract —
  // the contract is bit-exactness against the SQL oracle's identical integer
  // expression (media_jpeg_decode). The 2^11 basis accumulates up to ~1.04
  // absolute error on worst-case ±1024 full-density spectra (IEEE-1180-style
  // inputs are milder); 1.5 here pins gross scaling/transpose errors while
  // leaving the designed quantization alone.
  test("fixed-point IDCT stays within 1.5 of the double-precision reference") {
    val rnd = new scala.util.Random(0xD0C7L)
    for (_ <- 0 until 200) {
      val s = Array.fill(64)((rnd.nextInt(2049) - 1024).toLong)
      val fixed = Jpeg.idct8x8(s)
      for (y <- 0 until 8; x <- 0 until 8) {
        var acc = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
          val cv = if (v == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
          acc += cu * cv / 4.0 * s(v * 8 + u) *
            StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) *
            StrictMath.cos((2 * y + 1) * v * StrictMath.PI / 16.0)
        }
        assert(math.abs(fixed(y * 8 + x) - acc) <= 1.5,
          s"IDCT drift at ($x,$y): fixed ${fixed(y * 8 + x)} vs $acc")
      }
    }
  }

  private def cleanly[A](what: String, bytes: Array[Byte])(dec: Array[Byte] => A): Option[A] =
    try Some(dec(bytes))
    catch {
      case _: IllegalArgumentException => None
      case e: Throwable =>
        fail(s"$what escaped with ${e.getClass.getName}: ${e.getMessage}")
    }

  test("every truncation of a valid file rejects cleanly") {
    val (wb, hb, quant, blocks) = randomCase(0x7214L)
    val valid = Jpeg.encode(wb * 8, hb * 8, quant, blocks)
    for (len <- 0 until valid.length) {
      val r = cleanly(s"truncation to $len", valid.take(len))(Jpeg.decodeCoeffs)
      assert(r.isEmpty, s"accepted a $len-byte truncation of ${valid.length} bytes")
    }
  }

  test("1200 single-byte mutations reject cleanly or decode") {
    for (i <- 0 until 1200) {
      val (wb, hb, quant, blocks) = randomCase(0xA5A5L + i % 40)
      val valid = Jpeg.encode(wb * 8, hb * 8, quant, blocks)
      val rnd = new scala.util.Random(0xF11BL + i)
      val mutated = valid.clone()
      val pos = rnd.nextInt(mutated.length)
      mutated(pos) = (mutated(pos) ^ (1 + rnd.nextInt(255))).toByte
      cleanly(s"mutation at $pos", mutated)(Jpeg.decodeCoeffs) // must not escape dirty
    }
  }

  test("unsupported modes reject with clear messages; APP0/COM segments are skipped") {
    val (wb, hb, quant, blocks) = randomCase(0x0F0FL)
    val valid = Jpeg.encode(wb * 8, hb * 8, quant, blocks)
    val baseline = Jpeg.decodeCoeffs(valid)

    // SOF0 → SOF2 (progressive): find the FFC0 marker and rewrite it
    val sofAt = valid.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    val progressive = valid.clone(); progressive(sofAt + 1) = 0xc2.toByte
    val ex1 = intercept[IllegalArgumentException](Jpeg.decodeCoeffs(progressive))
    assert(ex1.getMessage.contains("baseline only"), ex1.getMessage)

    // inject a DRI segment before SOF: restart intervals must be refused
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x08).map(_.toByte)
    val withDri = valid.take(2) ++ dri ++ valid.drop(2)
    val ex2 = intercept[IllegalArgumentException](Jpeg.decodeCoeffs(withDri))
    assert(ex2.getMessage.contains("restart intervals"), ex2.getMessage)

    // a JFIF-ish APP0 and a COM segment must be transparently skipped
    val app0 = Array(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0).map(_.toInt.toByte)
    val com = Array(0xff, 0xfe, 0x00, 0x07, 'g', 'r', 'a', 'f', 't').map(_.toInt.toByte)
    val withApp = valid.take(2) ++ app0 ++ com ++ valid.drop(2)
    val (w2, h2, q2, out2) = Jpeg.decodeCoeffs(withApp)
    assert(w2 == baseline._1 && h2 == baseline._2)
    assert(java.util.Arrays.equals(q2, baseline._3))
    assert(out2.indices.forall(b => java.util.Arrays.equals(out2(b), baseline._4(b))))
  }

  test("the DHT carried in the file is what decodes the scan") {
    // strip one bit of one DHT BITS entry so the canonical code assignment
    // shifts: the scan must now either reject or decode differently —
    // proving the decoder rebuilds tables from the file instead of
    // assuming Annex K
    val (wb, hb, quant, blocks) = randomCase(0xD117L)
    val valid = Jpeg.encode(wb * 8, hb * 8, quant, blocks)
    val dhtAt = valid.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc4)
    // BITS starts 5 bytes after the FF C4 (len hi, len lo, TcTh); Annex K DC
    // BITS[1] (length-2 count) lives at offset +6 and is 1 — zero it and
    // extend length-3 by one so the symbol count still matches
    val tampered = valid.clone()
    val bitsOff = dhtAt + 5
    assert((tampered(bitsOff + 1) & 0xff) == 1, "fixture assumption: Annex K DC BITS")
    tampered(bitsOff + 1) = 0
    tampered(bitsOff + 2) = (tampered(bitsOff + 2) + 1).toByte
    cleanly("tampered DHT", tampered)(Jpeg.decodeCoeffs) match {
      case None => () // clean reject is acceptable
      case Some((_, _, _, out)) =>
        val same = out.indices.forall(b => java.util.Arrays.equals(out(b), Jpeg.decodeCoeffs(valid)._4(b)))
        assert(!same, "decode ignored the file's DHT — table rebuild is dead code")
    }
  }
}
