package graft

import graft.media.{Bmp, Gif, Media, Png, Ppm, Wav, Y4m}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-level fuzzing of the hand-rolled codecs — the standard bar for
  * hand-written parsers (the existing corruption tests are hand-picked
  * cases; these sweep ≥1000 mutated inputs per codec).
  *
  * The contract under fuzz: a decoder confronted with mutated, truncated,
  * or random bytes must either return a decode or reject with the codec's
  * clean `IllegalArgumentException` — NEVER escape with an index error,
  * negative-size allocation, zip exception, or OOM. For PNG specifically
  * the contract is stronger: every chunk is CRC-verified, so a mutated
  * payload must never SILENTLY decode to different pixels — any accepted
  * decode must equal the original.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  /** Clean-reject-or-success harness: returns Some(result) on success,
    * None on IllegalArgumentException; fails the test on anything else.
    */
  private def cleanly[A](what: String, bytes: Array[Byte])(dec: Array[Byte] => A): Option[A] =
    try Some(dec(bytes))
    catch {
      case _: IllegalArgumentException => None
      case e: Throwable =>
        fail(s"$what escaped with ${e.getClass.getName}: ${e.getMessage} " +
          s"(first bytes: ${bytes.take(24).map(b => f"${b & 0xff}%02x").mkString(" ")})")
    }

  private val genImage: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 10)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    (w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
  }

  private val genAudio: Gen[(Int, Array[Short])] = for {
    n <- Gen.choose(1, 400)
    rate <- Gen.oneOf(8000, 16000, 44100)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    (rate, Array.fill(n)((rnd.nextInt(65536) - 32768).toShort))
  }

  /** One deterministic single-byte mutation of `valid` (position and new
    * value from the seed; the new value always differs from the old).
    */
  private def mutate(valid: Array[Byte], seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val pos = rnd.nextInt(valid.length)
    val out = valid.clone()
    out(pos) = (out(pos) ^ (1 + rnd.nextInt(255))).toByte
    out
  }

  private def imageCodecs: Seq[(String, (Int, Int, Array[Byte]) => Array[Byte], Array[Byte] => (Int, Int, Array[Byte]))] =
    Seq(("BMP", Bmp.encode, Bmp.decode),
        ("PPM", Ppm.encode, Ppm.decode),
        ("PNG", Png.encode, Png.decode),
        // fuzz images are ≤120 pixels, so GIF's exact-palette encode
        // (≤256 distinct colors) is always applicable and lossless
        ("GIF", Gif.encode, Gif.decode))

  test("image codecs: 1000+ single-byte mutations each reject cleanly or decode") {
    for ((name, enc, dec) <- imageCodecs) {
      var silentDiffs = 0
      for (i <- 0 until 1100) {
        val (w, h, rgb) = sample(genImage, 0xC0DEC000L + i)
        val valid = enc(w, h, rgb)
        val mutated = mutate(valid, 0xFEED0000L + i)
        cleanly(s"$name decode of mutated input #$i", mutated)(dec).foreach {
          case (dw, dh, drgb) =>
            if (!(dw == w && dh == h && java.util.Arrays.equals(drgb, rgb))) silentDiffs += 1
        }
      }
      // PNG's CRC must catch EVERY accepted-but-different decode; the
      // uncompressed containers legitimately decode body flips to
      // different pixels (no checksum to notice), which is fine — the
      // contract there is only "no escape".
      if (name == "PNG")
        assert(silentDiffs == 0, s"PNG silently mis-decoded $silentDiffs mutated inputs")
    }
  }

  test("image codecs: every strict truncation rejects cleanly (never succeeds)") {
    for ((name, enc, dec) <- imageCodecs) {
      for (i <- 0 until 40) {
        val (w, h, rgb) = sample(genImage, 0x7A7A000L + i)
        val valid = enc(w, h, rgb)
        // every strict prefix: the encodes are exact-size, so a shorter
        // input can never carry the full pixel payload
        for (len <- 0 until valid.length) {
          val r = cleanly(s"$name decode of $len-byte truncation", java.util.Arrays.copyOf(valid, len))(dec)
          assert(r.isEmpty, s"$name accepted a $len-byte truncation of a ${valid.length}-byte image")
        }
      }
    }
  }

  test("image codecs: random garbage bytes reject cleanly") {
    for ((name, _, dec) <- imageCodecs; i <- 0 until 400) {
      val rnd = new scala.util.Random(0xBAD00000L + i)
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      cleanly(s"$name decode of garbage #$i", junk)(dec): Unit
    }
  }

  test("WAV: 1000+ single-byte mutations reject cleanly or decode; truncations reject") {
    for (i <- 0 until 1100) {
      val (rate, samples) = sample(genAudio, 0xA0D10000L + i)
      val valid = Wav.encode(rate, samples)
      cleanly(s"WAV decode of mutated input #$i", mutate(valid, 0xF00D0000L + i))(Wav.decode): Unit
    }
    for (i <- 0 until 20) {
      val (rate, samples) = sample(genAudio, 0x77AF000L + i)
      val valid = Wav.encode(rate, samples)
      for (len <- 0 until valid.length) {
        val r = cleanly(s"WAV decode of $len-byte truncation", java.util.Arrays.copyOf(valid, len))(Wav.decode)
        assert(r.isEmpty, s"WAV accepted a $len-byte truncation of a ${valid.length}-byte file")
      }
    }
  }

  test("PNG: random round-trip across all five filter types and random dims") {
    for (i <- 0 until 200) {
      val (w, h, rgb) = sample(genImage, 0x9A97000L + i)
      val (dw, dh, drgb) = Png.decode(Png.encode(w, h, rgb))
      assert(dw == w && dh == h && java.util.Arrays.equals(drgb, rgb),
        s"PNG round-trip drifted at ${w}x$h")
    }
    // heights ≥ 5 guarantee every filter type 0..4 is exercised per image;
    // also cover the single-pixel and single-column degenerate shapes
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (3, 5), (16, 5))) {
      val rgb = Array.tabulate(w * h * 3)(k => ((k * 37 + 11) % 256).toByte)
      val (dw, dh, drgb) = Png.decode(Png.encode(w, h, rgb))
      assert(dw == w && dh == h && java.util.Arrays.equals(drgb, rgb))
    }
  }

  test("PNG rejects: bad signature, bad CRC, truncated IDAT, filter type 5, dup IHDR") {
    val valid = Png.encode(4, 5, Array.tabulate(60)(k => (k * 7).toByte))
    def expectReject(label: String, bytes: Array[Byte]): Unit =
      assert(cleanly(label, bytes)(Png.decode).isEmpty, s"$label was accepted")
    expectReject("flipped signature", { val b = valid.clone(); b(0) = 0x88.toByte; b })
    expectReject("flipped IHDR byte (CRC catch)", { val b = valid.clone(); b(16) = (b(16) ^ 1).toByte; b })
    expectReject("flipped IDAT byte (CRC catch)", { val b = valid.clone(); b(45) = (b(45) ^ 1).toByte; b })
    expectReject("IEND missing", java.util.Arrays.copyOf(valid, valid.length - 12))
    // a stream that inflates SHORT of width*height rows: encode 4x5 but
    // claim 4x6 in a re-CRC'd IHDR
    val claimTaller = valid.clone()
    val hbuf = java.nio.ByteBuffer.wrap(claimTaller, 8 + 8 + 4, 4)
    hbuf.putInt(6)
    val crc = new java.util.zip.CRC32
    crc.update(claimTaller, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(claimTaller, 12 + 4 + 13, 4).putInt(crc.getValue.toInt)
    expectReject("IHDR claims more rows than IDAT holds", claimTaller)
  }

  test("GIF: LZW code-width growth and dictionary reset round-trip exactly") {
    // images big enough to push the dictionary past each width switch-over
    // (512, 1024, 2048, 4096 entries) and through at least one CLEAR-reset:
    // 160x160 = 25600 pixels of seeded 256-color noise adds an entry on
    // nearly every step, overflowing 4096 several times
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(0x61F0000L + seed)
      val palette = Array.tabulate(256 * 3)(k => ((k * 89 + seed * 31) % 256).toByte)
      val (w, h) = (160, 160)
      val rgb = new Array[Byte](w * h * 3)
      for (p <- 0 until w * h) {
        val c = rnd.nextInt(256)
        rgb(3 * p) = palette(3 * c); rgb(3 * p + 1) = palette(3 * c + 1); rgb(3 * p + 2) = palette(3 * c + 2)
      }
      val encoded = Gif.encode(w, h, rgb)
      // the payload must be large enough to have crossed 4096 entries
      assert(encoded.length > 4096, s"fixture too small to exercise the reset (${encoded.length} bytes)")
      val (dw, dh, drgb) = Gif.decode(encoded)
      assert(dw == w && dh == h && java.util.Arrays.equals(drgb, rgb),
        s"GIF round-trip drifted across dictionary resets (seed $seed)")
    }
    // and the KwKwK-heavy degenerate case: a long single-color run
    val flat = Array.fill(300 * 3)(42.toByte)
    val (fw, fh, frgb) = Gif.decode(Gif.encode(300, 1, flat))
    assert(fw == 300 && fh == 1 && java.util.Arrays.equals(frgb, flat))
  }

  test("GIF rejects a tiny hostile file claiming huge dimensions BEFORE allocating") {
    // same PNG lesson, LZW flavor: forge the logical-screen + frame dims
    // of a tiny valid file upward; the LZW-payload expansion bound must
    // reject before the pixel allocation
    val valid = Gif.encode(4, 5, Array.tabulate(60)(k => (k * 7).toByte))
    val hostile = valid.clone()
    def putU16(off: Int, v: Int): Unit = { hostile(off) = (v & 0xff).toByte; hostile(off + 1) = ((v >> 8) & 0xff).toByte }
    putU16(6, 4000); putU16(8, 4000) // logical screen 4000x4000 (16M px)
    // frame dims sit in the image descriptor after the 6+7 header+LSD and
    // the global color table; find the 0x2C separator to locate them
    val sep = hostile.indexOf(0x2c.toByte)
    putU16(sep + 5, 4000); putU16(sep + 7, 4000)
    val ex = intercept[IllegalArgumentException](Gif.decode(hostile))
    assert(ex.getMessage.contains("LZW payload too small"),
      s"hostile dims must hit the pre-allocation bound, got: ${ex.getMessage}")
  }

  test("PNG rejects a tiny hostile file claiming huge dimensions BEFORE allocating") {
    // compressed formats can lie about dimensions cheaply: a ~100-byte file
    // with a valid-CRC IHDR claiming 26000x26000 (rawLen ~2.03 GB, still
    // under the Int.MaxValue check) must be rejected by the DEFLATE-ratio
    // bound against the IDAT size, not after a 2 GB allocation
    val valid = Png.encode(4, 5, Array.tabulate(60)(k => (k * 7).toByte))
    val hostile = valid.clone()
    java.nio.ByteBuffer.wrap(hostile, 8 + 8, 8).putInt(26000).putInt(26000): Unit
    val crc = new java.util.zip.CRC32
    crc.update(hostile, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(hostile, 12 + 4 + 13, 4).putInt(crc.getValue.toInt): Unit
    val ex = intercept[IllegalArgumentException](Png.decode(hostile))
    assert(ex.getMessage.contains("IDAT too small"),
      s"hostile dims must hit the pre-allocation bound, got: ${ex.getMessage}")
  }

  private val genVideo: Gen[(Int, Int, Seq[Y4m.Frame])] = for {
    w <- Gen.choose(1, 10)
    h <- Gen.choose(1, 8)
    n <- Gen.choose(1, 6)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    def plane() = Array.fill(w * h)(rnd.nextInt(256).toByte)
    (w, h, Seq.fill(n)(Y4m.Frame(plane(), plane(), plane())))
  }

  test("Y4M: random round-trip preserves every plane of every frame") {
    for (i <- 0 until 200) {
      val (w, h, frames) = sample(genVideo, 0x74D0000L + i)
      val (dw, dh, back) = Y4m.decode(Y4m.encode(w, h, frames))
      assert(dw == w && dh == h && back.size == frames.size)
      frames.zip(back).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a.y, b.y) && java.util.Arrays.equals(a.u, b.u)
          && java.util.Arrays.equals(a.v, b.v), s"Y4M round-trip drifted at ${w}x$h")
      }
    }
  }

  test("Y4M: 1000+ single-byte mutations reject cleanly or decode") {
    for (i <- 0 until 1100) {
      val (w, h, frames) = sample(genVideo, 0x74D1000L + i)
      val valid = Y4m.encode(w, h, frames)
      cleanly(s"Y4M decode of mutated input #$i", mutate(valid, 0x74D2000L + i))(Y4m.decode): Unit
    }
  }

  test("Y4M: truncations accepted ONLY at exact frame boundaries, as a frame prefix") {
    // unlike the image codecs, Y4M declares no frame count — a stream cut
    // exactly after a complete frame IS a valid shorter video (that is how
    // the format streams). The contract under truncation: mid-frame and
    // mid-header cuts reject cleanly; boundary cuts decode to a prefix.
    for (i <- 0 until 20) {
      val (w, h, frames) = sample(genVideo, 0x74D3000L + i)
      val valid = Y4m.encode(w, h, frames)
      val headerLen = valid.indexOf('\n'.toByte) + 1
      val frameLen = "FRAME\n".length + 3 * w * h
      for (len <- 0 until valid.length) {
        cleanly(s"Y4M decode of $len-byte truncation", java.util.Arrays.copyOf(valid, len))(Y4m.decode) match {
          case Some((dw, dh, back)) =>
            assert(len >= headerLen && (len - headerLen) % frameLen == 0,
              s"Y4M accepted a mid-frame truncation at $len of ${valid.length}")
            assert(dw == w && dh == h && back.size == (len - headerLen) / frameLen)
            back.zip(frames).foreach { case (b, a) =>
              assert(java.util.Arrays.equals(b.y, a.y) && java.util.Arrays.equals(b.u, a.u)
                && java.util.Arrays.equals(b.v, a.v))
            }
          case None => // clean reject — always fine
        }
      }
    }
  }

  test("Y4M: random garbage bytes reject cleanly") {
    for (i <- 0 until 400) {
      val rnd = new scala.util.Random(0x74D4000L + i)
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      cleanly(s"Y4M decode of garbage #$i", junk)(Y4m.decode): Unit
    }
  }

  test("Y4M rejects a tiny hostile header claiming huge dimensions BEFORE allocating") {
    // the frame-size bound must fire on the header alone — before any
    // FRAME walk or plane allocation
    val hostile = "YUV4MPEG2 W1000000 H1000000 F25:1 C444\nFRAME\n".getBytes("US-ASCII")
    val ex = intercept[IllegalArgumentException](Y4m.decode(hostile))
    assert(ex.getMessage.contains("frame size exceeds bound"),
      s"hostile dims must hit the pre-allocation bound, got: ${ex.getMessage}")
  }

  test("Y4M rejects non-C444 colorspaces, including the implicit spec default") {
    val frames = Seq(Y4m.Frame(Array.fill(4)(1.toByte), Array.fill(4)(2.toByte), Array.fill(4)(3.toByte)))
    val valid = Y4m.encode(2, 2, frames)
    // C420: different plane sizes — must reject, not mis-slice
    val c420 = new String(valid, "ISO-8859-1").replace("C444", "C420").getBytes("ISO-8859-1")
    assert(cleanly("Y4M C420", c420)(Y4m.decode).isEmpty)
    // ABSENT C tag: the spec default is 4:2:0, so accepting it as C444
    // would silently mis-slice planes — it must reject
    val noC = new String(valid, "ISO-8859-1").replace(" C444", "").getBytes("ISO-8859-1")
    assert(cleanly("Y4M absent C tag", noC)(Y4m.decode).isEmpty)
    // unknown X metadata tag must be tolerated (spec-conformant streams carry them)
    val withX = new String(valid, "ISO-8859-1").replace("C444", "C444 XYSCSS=444").getBytes("ISO-8859-1")
    assert(cleanly("Y4M with X tag", withX)(Y4m.decode).isDefined)
    // the malformed doubled tag CC444 must reject (a '== "C444"' check on
    // the 'C'-stripped value would accept exactly this and nothing else)
    val cc444 = new String(valid, "ISO-8859-1").replace("C444", "CC444").getBytes("ISO-8859-1")
    assert(cleanly("Y4M CC444", cc444)(Y4m.decode).isEmpty)
    // magic must sit at byte 0: a leading space is a malformed stream,
    // not whitespace to tolerate
    val padded = (" " + new String(valid, "ISO-8859-1")).getBytes("ISO-8859-1")
    assert(cleanly("Y4M leading space", padded)(Y4m.decode).isEmpty)
  }

  test("Y4M encode bounds width*height with Long math before plane checks") {
    // 65536 x 65536 wraps the Int product to 0 — empty planes would pass
    // a wrapped-length check and emit an undecodable stream
    val ex = intercept[IllegalArgumentException](
      Y4m.encode(65536, 65536, Seq(Y4m.Frame(Array.empty, Array.empty, Array.empty))))
    assert(ex.getMessage.contains("frame size exceeds bound"),
      s"encode must bound dims before validating planes, got: ${ex.getMessage}")
  }

  test("codec fixture matches across all four image codecs exactly (four-way)") {
    for (id <- 0L until 50L) {
      val (w, h) = Media.bmpDims(id)
      val rgb = Array.tabulate(w * h * 3)(k => Media.bmpPixelByte(id, k))
      val viaBmp = Bmp.decode(Bmp.encode(w, h, rgb))._3
      val viaPpm = Ppm.decode(Ppm.encode(w, h, rgb))._3
      val viaPng = Png.decode(Png.encode(w, h, rgb))._3
      val viaGif = Gif.decode(Gif.encode(w, h, rgb))._3
      assert(java.util.Arrays.equals(viaBmp, viaPng) && java.util.Arrays.equals(viaPpm, viaPng)
        && java.util.Arrays.equals(viaGif, viaPng))
    }
  }
}
