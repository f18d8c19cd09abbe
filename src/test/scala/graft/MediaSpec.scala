package graft

import graft.media.{Media, MediaRecord, Wav}
import org.apache.spark.sql.functions._

class MediaSpec extends SparkTestBase {

  test("media table schema: opaque binary payload + typed metadata") {
    val m = Media.mediaTable(Tables.documents(spark, sf))
    val types = m.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(types("payload") == "BINARY")
    assert(types("media_type") == "STRING")
    assert(types("width") == "INT" && types("height") == "INT" && types("n_frames") == "INT")
  }

  test("decode stub is deterministic and matches hand arithmetic") {
    val rec = MediaRecord(7L, "image", 64, 64, 3, "abc".getBytes("UTF-8"))
    val f = Media.decodeStub(rec)
    assert(f.n_bytes == 3L)
    assert(f.mean_byte == (97 + 98 + 99) / 3.0)
    assert(f.first_byte == 97)
    assert(f.frame_count == 3)
    // empty payload doesn't divide by zero
    val e = Media.decodeStub(rec.copy(payload = Array.emptyByteArray))
    assert(e.mean_byte == 0.0 && e.first_byte == -1)
  }

  test("typed mapPartitions decode runs distributed and covers every row") {
    val docs = Tables.documents(spark, sf)
    val feats = Media.decodedFeatures(spark, docs)
    assert(feats.count() == docs.count())
    assert(feats.filter(f => f.n_bytes <= 0).count() == 0)
  }

  test("resize halves dimensions to fit and subsamples payload by the same factor") {
    val rec = MediaRecord(1L, "image", 256, 128, 1, Array.tabulate(64)(_.toByte))
    val out = Media.resizeStub(rec, maxDim = 64)
    assert(out.width == 64 && out.height == 32)
    assert(out.payload.length == 16)
    assert(out.payload.toSeq == Seq.tabulate(16)(i => (i * 4).toByte))
    // already-fitting records pass through untouched
    val same = Media.resizeStub(rec.copy(width = 32, height = 32), maxDim = 64)
    assert(same.payload eq rec.payload)
    // distributed path covers every row
    val ds = Media.resizeAll(
      Media.mediaTable(Tables.documents(spark, sf)).as[MediaRecord](
        org.apache.spark.sql.Encoders.product[MediaRecord]), maxDim = 128)
    assert(ds.filter(r => r.width > 128 || r.height > 128).count() == 0)
  }

  test("frame hashing: n_frames hashes, sampling takes odd positions") {
    val m = Media.mediaTable(Tables.documents(spark, sf))
      .withColumn("fh", Media.frameHashes(col("payload"), col("n_frames")))
      .select(col("n_frames"), size(col("fh")).as("n"),
              size(Media.sampleFrames(col("fh"))).as("ns"))
    assert(m.where(col("n") =!= col("n_frames")).count() == 0)
    assert(m.where(col("ns") =!= ceil(col("n") / 2.0).cast("int")).count() == 0)
  }

  test("BMP codec round-trips pixels exactly, including padded strides") {
    import graft.media.Bmp
    // width 5 => stride 16 (1 pad byte), width 7 => stride 24 (3 pad bytes)
    for ((w, h) <- Seq((5, 3), (7, 4), (4, 2), (8, 6), (1, 1))) {
      val rgb = Array.tabulate(w * h * 3)(k => ((k * 37 + 11) % 256).toByte)
      val encoded = Bmp.encode(w, h, rgb)
      assert(encoded(0) == 'B'.toByte && encoded(1) == 'M'.toByte)
      val stride = (w * 3 + 3) & ~3
      assert(encoded.length == 54 + stride * h, "file size = headers + padded rows")
      val (dw, dh, decoded) = Bmp.decode(encoded)
      assert(dw == w && dh == h)
      assert(decoded.toSeq == rgb.toSeq, s"round-trip at ${w}x${h}")
    }
  }

  test("BMP decoder rejects malformed input instead of mis-parsing") {
    import graft.media.Bmp
    val good = Bmp.encode(4, 2, Array.fill(24)(1.toByte))
    intercept[IllegalArgumentException](Bmp.decode(good.take(10)))           // truncated header
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Bmp.decode(badMagic))
    val badDepth = good.clone(); badDepth(28) = 8.toByte                     // 8-bit palette BMP
    intercept[IllegalArgumentException](Bmp.decode(badDepth))
    intercept[IllegalArgumentException](Bmp.decode(good.dropRight(4)))       // truncated pixels
  }

  test("bmpRoundTrip features derive from decoded bytes and match the formulas") {
    import spark.implicits._
    val ids = spark.createDataset(Seq(0L, 1L, 2L, 3L, 4L).map(java.lang.Long.valueOf))
    val rows = Media.bmpRoundTrip(ids).collect().map(f => f.doc_id -> f).toMap
    for (id <- 0L to 4L) {
      val (w, h) = Media.bmpDims(id)
      assert(rows(id).width == w && rows(id).height == h)
      assert(rows(id).n_pixels == w.toLong * h)
      assert(rows(id).pixels_md5.matches("[0-9a-f]{32}"))
    }
    // distinct ids yield distinct pixel hashes (the formula varies by id)
    assert(rows.values.map(_.pixels_md5).toSet.size == 5)
  }

  test("BMP codec round-trips 50 random images (seeded)") {
    import graft.media.Bmp
    val rnd = new scala.util.Random(29)
    (1 to 50).foreach { _ =>
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(9)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val (dw, dh, decoded) = Bmp.decode(Bmp.encode(w, h, rgb))
      assert(dw == w && dh == h && decoded.toSeq == rgb.toSeq, s"round-trip failed at ${w}x$h")
    }
  }

  test("BMP decoder rejects corrupt dimension headers cleanly (no overflow)") {
    import graft.media.Bmp
    val good = Bmp.encode(4, 2, Array.fill(24)(1.toByte))
    def withInt(off: Int, v: Int): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(off, v)
      b
    }
    // huge width × height used to overflow stride*height in Int, letting the
    // truncation check pass and the decode throw Negative/OOB instead of a
    // clean reject — all of these must now fail the require, not crash
    intercept[IllegalArgumentException](Bmp.decode(withInt(18, Int.MaxValue))) // huge width
    intercept[IllegalArgumentException](Bmp.decode(withInt(18, -4)))           // negative width
    intercept[IllegalArgumentException](Bmp.decode(withInt(22, Int.MinValue))) // |height| overflow
    intercept[IllegalArgumentException](Bmp.decode(withInt(18, 0)))            // zero width
    intercept[IllegalArgumentException](Bmp.decode(withInt(10, good.length + 1))) // offset past EOF
  }

  test("boxHalve is the exact floor-mean of each 2x2 block, odd edges dropped") {
    // 5x3 input: out dims 2x1; verify every output sample by hand arithmetic
    val w = 5; val h = 3
    val rgb = Array.tabulate(w * h * 3)(k => ((k * 53 + 7) % 256).toByte)
    val (ow, oh, out) = Media.boxHalve(w, h, rgb)
    assert(ow == 2 && oh == 1 && out.length == ow * oh * 3)
    for (x <- 0 until ow; c <- 0 until 3) {
      val expect = ((rgb((2 * x) * 3 + c) & 0xff) + (rgb((2 * x + 1) * 3 + c) & 0xff) +
        (rgb((w + 2 * x) * 3 + c) & 0xff) + (rgb((w + 2 * x + 1) * 3 + c) & 0xff)) / 4
      assert((out(x * 3 + c) & 0xff) == expect, s"sample x=$x c=$c")
    }
  }

  test("bmpResize decodes, halves real pixels to fit, and re-encodes") {
    import graft.media.Bmp
    val (w, h) = (16, 10)
    val rgb = Array.tabulate(w * h * 3)(k => ((k * 31 + 5) % 256).toByte)
    val rec = MediaRecord(1L, "image", w, h, 1, Bmp.encode(w, h, rgb))
    val out = Media.bmpResize(rec, maxDim = 8)
    val (dw, dh, decoded) = Bmp.decode(out.payload)
    assert(dw == 8 && dh == 5 && out.width == 8 && out.height == 5)
    val (ew, eh, expected) = Media.boxHalve(w, h, rgb)
    assert(ew == dw && eh == dh && decoded.toSeq == expected.toSeq)
  }

  test("PPM codec round-trips pixels exactly and parses header whitespace/comments") {
    import graft.media.Ppm
    for ((w, h) <- Seq((5, 3), (1, 1), (8, 6))) {
      val rgb = Array.tabulate(w * h * 3)(k => ((k * 41 + 3) % 256).toByte)
      val (dw, dh, decoded) = Ppm.decode(Ppm.encode(w, h, rgb))
      assert(dw == w && dh == h && decoded.toSeq == rgb.toSeq, s"round-trip at ${w}x$h")
    }
    // a spec-legal header with comments and mixed whitespace parses the same
    val rgb = Array.tabulate(2 * 2 * 3)(k => (k * 9).toByte)
    val wild = ("P6 # magic\n# a comment line\n 2\t2 # dims\n255\n").getBytes("US-ASCII") ++ rgb
    val (dw, dh, decoded) = Ppm.decode(wild)
    assert(dw == 2 && dh == 2 && decoded.toSeq == rgb.toSeq)
  }

  test("PPM decoder rejects malformed input instead of mis-parsing") {
    import graft.media.Ppm
    val good = Ppm.encode(4, 2, Array.fill(24)(1.toByte))
    val badMagic = good.clone(); badMagic(1) = '5'.toByte // P5 = grayscale
    intercept[IllegalArgumentException](Ppm.decode(badMagic))
    intercept[IllegalArgumentException](Ppm.decode(good.dropRight(3)))  // truncated pixels
    intercept[IllegalArgumentException](Ppm.decode("P6\n4 2\n65535\n".getBytes("US-ASCII") ++
      Array.fill(48)(1.toByte)))                                        // 2-byte maxval
    intercept[IllegalArgumentException](Ppm.decode("P6\n4 x\n255\n".getBytes("US-ASCII")))
  }

  test("BMP and PPM decode the same fixture to identical features (cross-codec)") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 9L).map(java.lang.Long.valueOf))
    val viaBmp = Media.bmpRoundTrip(ids).collect().map(f => f.doc_id -> f).toMap
    val viaPpm = Media.ppmRoundTrip(ids).collect().map(f => f.doc_id -> f).toMap
    for (id <- 0L to 9L)
      assert(viaBmp(id) == viaPpm(id), s"codec disagreement at doc $id")
  }

  test("WAV codec round-trips samples exactly, including extremes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(500)
      val samples = Array.tabulate(n)(_ => rnd.nextInt(65536).toShort)
      samples(0) = Short.MinValue
      if (n > 1) samples(n - 1) = Short.MaxValue
      val (rate, back) = Wav.decode(Wav.encode(8000, samples))
      assert(rate == 8000 && back.sameElements(samples))
    }
  }

  test("WAV decoder walks unknown chunks and word-aligned padding") {
    // hand-build: RIFF [ fmt ][ JUNK (odd size -> pad byte) ][ data ]
    val samples = Array.tabulate(7)(i => (i * 100 - 300).toShort)
    val canonical = Wav.encode(8000, samples)
    val fmtChunk = canonical.slice(12, 12 + 8 + 16)
    val dataChunk = canonical.slice(12 + 8 + 16, canonical.length)
    val junkBody = Array[Byte](1, 2, 3) // odd size: needs a pad byte
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ junkBody ++ Array[Byte](0)
    val payload = fmtChunk ++ junk ++ dataChunk
    val riffSize = 4 + payload.length
    val withJunk = "RIFF".getBytes("US-ASCII") ++
      Array[Byte]((riffSize & 0xff).toByte, ((riffSize >> 8) & 0xff).toByte,
                  ((riffSize >> 16) & 0xff).toByte, ((riffSize >> 24) & 0xff).toByte) ++
      "WAVE".getBytes("US-ASCII") ++ payload
    val (rate, back) = Wav.decode(withJunk)
    assert(rate == 8000 && back.sameElements(samples))
  }

  test("WAV decoder rejects corrupt input instead of mis-parsing") {
    val good = Wav.encode(8000, Array.tabulate(10)(_.toShort))
    intercept[IllegalArgumentException](Wav.decode(good.dropRight(5)))      // truncated data
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes("US-ASCII") ++ good.drop(4)))
    intercept[IllegalArgumentException] {                                   // stereo rejected
      val bad = good.clone(); bad(22) = 2; Wav.decode(bad)
    }
    intercept[IllegalArgumentException] {                                   // 8-bit rejected
      val bad = good.clone(); bad(34) = 8; Wav.decode(bad)
    }
    intercept[IllegalArgumentException](Wav.decode(good.take(30)))          // short header
  }

  test("wavRoundTrip features match the generating formulas independently") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 9L).map(java.lang.Long.valueOf))
    val out = Media.wavRoundTrip(ids).collect().map(f => f.doc_id -> f).toMap
    for (id <- 0L to 9L) {
      val n = 200 + (id % 200).toInt
      val k = id % 7 + 3
      val samples = (0 until n).map(i => ((i * k) % 2048 - 1024).toLong)
      val f = out(id)
      assert(f.sample_rate == 8000 && f.n_samples == n.toLong)
      assert(f.duration_ms == n.toLong * 1000 / 8000)
      assert(f.sum_sq == samples.map(s => s * s).sum, s"sum_sq doc $id")
      assert(f.peak_abs == samples.map(math.abs).max, s"peak doc $id")
    }
  }
}
