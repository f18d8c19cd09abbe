package graft

import graft.media.{Media, MediaRecord}
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
}
