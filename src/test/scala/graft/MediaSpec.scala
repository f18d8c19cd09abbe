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
}
