package graft.queries

import graft.{GraftSession, Tables}
import graft.media.Media
import org.apache.spark.sql.functions._

/** Multimodal-column queries: opaque binary payloads + typed metadata over
  * the documents corpus (media payloads are a deterministic stand-in — see
  * [[graft.media.Media]]). Both queries are map-only: payload never crosses
  * a shuffle, and the metadata columns prune independently of it.
  */
object MediaQueries {

  val defs: Seq[QueryDef] = Seq(

    // binary plumbing as Column expressions: sizes, content hash, fixed-
    // stride frame hashes, every-2nd-frame sampling. The per-frame hash
    // arrays are collapsed to scalar digests in the OUTPUT (the driver's
    // pandas comparator cannot sort array columns); the array forms stay
    // covered by MediaSpec.
    QueryDef(
      "media_features",
      (spark, dir) => {
        GraftSession.tune(spark)
        val m = Media.mediaTable(Tables.documents(spark, dir))
        m.withColumn("frame_hashes", Media.frameHashes(col("payload"), col("n_frames")))
          .select(
            col("doc_id"), col("media_type"), col("width"), col("height"), col("n_frames"),
            octet_length(col("payload")).cast("long").as("payload_bytes"),
            md5(col("payload")).as("payload_md5"),
            md5(concat_ws(",", col("frame_hashes"))).as("frames_digest"),
            md5(concat_ws(",", Media.sampleFrames(col("frame_hashes")))).as("sampled_digest"))
      },
      Some {
        val fh = Media.frameHashesSql("payload", "n_frames")
        s"""SELECT doc_id, media_type, width, height, n_frames,
           |       CAST(octet_length(encode(payload)) AS BIGINT) AS payload_bytes,
           |       md5(payload) AS payload_md5,
           |       md5(coalesce(list_aggregate(frame_hashes, 'string_agg', ','), '')) AS frames_digest,
           |       md5(coalesce(list_aggregate(${Media.sampleFramesSql("frame_hashes")}, 'string_agg', ','), '')) AS sampled_digest
           |FROM (SELECT *, $fh AS frame_hashes FROM ${Media.mediaTableSql} m)""".stripMargin
      }
    ),

    // typed resize path (stubbed scaler): halve dims until both fit maxDim,
    // subsample payload by the same power-of-2 factor. The oracle rebuilds
    // the byte subsample with list arithmetic and matches the md5 — proving
    // the typed mapPartitions resize plumbing byte-exact.
    QueryDef(
      "media_resize",
      (spark, dir) => {
        GraftSession.tune(spark)
        import spark.implicits._
        val m = Media.mediaTable(Tables.documents(spark, dir)).as[graft.media.MediaRecord]
        Media.resizeAll(m, Media.ResizeMaxDim).toDF()
          .select(col("doc_id"), col("media_type"), col("width"), col("height"),
                  octet_length(col("payload")).cast("long").as("n_bytes"),
                  md5(col("payload")).as("payload_md5"))
      },
      Some {
        val maxDim = Media.ResizeMaxDim
        // generated CASE over enough powers of 2 to cover ANY 31-bit
        // dimension (2^31 / 2^24 < maxDim), so the oracle can never fall
        // behind resizeStub's unbounded halving loop
        val fac = (0 to 24).map(p => 1L << p)
          .map(f => s"WHEN greatest(width, height) // $f <= $maxDim THEN $f")
          .mkString("CASE ", " ", s" ELSE ${1L << 25} END")
        val sampled = "list_aggregate(list_transform(generate_series(0, length(payload) // fac - 1), " +
          "i -> substring(payload, i * fac + 1, 1)), 'string_agg', '')"
        s"""SELECT doc_id, media_type,
           |       CAST(width // fac AS INT) AS width,
           |       CAST(height // fac AS INT) AS height,
           |       CAST(length(payload) // fac AS BIGINT) AS n_bytes,
           |       md5(CASE WHEN fac = 1 THEN payload ELSE coalesce($sampled, '') END) AS payload_md5
           |FROM (
           |  SELECT *, $fac AS fac
           |  FROM ${Media.mediaTableSql} m
           |)""".stripMargin
      }
    ),

    // REAL image decode: per doc, synthesize a deterministic pixel array,
    // encode it as an actual 24-bit BI_RGB BMP (little-endian headers,
    // bottom-up BGR rows, 4-byte stride padding), then decode with the real
    // parser and emit features computed from the DECODED bytes only. The
    // oracle recomputes width/height and the pixel hash from the generating
    // formulas directly — never through BMP — so any parse defect (stride,
    // channel order, row order, header offsets) hash-mismatches. Map-only;
    // payloads never cross a shuffle.
    QueryDef(
      "media_bmp_decode",
      (spark, dir) => {
        GraftSession.tune(spark)
        import spark.implicits._
        val ids = Tables.documents(spark, dir)
          .select(col("doc_id")).as[java.lang.Long]
        Media.bmpRoundTrip(ids).toDF()
      },
      Some {
        // pixel byte k = (doc_id*31 + k*7 + 13) % 256, rendered as a
        // lowercase hex string in k order, then md5'd — the exact string
        // the Spark side hashes from the decoder's output
        val hex = "list_aggregate(list_transform(generate_series(0, width * height * 3 - 1), " +
          "k -> printf('%02x', (doc_id * 31 + k * 7 + 13) % 256)), 'string_agg', '')"
        s"""SELECT doc_id, width, height,
           |       CAST(width AS BIGINT) * height AS n_pixels,
           |       md5($hex) AS pixels_md5
           |FROM (
           |  SELECT doc_id,
           |         CAST(4 + doc_id % 5 AS INT) AS width,
           |         CAST(3 + doc_id % 4 AS INT) AS height
           |  FROM documents
           |)""".stripMargin
      }
    ),

    // typed mapPartitions decode path (stubbed codec): the oracle reproduces
    // the stub arithmetic, proving the partition-iterator plumbing is exact
    QueryDef(
      "media_decode",
      (spark, dir) => {
        GraftSession.tune(spark)
        Media.decodedFeatures(spark, Tables.documents(spark, dir)).toDF()
      },
      Some {
        val bytes = "list_transform(generate_series(1, length(payload)), i -> ascii(substring(payload, i, 1)))"
        s"""SELECT doc_id, media_type,
           |       CAST(length(payload) AS BIGINT) AS n_bytes,
           |       (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), $bytes), (a, x) -> a + x) AS DOUBLE)
           |          / CAST(length(payload) AS DOUBLE)) AS mean_byte,
           |       CAST(ascii(substring(payload, 1, 1)) AS INT) AS first_byte,
           |       n_frames AS frame_count
           |FROM ${Media.mediaTableSql} m""".stripMargin
      }
    )
  )
}
