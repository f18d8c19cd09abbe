package graft.sources

/** TFRecord framing — the canonical training-shard wire format consumed by
  * the major ML training stacks. The container is payload-agnostic framing
  * (this is what "TFRecord" specifies; the payload is usually a serialized
  * example message, here an opaque byte string):
  *
  *   uint64 length (little-endian)
  *   uint32 masked_crc32c(length bytes)   (little-endian)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)           (little-endian)
  *
  * with mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 mod 2^32 —
  * the published masking that prevents CRCs of CRC-bearing data from
  * looking valid. CRC32C (Castagnoli) comes from `java.util.zip.CRC32C`.
  *
  * The reader is strict the way the hand-rolled media codecs are: both
  * CRCs verified per record, record sizes bounded before allocation,
  * truncated or trailing bytes reject with a clean
  * `IllegalArgumentException` — a flipped bit anywhere in a shard is a
  * detected error, never a silently different record.
  */
object TfRecord {

  /** Bound on one record's payload (64 MiB): corrupt length words fail
    * fast instead of allocating unbounded arrays. Real shards keep records
    * far below this (shard FILES are the ~512 MB unit, records the ~KB-MB
    * unit).
    */
  val MaxRecordBytes: Int = 1 << 26

  private def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  /** The published CRC mask (Int arithmetic wraps = mod 2^32). */
  def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int =
    mask(crc32c(bytes, off, len))

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Append one framed record to `out`. */
  def writeRecord(out: java.io.OutputStream, payload: Array[Byte]): Unit = {
    require(payload.length <= MaxRecordBytes, s"record exceeds $MaxRecordBytes bytes")
    val lenBytes = new Array[Byte](8)
    var v = payload.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    out.write(lenBytes)
    out.write(le32(maskedCrc(lenBytes, 0, 8)))
    out.write(payload)
    out.write(le32(maskedCrc(payload, 0, payload.length)))
  }

  /** Decode a whole shard's bytes to its records, verifying BOTH CRCs of
    * every record and requiring the stream to end exactly on a record
    * boundary. Bad length word, flipped payload bit, truncation, or
    * trailing garbage all reject cleanly.
    */
  def readAll(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val out = IndexedSeq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 12 <= bytes.length, s"truncated TFRecord header at offset $pos")
      val len = readLe64(bytes, pos)
      require(len >= 0 && len <= MaxRecordBytes, s"implausible record length $len at offset $pos")
      require(readLe32(bytes, pos + 8) == maskedCrc(bytes, pos, 8),
        s"length CRC mismatch at offset $pos")
      val body = pos + 12
      val n = len.toInt
      require(body.toLong + n + 4 <= bytes.length, s"truncated record data at offset $pos")
      require(readLe32(bytes, body + n) == maskedCrc(bytes, body, n),
        s"data CRC mismatch at offset $pos")
      out += java.util.Arrays.copyOfRange(bytes, body, body + n)
      pos = body + n + 4
    }
    out.result()
  }
}
