package graft

import graft.sources.TfRecord
import org.scalatest.funsuite.AnyFunSuite

/** Unit + fuzz coverage for the TFRecord framing codec — the same bar as
  * the media codecs: exact round-trips, known-answer CRC values from the
  * public CRC32C/test-vector literature, and a strict-reject contract for
  * every corruption class (flipped bits, truncations, trailing garbage,
  * hostile length words).
  */
class TfRecordSpec extends AnyFunSuite {

  private def frame(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    payloads.foreach(TfRecord.writeRecord(out, _))
    out.toByteArray
  }

  test("CRC32C known-answer: the Castagnoli check value and the published mask") {
    // 'check' value of CRC-32C from the public catalog: crc32c("123456789")
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue == 0xe3069283L)
    // mask(0) is the bare mask delta — the masked CRC of the framing's
    // all-zero 8-byte length word for an empty record derives from it
    assert(TfRecord.mask(0) == 0xa282ead8.toInt)
    // masking then unmasking is the identity (unmask per the public
    // definition: rot right 17 of (masked - delta))
    for (crc <- Seq(0, 1, 0xe3069283, 0x7fffffff, 0x80000000, -1)) {
      val m = TfRecord.mask(crc)
      val rot = m - 0xa282ead8
      val back = (rot << 15) | (rot >>> 17)
      assert(back == crc, f"mask round-trip failed for 0x$crc%08x")
    }
  }

  test("round-trip: empty, single-byte, multi-record, and random-size payloads") {
    val rnd = new scala.util.Random(0x7F7EC0)
    val payloads = Seq(
      Array.empty[Byte],
      Array(42.toByte),
      "hello\tworld\n".getBytes("UTF-8")
    ) ++ (0 until 50).map(_ => Array.fill(rnd.nextInt(4096))(rnd.nextInt(256).toByte))
    val back = TfRecord.readAll(frame(payloads))
    assert(back.size == payloads.size)
    payloads.zip(back).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    assert(TfRecord.readAll(Array.empty[Byte]).isEmpty)
  }

  test("every single-byte flip anywhere in a shard is a detected error") {
    val payloads = (0 until 5).map(i => s"record-$i-payload".getBytes("UTF-8"))
    val valid = frame(payloads)
    for (pos <- valid.indices) {
      val bad = valid.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      val r = try { TfRecord.readAll(bad); None }
      catch { case e: IllegalArgumentException => Some(e) }
      assert(r.isDefined, s"flip at $pos decoded silently — CRC must catch every bit")
    }
  }

  test("truncations accepted ONLY at exact record boundaries, as a record prefix") {
    // like Y4M, the stream declares no record count — a cut exactly after
    // a complete record IS a valid shorter shard (that is what makes the
    // format appendable). Mid-record cuts and trailing garbage reject; a
    // lost tail record surfaces at the pipeline level as a row-count /
    // hash mismatch against the oracle, which is what the gate checks.
    val payloads = Seq("abc".getBytes, "defgh".getBytes)
    val valid = frame(payloads)
    val rec1End = 8 + 4 + 3 + 4
    for (len <- 1 until valid.length) {
      val cut = java.util.Arrays.copyOf(valid, len)
      if (len == rec1End) {
        val back = TfRecord.readAll(cut)
        assert(back.size == 1 && java.util.Arrays.equals(back.head, payloads.head))
      } else {
        intercept[IllegalArgumentException](TfRecord.readAll(cut))
      }
    }
    intercept[IllegalArgumentException](TfRecord.readAll(valid :+ 0.toByte))
  }

  test("hostile length word rejects before allocating") {
    // a 12-byte fragment claiming a huge record: the length bound must
    // fire (and even a CORRECTLY-CRC'd huge length must fail the bound)
    val lenBytes = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(lenBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong((TfRecord.MaxRecordBytes.toLong + 1))
    val out = new java.io.ByteArrayOutputStream()
    out.write(lenBytes)
    val crc = TfRecord.maskedCrc(lenBytes, 0, 8)
    out.write(Array((crc & 0xff).toByte, ((crc >> 8) & 0xff).toByte,
      ((crc >> 16) & 0xff).toByte, ((crc >> 24) & 0xff).toByte))
    val ex = intercept[IllegalArgumentException](TfRecord.readAll(out.toByteArray))
    assert(ex.getMessage.contains("implausible record length"))
  }
}
