package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{TfExample, TfRecord}
import graft.sources.TfExample.{BytesList, FloatList, Int64List, FeatureValue}

/** KATs hand-computed from the public protobuf wire-format spec, round
  * trips over the full value space, unpacked-form acceptance, hostile
  * structure rejection, and the two-layer fuzz contract: protobuf carries
  * no checksum, so a mutated Example may decode to DIFFERENT content but
  * must never decode back to the ORIGINAL; the TFRecord framing layer
  * above it must catch every payload flip via its masked CRC32C.
  */
class TfExampleSpec extends AnyFunSuite {

  private def rt(features: Seq[(String, FeatureValue)]): Unit = {
    val bytes = TfExample.encode(features)
    assert(TfExample.decode(bytes) == features)
  }

  test("KAT: one int64 feature matches hand-computed wire bytes") {
    // Int64List{value=[1]} packed: value field tag 0x0a, len 1, varint 1
    // Feature{int64_list}: field 3 wire 2 -> tag 0x1a, len 3
    // entry: key 'a' -> 0x0a 0x01 0x61; value -> 0x12 0x05 <feature>
    // Features.feature -> 0x0a 0x0a <entry>; Example.features -> 0x0a 0x0c
    val expected = Array[Int](
      0x0a, 0x0c,
      0x0a, 0x0a,
      0x0a, 0x01, 0x61,
      0x12, 0x05,
      0x1a, 0x03, 0x0a, 0x01, 0x01).map(_.toByte)
    val got = TfExample.encode(Seq("a" -> Int64List(Vector(1L))))
    assert(java.util.Arrays.equals(got, expected),
      s"got ${got.map(b => f"${b & 0xff}%02x").mkString(" ")}")
  }

  test("KAT: plain (non-zigzag) varints — -1 is ten bytes, 300 is 0xac 0x02") {
    val neg = TfExample.encode(Seq("n" -> Int64List(Vector(-1L))))
    // the packed blob inside must be ten bytes: 0xff x9 then 0x01
    val blob = neg.takeRight(10)
    assert(blob.take(9).forall(_ == 0xff.toByte) && blob.last == 0x01.toByte)
    val v300 = TfExample.encode(Seq("n" -> Int64List(Vector(300L))))
    assert(v300.takeRight(2).sameElements(Array(0xac.toByte, 0x02.toByte)))
  }

  test("KAT: float is 4-byte little-endian IEEE754 in a packed blob") {
    val bytes = TfExample.encode(Seq("f" -> FloatList(Vector(1.0f))))
    // 1.0f = 0x3f800000 -> LE 00 00 80 3f as the last four bytes
    assert(bytes.takeRight(4).sameElements(
      Array(0x00.toByte, 0x00.toByte, 0x80.toByte, 0x3f.toByte)))
  }

  test("round-trip: all three kinds, multi-element, empty lists, edge values") {
    rt(Seq(
      "ids"   -> Int64List(Vector(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 127L, 128L, 300L)),
      "score" -> FloatList(Vector(0.0f, -0.0f, 1.5f, Float.MaxValue, Float.MinValue,
                                  Float.PositiveInfinity)),
      "text"  -> BytesList(Vector("hello".getBytes("UTF-8"), Array.empty[Byte],
                                  Array[Byte](0, 1, 2, -1))),
      "empty_i" -> Int64List(Vector.empty),
      "empty_b" -> BytesList(Vector.empty)))
    // NaN breaks Vector[Float] equality (primitive semantics), so its
    // round-trip is asserted at the bit level; the encoder canonicalizes
    // via floatToIntBits, as the KAT-equivalent Java encoder does
    val nanBytes = TfExample.encode(Seq("n" -> FloatList(Vector(Float.NaN, 1f))))
    val decoded = TfExample.decode(nanBytes) match {
      case Seq(("n", FloatList(vs))) => vs
      case other => fail(s"unexpected decode $other")
    }
    assert(decoded.map(java.lang.Float.floatToIntBits) ==
      Vector(Float.NaN, 1f).map(java.lang.Float.floatToIntBits))
  }

  test("round-trip: seeded random features, 200 examples") {
    val rnd = new scala.util.Random(0xf0e1d2c3)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val feats = (0 until n).map { i =>
        val name = s"f${i}_${rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString}"
        val fv: FeatureValue = rnd.nextInt(3) match {
          case 0 => Int64List(Vector.fill(rnd.nextInt(20))(rnd.nextLong()))
          case 1 => FloatList(Vector.fill(rnd.nextInt(20))(
            java.lang.Float.intBitsToFloat(rnd.nextInt())).map(f => if (f.isNaN) 0f else f))
          case _ => BytesList(Vector.fill(rnd.nextInt(5))(
            Array.fill(rnd.nextInt(32))(rnd.nextInt().toByte)))
        }
        name -> fv
      }
      rt(feats)
    }
  }

  test("parsers accept the UNPACKED numeric forms the spec requires") {
    // Hand-build Int64List{value=5, value=300} unpacked (tag 0x08 wire 0)
    // inside Feature field 3, entry key 'u'.
    def ex(featureBody: Array[Byte], kindField: Int): Array[Byte] = {
      def ld(field: Int, b: Array[Byte]): Array[Byte] =
        Array(((field << 3) | 2).toByte, b.length.toByte) ++ b
      val feature = ld(kindField, featureBody)
      val entry = ld(1, Array('u'.toByte)) ++ ld(2, feature)
      ld(1, ld(1, entry))
    }
    val unpackedInts = Array[Byte](0x08, 0x05, 0x08, 0xac.toByte, 0x02)
    assert(TfExample.decode(ex(unpackedInts, 3)) ==
      Seq("u" -> Int64List(Vector(5L, 300L))))
    // unpacked float: tag 0x0d wire 5 + 4 LE bytes, twice
    val unpackedFloats = Array[Byte](0x0d, 0, 0, 0x80.toByte, 0x3f,
                                     0x0d, 0, 0, 0, 0x40)
    assert(TfExample.decode(ex(unpackedFloats, 2)) ==
      Seq("u" -> FloatList(Vector(1.0f, 2.0f))))
  }

  test("strict rejects: unknown fields, wrong wire types, dup keys, bad oneof") {
    val good = TfExample.encode(Seq("a" -> Int64List(Vector(1L, 2L))))
    def ld(field: Int, b: Array[Byte]): Array[Byte] =
      Array(((field << 3) | 2).toByte, b.length.toByte) ++ b
    // unknown top-level field 2
    intercept[IllegalArgumentException](
      TfExample.decode(ld(2, Array.empty)))
    // Example.features with wire type 0
    intercept[IllegalArgumentException](
      TfExample.decode(Array[Byte](0x08, 0x01)))
    // Feature with two kinds set
    val twoKinds = ld(1, ld(1, ld(1, Array('x'.toByte)) ++
      ld(2, ld(3, Array[Byte](0x0a, 0x01, 0x01)) ++ ld(1, Array.empty[Byte]))))
    intercept[IllegalArgumentException](TfExample.decode(twoKinds))
    // Feature with NO kind set
    val noKind = ld(1, ld(1, ld(1, Array('x'.toByte)) ++ ld(2, Array.empty[Byte])))
    intercept[IllegalArgumentException](TfExample.decode(noKind))
    // duplicate feature name
    val entry = ld(1, Array('d'.toByte)) ++
      ld(2, ld(3, Array[Byte](0x0a, 0x01, 0x01)))
    intercept[IllegalArgumentException](
      TfExample.decode(ld(1, ld(1, entry) ++ ld(1, entry))))
    // packed float blob length not a multiple of 4
    val badFloat = ld(1, ld(1, ld(1, Array('f'.toByte)) ++
      ld(2, ld(2, ld(1, Array[Byte](0, 0, 0))))))
    intercept[IllegalArgumentException](TfExample.decode(badFloat))
    // map entry missing its Feature value
    intercept[IllegalArgumentException](
      TfExample.decode(ld(1, ld(1, ld(1, Array('x'.toByte))))))
    // trailing garbage after Example.features
    intercept[IllegalArgumentException](TfExample.decode(good ++ Array[Byte](0x00)))
    // encoder rejects duplicate names up front
    intercept[IllegalArgumentException](TfExample.encode(
      Seq("a" -> Int64List(Vector(1L)), "a" -> Int64List(Vector(2L)))))
  }

  test("lenient ⊇ strict: every strict-accepted payload decodes identically") {
    val rnd = new scala.util.Random(0x5eed17)
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(5)
      val feats = (0 until n).map { i =>
        val name = s"g${i}_${rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString}"
        val fv: FeatureValue = rnd.nextInt(3) match {
          case 0 => Int64List(Vector.fill(rnd.nextInt(16))(rnd.nextLong()))
          case 1 => FloatList(Vector.fill(rnd.nextInt(16))(
            java.lang.Float.intBitsToFloat(rnd.nextInt())).map(f => if (f.isNaN) 0f else f))
          case _ => BytesList(Vector.fill(rnd.nextInt(4))(
            Array.fill(rnd.nextInt(24))(rnd.nextInt().toByte)))
        }
        name -> fv
      }
      val bytes = TfExample.encode(feats)
      assert(TfExample.decodeLenient(bytes) == TfExample.decode(bytes))
    }
  }

  test("lenient skips injected unknown fields at every level; strict rejects each") {
    def ld(field: Int, b: Array[Byte]): Array[Byte] =
      Array(((field << 3) | 2).toByte, b.length.toByte) ++ b
    def vint(field: Int, v: Int): Array[Byte] =
      Array((field << 3).toByte, v.toByte) // single-byte varint values only
    def i64(field: Int, v: Byte): Array[Byte] = // 64-bit wire type 1
      Array(((field << 3) | 1).toByte) ++ Array.fill(8)(v)
    def group(field: Int): Array[Byte] = // deprecated nested group, wire 3/4
      Array(((field << 3) | 3).toByte) ++ vint(1, 7) ++
        Array(((field << 3) | 4).toByte)
    val listMsg = ld(1, Array[Byte](0x2a)) // Int64List packed [42]
    val feature = ld(3, listMsg)
    val entry = ld(1, Array('a'.toByte)) ++ ld(2, feature)
    val base = ld(1, ld(1, entry))
    val want = Seq("a" -> Int64List(Vector(42L)))
    assert(TfExample.decode(base) == want)
    val injected = Seq(
      "example-append-varint"  -> (base ++ vint(15, 1)),
      "example-prepend-64bit"  -> (i64(12, 0x11) ++ base),
      "example-group"          -> (base ++ group(7)),
      "features-lendelim"      -> ld(1, ld(1, entry) ++ ld(9, Array[Byte](1, 2))),
      "entry-varint"           -> ld(1, ld(1,
        ld(1, Array('a'.toByte)) ++ vint(5, 9) ++ ld(2, feature))),
      "feature-unknown-field"  -> ld(1, ld(1,
        ld(1, Array('a'.toByte)) ++ ld(2, vint(4, 2) ++ ld(3, listMsg)))),
      "list-unknown-field"     -> ld(1, ld(1,
        ld(1, Array('a'.toByte)) ++ ld(2, ld(3, listMsg ++ vint(3, 1))))))
    injected.foreach { case (label, bytes) =>
      intercept[IllegalArgumentException] { TfExample.decode(bytes); () }
      assert(TfExample.decodeLenient(bytes) == want, label)
    }
  }

  test("lenient spec semantics: last-wins duplicates, merged features, masked varint") {
    def ld(field: Int, b: Array[Byte]): Array[Byte] =
      Array(((field << 3) | 2).toByte, b.length.toByte) ++ b
    val l1 = ld(3, ld(1, Array[Byte](0x01)))
    val l2 = ld(3, ld(1, Array[Byte](0x02)))
    // duplicate oneof kind inside one Feature: last wins
    val dupKind = ld(1, ld(1, ld(1, Array('a'.toByte)) ++ ld(2, l1 ++ l2)))
    intercept[IllegalArgumentException] { TfExample.decode(dupKind); () }
    assert(TfExample.decodeLenient(dupKind) == Seq("a" -> Int64List(Vector(2L))))
    // duplicate feature NAME across entries: last wins, first position kept
    val eA1 = ld(1, Array('a'.toByte)) ++ ld(2, l1)
    val eA2 = ld(1, Array('a'.toByte)) ++ ld(2, l2)
    val eB = ld(1, Array('b'.toByte)) ++ ld(2, l1)
    val dupName = ld(1, ld(1, eA1) ++ ld(1, eB) ++ ld(1, eA2))
    intercept[IllegalArgumentException] { TfExample.decode(dupName); () }
    assert(TfExample.decodeLenient(dupName) ==
      Seq("a" -> Int64List(Vector(2L)), "b" -> Int64List(Vector(1L))))
    // repeated Example.features occurrences MERGE (proto embedded-message merge)
    val twoFeatures = ld(1, ld(1, eA1)) ++ ld(1, ld(1, eB))
    intercept[IllegalArgumentException] { TfExample.decode(twoFeatures); () }
    assert(TfExample.decodeLenient(twoFeatures) ==
      Seq("a" -> Int64List(Vector(1L)), "b" -> Int64List(Vector(1L))))
    // non-canonical 10-byte varint: strict rejects the dropped bits,
    // lenient masks them (0x80 x9 then 0x03 -> only bit 63 survives)
    val packed = Array.fill(9)(0x80.toByte) :+ 0x03.toByte
    val ncv = ld(1, ld(1, ld(1, Array('a'.toByte)) ++
      ld(2, ld(3, ld(1, packed)))))
    intercept[IllegalArgumentException] { TfExample.decode(ncv); () }
    assert(TfExample.decodeLenient(ncv) == Seq("a" -> Int64List(Vector(Long.MinValue))))
    // lenient is about unknown CONTENT, not damaged framing: truncation
    // still rejects
    val good = TfExample.encode(Seq("a" -> Int64List(Vector(1L, 2L))))
    intercept[IllegalArgumentException] {
      TfExample.decodeLenient(good.dropRight(1)); ()
    }
    // unmatched end-group tag rejects even when skipped leniently
    intercept[IllegalArgumentException] {
      TfExample.decodeLenient(good ++ Array[Byte](0x3c)); () // field 7 wire 4
    }
  }

  test("encode enforces the decode-side size cap — oversized Examples fail at the producer") {
    val huge = BytesList(Vector(new Array[Byte](TfExample.MaxExampleBytes)))
    val ex = intercept[IllegalArgumentException] {
      TfExample.encode(Seq("blob" -> huge)); ()
    }
    assert(ex.getMessage.contains("cap"))
  }

  test("hostile lengths fail fast: nested length past the message, huge varint") {
    // claims a 2GB Features message in a 4-byte Example
    intercept[IllegalArgumentException](TfExample.decode(
      Array[Byte](0x0a, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07)))
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException](TfExample.decode(
      Array[Byte](0x0a, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07)))
    assert(System.nanoTime() - t0 < 1e9, "hostile length took >1s — not failing fast")
    // 11-byte varint
    intercept[IllegalArgumentException](TfExample.decode(
      Array.fill[Byte](11)(0x80.toByte) ++ Array[Byte](0x01)))
    // every strict truncation of a valid Example rejects
    val good = TfExample.encode(Seq(
      "a" -> Int64List(Vector(1L, 300L)), "b" -> BytesList(Vector("xy".getBytes))))
    (0 until good.length).foreach { n =>
      intercept[IllegalArgumentException](TfExample.decode(good.take(n)))
    }
  }

  test("fuzz: 2000 single-byte mutations never decode back to the original") {
    val features = Seq[(String, FeatureValue)](
      "ids"  -> Int64List(Vector(7L, 300L, -2L)),
      "text" -> BytesList(Vector("the quick brown fox".getBytes("UTF-8"))),
      "sc"   -> FloatList(Vector(1.25f, -3.5f)))
    val good = TfExample.encode(features)
    val rnd = new scala.util.Random(0x5eed)
    var decodedDifferent = 0
    var rejected = 0
    (1 to 2000).foreach { _ =>
      val m = good.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val out = TfExample.decode(m)
        assert(out != features, s"flipped byte $i decoded back to the ORIGINAL")
        decodedDifferent += 1
      } catch { case _: IllegalArgumentException => rejected += 1 }
    }
    assert(rejected > 0 && decodedDifferent > 0,
      s"fuzz degenerate: rejected=$rejected decodedDifferent=$decodedDifferent")
  }

  test("the TFRecord layer catches what protobuf cannot: every payload flip") {
    val payload = TfExample.encode(Seq("a" -> Int64List(Vector(42L))))
    val shard = new java.io.ByteArrayOutputStream()
    TfRecord.writeRecord(shard, payload)
    val bytes = shard.toByteArray
    val rnd = new scala.util.Random(0xc4c)
    (1 to 500).foreach { _ =>
      val m = bytes.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      intercept[IllegalArgumentException](TfRecord.readAll(m))
    }
  }
}
