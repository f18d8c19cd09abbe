package graft.sources

/** The `tf.Example` message family, hand-rolled from the PUBLIC protobuf
  * wire-format spec — the payload that makes [[TfRecord]] shards actually
  * loadable by a training stack (the shards previously carried opaque
  * digest strings; a real estate ships serialized Examples). No protobuf
  * runtime exists in this environment's jars, so the encoding is written
  * from the spec the same way [[Avro]] hand-rolls OCF:
  *
  *   message BytesList { repeated bytes value = 1; }
  *   message FloatList { repeated float value = 1 [packed]; }
  *   message Int64List { repeated int64 value = 1 [packed]; }
  *   message Feature   { oneof kind { BytesList bytes_list = 1;
  *                                    FloatList float_list = 2;
  *                                    Int64List int64_list = 3; } }
  *   message Features  { map<string, Feature> feature = 1; }
  *   message Example   { Features features = 1; }
  *
  * Wire format: each field is a tag varint `(field_number << 3) | wire_type`
  * followed by the value; wire types used here are 0 (varint — int64 is
  * PLAIN base-128 two's complement, NOT Avro's zigzag, so -1 is ten 0xff/0x01
  * bytes), 2 (length-delimited: varint byte length then the bytes), and 5
  * (32-bit little-endian, unpacked floats). A map field is the spec's
  * repeated synthetic entry message `{ string key = 1; Feature value = 2; }`.
  * The writer emits the proto3-default PACKED form for the numeric lists
  * (one length-delimited blob of varints / LE floats); the reader accepts
  * BOTH packed and unpacked forms, as the spec requires of all parsers.
  *
  * The reader is a strict VALIDATOR in the house style of [[TfRecord]] and
  * the media codecs, deliberately stricter than a general proto parser
  * (which must skip unknown fields): unknown field numbers, wrong wire
  * types on known fields, duplicate feature names, a Feature with zero or
  * two kinds set, a packed float blob not a multiple of 4, varints longer
  * than 10 bytes, nested lengths past the enclosing message, and trailing
  * bytes all reject with IllegalArgumentException. Corruption the wire
  * format itself cannot detect (protobuf carries no checksum) is caught one
  * layer down by [[TfRecord]]'s per-record masked CRC32C — the fuzz spec
  * exercises both layers.
  */
object TfExample {

  sealed trait FeatureValue
  final case class BytesList(values: IndexedSeq[Array[Byte]]) extends FeatureValue {
    override def equals(o: Any): Boolean = o match {
      case BytesList(vs) => vs.length == values.length &&
        vs.indices.forall(i => java.util.Arrays.equals(vs(i), values(i)))
      case _ => false
    }
    override def hashCode: Int = values.map(java.util.Arrays.hashCode).hashCode()
  }
  final case class FloatList(values: IndexedSeq[Float]) extends FeatureValue
  final case class Int64List(values: IndexedSeq[Long]) extends FeatureValue

  /** Bound on one Example (64 MiB) — hostile nested lengths fail fast
    * before allocation, same policy as [[Avro.MaxBlockBytes]].
    */
  val MaxExampleBytes: Int = 1 << 26

  // ---- wire primitives -----------------------------------------------------

  private final class Reader(val bytes: Array[Byte], var pos: Int, val end: Int,
                             val lenient: Boolean = false) {
    def remaining: Int = end - pos
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $pos")
    def readByte(): Int = {
      if (pos >= end) fail("truncated protobuf data")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    /** Plain (non-zigzag) base-128 varint, bounds-checked at 10 bytes.
      * The 10th byte can only carry one significant bit (bit 63); its
      * other payload bits would be silently dropped by the shift, so the
      * strict validator rejects them — a corrupted shard must not decode
      * to the same value undetected. The LENIENT reader takes the spec's
      * side instead: any general proto parser accepts non-canonical
      * forms and drops the overflow bits.
      */
    def readVarint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        if (shift > 63) fail("varint longer than 10 bytes")
        b = readByte()
        if (!lenient && shift == 63 && (b & 0x7e) != 0)
          fail("non-canonical varint: 10th byte carries dropped bits")
        acc |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      acc
    }
    def readLen(what: String): Int = {
      val n = readVarint()
      if (n < 0 || n > remaining) fail(s"implausible $what length $n (remaining $remaining)")
      n.toInt
    }
    def readLe32(): Int = {
      if (remaining < 4) fail("truncated 32-bit value")
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: java.io.ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelim(out: java.io.ByteArrayOutputStream, field: Int,
                            body: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  // ---- encode ----------------------------------------------------------------

  private def encodeFeature(fv: FeatureValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    fv match {
      case BytesList(vs) =>
        // BytesList.value is repeated bytes (never packed); one submessage
        // holding one length-delimited field per element
        val inner = new java.io.ByteArrayOutputStream(64)
        vs.foreach { b => writeLenDelim(inner, 1, b) }
        writeLenDelim(out, 1, inner.toByteArray) // Feature.bytes_list = 1
      case FloatList(vs) =>
        val packed = new java.io.ByteArrayOutputStream(vs.length * 4)
        vs.foreach { f =>
          val bits = java.lang.Float.floatToIntBits(f)
          packed.write(bits & 0xff); packed.write((bits >>> 8) & 0xff)
          packed.write((bits >>> 16) & 0xff); packed.write((bits >>> 24) & 0xff)
        }
        val inner = new java.io.ByteArrayOutputStream(packed.size + 8)
        writeLenDelim(inner, 1, packed.toByteArray) // FloatList.value packed
        writeLenDelim(out, 2, inner.toByteArray)    // Feature.float_list = 2
      case Int64List(vs) =>
        val packed = new java.io.ByteArrayOutputStream(vs.length * 2)
        vs.foreach(writeVarint(packed, _))
        val inner = new java.io.ByteArrayOutputStream(packed.size + 8)
        writeLenDelim(inner, 1, packed.toByteArray) // Int64List.value packed
        writeLenDelim(out, 3, inner.toByteArray)    // Feature.int64_list = 3
    }
    out.toByteArray
  }

  /** Serialize one Example. Features are emitted in the given order, so a
    * fixed caller-side order makes shard bytes deterministic across task
    * retries (same contract as [[Avro.writeFile]]'s caller-supplied sync).
    */
  def encode(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val names = features.map(_._1)
    require(names.distinct.length == names.length,
      s"duplicate feature names: ${names.diff(names.distinct).mkString(", ")}")
    val featuresMsg = new java.io.ByteArrayOutputStream(256)
    features.foreach { case (name, fv) =>
      val entry = new java.io.ByteArrayOutputStream(128)
      writeLenDelim(entry, 1, name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      writeLenDelim(entry, 2, encodeFeature(fv))
      writeLenDelim(featuresMsg, 1, entry.toByteArray) // Features.feature entry
    }
    val out = new java.io.ByteArrayOutputStream(featuresMsg.size + 8)
    writeLenDelim(out, 1, featuresMsg.toByteArray) // Example.features = 1
    // write/read symmetry: decode() rejects Examples over MaxExampleBytes,
    // so an oversized payload must fail HERE at the producer, not land in
    // a shard this codec's own reader then refuses to open
    require(out.size <= MaxExampleBytes,
      s"Example encodes to ${out.size} bytes, over the $MaxExampleBytes cap decode() enforces")
    out.toByteArray
  }

  // ---- decode ----------------------------------------------------------------

  private def readTag(in: Reader): (Int, Int) = {
    val t = in.readVarint()
    if (t <= 0 || t > Int.MaxValue) in.fail(s"implausible tag $t")
    ((t >>> 3).toInt, (t & 7).toInt)
  }

  /** Skip one field's value by wire type — the spec-mandated
    * unknown-field handling the lenient reader applies where the strict
    * validator rejects. Truncation inside a skip still fails: skipping
    * is a parse, not a blind seek. Deprecated groups (wire 3/4) nest.
    */
  private def skipField(in: Reader, wire: Int): Unit = wire match {
    case 0 => in.readVarint(): Unit
    case 1 =>
      if (in.remaining < 8) in.fail("truncated 64-bit field")
      in.pos += 8
    case 2 =>
      val n = in.readLen("skipped field")
      in.pos += n
    case 3 =>
      var depth = 1
      while (depth > 0) {
        val (_, w) = readTag(in)
        w match {
          case 3 => depth += 1
          case 4 => depth -= 1
          case other => skipField(in, other)
        }
      }
    case 4 => in.fail("end-group tag with no matching start-group")
    case 5 =>
      if (in.remaining < 4) in.fail("truncated 32-bit field")
      in.pos += 4
    case w => in.fail(s"invalid wire type $w")
  }

  private def decodeBytesList(in: Reader): BytesList = {
    val out = IndexedSeq.newBuilder[Array[Byte]]
    while (in.remaining > 0) {
      readTag(in) match {
        case (1, 2) =>
          val n = in.readLen("bytes element")
          out += java.util.Arrays.copyOfRange(in.bytes, in.pos, in.pos + n)
          in.pos += n
        case (f, w) =>
          if (in.lenient) skipField(in, w)
          else in.fail(s"unexpected BytesList field $f wire $w")
      }
    }
    BytesList(out.result())
  }

  private def decodeFloatList(in: Reader): FloatList = {
    val out = IndexedSeq.newBuilder[Float]
    while (in.remaining > 0) {
      readTag(in) match {
        case (1, 2) => // packed
          val n = in.readLen("packed float blob")
          if (n % 4 != 0) in.fail(s"packed float blob length $n not a multiple of 4")
          val end = in.pos + n
          while (in.pos < end) out += java.lang.Float.intBitsToFloat(in.readLe32())
        case (1, 5) => // unpacked
          out += java.lang.Float.intBitsToFloat(in.readLe32())
        case (f, w) =>
          if (in.lenient) skipField(in, w)
          else in.fail(s"unexpected FloatList field $f wire $w")
      }
    }
    FloatList(out.result())
  }

  private def decodeInt64List(in: Reader): Int64List = {
    val out = IndexedSeq.newBuilder[Long]
    while (in.remaining > 0) {
      readTag(in) match {
        case (1, 2) => // packed
          val n = in.readLen("packed int64 blob")
          val end = in.pos + n
          val sub = new Reader(in.bytes, in.pos, end, in.lenient)
          while (sub.remaining > 0) out += sub.readVarint()
          in.pos = end
        case (1, 0) => // unpacked
          out += in.readVarint()
        case (f, w) =>
          if (in.lenient) skipField(in, w)
          else in.fail(s"unexpected Int64List field $f wire $w")
      }
    }
    Int64List(out.result())
  }

  private def decodeFeature(in: Reader): FeatureValue = {
    if (in.lenient) {
      // spec semantics: unknown fields skipped, a re-occurring oneof kind
      // is last-wins; a Feature whose kind is never set stays
      // unrepresentable in this model and rejects in both modes
      var kind: Option[FeatureValue] = None
      while (in.remaining > 0) {
        val (field, wire) = readTag(in)
        if (wire == 2 && field >= 1 && field <= 3) {
          val n = in.readLen("Feature kind")
          val sub = new Reader(in.bytes, in.pos, in.pos + n, lenient = true)
          in.pos += n
          kind = Some(field match {
            case 1 => decodeBytesList(sub)
            case 2 => decodeFloatList(sub)
            case _ => decodeInt64List(sub)
          })
        } else skipField(in, wire)
      }
      return kind.getOrElse(in.fail("Feature with no kind set"))
    }
    if (in.remaining == 0) in.fail("Feature with no kind set")
    val (field, wire) = readTag(in)
    if (wire != 2) in.fail(s"Feature kind field $field has wire type $wire, expected 2")
    val n = in.readLen("Feature kind")
    val sub = new Reader(in.bytes, in.pos, in.pos + n)
    in.pos += n
    val fv = field match {
      case 1 => decodeBytesList(sub)
      case 2 => decodeFloatList(sub)
      case 3 => decodeInt64List(sub)
      case f => in.fail(s"unknown Feature field $f")
    }
    if (in.remaining > 0) in.fail("Feature with more than one kind set")
    fv
  }

  private def decodeMapEntry(in: Reader): (String, FeatureValue) = {
    var key: Option[String] = None
    var value: Option[FeatureValue] = None
    while (in.remaining > 0) {
      readTag(in) match {
        case (1, 2) =>
          if (key.isDefined && !in.lenient) in.fail("duplicate key field in map entry")
          val n = in.readLen("feature name")
          key = Some(new String(in.bytes, in.pos, n, java.nio.charset.StandardCharsets.UTF_8))
          in.pos += n
        case (2, 2) =>
          if (value.isDefined && !in.lenient) in.fail("duplicate value field in map entry")
          val n = in.readLen("Feature message")
          val sub = new Reader(in.bytes, in.pos, in.pos + n, in.lenient)
          in.pos += n
          value = Some(decodeFeature(sub))
        case (f, w) =>
          if (in.lenient) skipField(in, w)
          else in.fail(s"unexpected map-entry field $f wire $w")
      }
    }
    // lenient takes the proto3 default for an absent key (empty string);
    // an absent Feature VALUE decodes to kind-not-set, unrepresentable
    // here, so it rejects in both modes
    (key.getOrElse(if (in.lenient) "" else in.fail("map entry missing key")),
     value.getOrElse(in.fail("map entry missing Feature value")))
  }

  /** Strictly decode one serialized Example to its feature map. Any
    * structural violation (see object doc) throws IllegalArgumentException;
    * feature insertion order is preserved in the returned Seq.
    */
  def decode(bytes: Array[Byte]): Seq[(String, FeatureValue)] = {
    require(bytes.length <= MaxExampleBytes, s"Example exceeds $MaxExampleBytes bytes")
    val in = new Reader(bytes, 0, bytes.length)
    if (in.remaining == 0) in.fail("empty Example")
    readTag(in) match {
      case (1, 2) => // Example.features
      case (f, w) => in.fail(s"expected Example.features (field 1 wire 2), saw field $f wire $w")
    }
    val n = in.readLen("Features message")
    val features = new Reader(in.bytes, in.pos, in.pos + n)
    in.pos += n
    if (in.remaining > 0) in.fail("trailing bytes after Example.features")
    val out = Seq.newBuilder[(String, FeatureValue)]
    val seen = scala.collection.mutable.HashSet.empty[String]
    while (features.remaining > 0) {
      readTag(features) match {
        case (1, 2) =>
          val en = features.readLen("map entry")
          val sub = new Reader(features.bytes, features.pos, features.pos + en)
          features.pos += en
          val (k, v) = decodeMapEntry(sub)
          if (!seen.add(k)) features.fail(s"duplicate feature name '$k'")
          out += ((k, v))
        case (f, w) => features.fail(s"unexpected Features field $f wire $w")
      }
    }
    out.result()
  }

  /** The spec-mandated LENIENT read beside the strict validator: unknown
    * fields at every level are skipped (including nested deprecated
    * groups), non-canonical varints accepted with overflow bits dropped,
    * a repeated `Example.features` occurrence merges (proto embedded-
    * message merge), and duplicate feature names / oneof kinds are
    * last-wins (proto3 map + oneof semantics). Use this to read Examples
    * written by RICHER producers — e.g. a shard that also carries fields
    * this decoder does not model. Truncations, lengths past the enclosing
    * message, and a Feature with no representable kind still reject:
    * lenient is about unknown CONTENT, not damaged framing. Every
    * strict-accepted payload decodes identically in both modes
    * (property-tested in TfExampleSpec).
    */
  def decodeLenient(bytes: Array[Byte]): Seq[(String, FeatureValue)] = {
    require(bytes.length <= MaxExampleBytes, s"Example exceeds $MaxExampleBytes bytes")
    val in = new Reader(bytes, 0, bytes.length, lenient = true)
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val byName = scala.collection.mutable.HashMap.empty[String, FeatureValue]
    while (in.remaining > 0) {
      readTag(in) match {
        case (1, 2) => // Example.features — repeated occurrences merge
          val n = in.readLen("Features message")
          val features = new Reader(in.bytes, in.pos, in.pos + n, lenient = true)
          in.pos += n
          while (features.remaining > 0) {
            readTag(features) match {
              case (1, 2) =>
                val en = features.readLen("map entry")
                val sub = new Reader(features.bytes, features.pos, features.pos + en,
                                     lenient = true)
                features.pos += en
                val (k, v) = decodeMapEntry(sub)
                if (!byName.contains(k)) order += k
                byName(k) = v // last wins, first-seen position kept
              case (_, w) => skipField(features, w)
            }
          }
        case (_, w) => skipField(in, w)
      }
    }
    order.map(k => k -> byName(k)).toSeq
  }
}
