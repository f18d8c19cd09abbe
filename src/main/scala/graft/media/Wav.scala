package graft.media

/** Third real pure-JVM media codec — and the first AUDIO one: RIFF/WAVE
  * with 16-bit mono PCM. Extends the multimodal frame from images to
  * audio with the same discipline as [[Bmp]] and [[Ppm]]: a genuine
  * container parser (RIFF tag + size, WAVE form type, chunk walk that
  * tolerates unknown chunks and word-aligned padding per the RIFF spec,
  * `fmt ` validation of PCM/mono/16-bit, `data` extraction of
  * little-endian samples), hardened against corrupt headers the way
  * `Bmp.decode` is (sizes recomputed in Long, sane bounds, truncation
  * checks), with features downstream computed from the DECODED samples
  * only — the oracle recomputes them from the generating formulas, never
  * through the codec, so any parse defect hash-mismatches.
  */
object Wav {

  /** Sanity bound on sample count (~2 min at 8 kHz): corrupt `data` sizes
    * fail fast instead of allocating unbounded arrays.
    */
  private val MaxSamples = 1 << 20

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode mono 16-bit PCM samples as a canonical RIFF/WAVE file. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sample rate must be positive")
    val dataBytes = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataBytes)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataBytes))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))               // PCM
    out.write(le16(1))               // mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2))  // byte rate
    out.write(le16(2))               // block align
    out.write(le16(16))              // bits per sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataBytes))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Decode a RIFF/WAVE file to (sampleRate, mono 16-bit samples). Walks
    * the chunk list (RIFF chunks are word-aligned: odd-sized chunks carry
    * one pad byte), validates the `fmt ` chunk as PCM/mono/16-bit, and
    * requires both `fmt ` and `data` to be present and in spec order
    * (fmt before data).
    */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, "truncated WAV: shorter than the minimal header")
    require(tag(bytes, 0) == "RIFF", "bad RIFF magic")
    require(tag(bytes, 8) == "WAVE", "bad WAVE form type")
    val riffSize = readLe32(bytes, 4)
    require(riffSize + 8 <= bytes.length, "truncated WAV: RIFF size exceeds payload")

    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = tag(bytes, pos)
      val size = readLe32(bytes, pos + 4)
      val body = pos + 8
      require(body + size <= bytes.length, s"truncated WAV: chunk '$id' exceeds payload")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          require(readLe16(bytes, body) == 1, "only PCM (format 1) supported")
          require(readLe16(bytes, body + 2) == 1, "only mono supported")
          val rate = readLe32(bytes, body + 4)
          require(rate > 0 && rate <= 192000, "implausible sample rate")
          require(readLe16(bytes, body + 14) == 16, "only 16-bit samples supported")
          sampleRate = rate.toInt
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(size % 2 == 0, "odd data size for 16-bit samples")
          val n = (size / 2).toInt
          require(n <= MaxSamples, s"implausible sample count $n")
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = readLe16(bytes, body + 2 * i).toShort; i += 1 }
        case _ => // unknown chunk (LIST, fact, ...): skip
      }
      pos = body + size.toInt + (size.toInt & 1) // word alignment
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (sampleRate, samples)
  }
}
