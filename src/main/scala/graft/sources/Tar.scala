package graft.sources

import java.io.{ByteArrayOutputStream, OutputStream}

/** Minimal strict USTAR (POSIX.1-1988 tar) writer/reader — the container
  * under WebDataset, the dominant shard format for multimodal training
  * corpora (samples = consecutive member files sharing a key prefix, e.g.
  * `000017.jpg` + `000017.json`, so a sequential reader streams whole
  * samples without an index).
  *
  * Writer: 512-byte USTAR headers (octal size/mode fields, checksum over
  * the header with the checksum field blanked to spaces, `ustar\0` magic),
  * content padded to the 512 boundary, archive terminated by two zero
  * blocks. `mtime` is fixed at 0 so shard bytes are deterministic under
  * task retry — the same discipline as the TFRecord shard writers.
  *
  * Reader (strict, house contract — hostile input fails with a `require`
  * message, never an index error or OOM): verifies the magic and the
  * header checksum of every member, parses octal fields strictly
  * (NUL/space-terminated digits only), accepts only regular-file members
  * (typeflag '0' or NUL), requires the terminating two zero blocks and
  * nothing after them.
  */
object Tar {

  private val Block = 512
  private val MaxMemberBytes = 1 << 26 // 64 MiB per member — sanity bound

  private def octal(value: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, NUL terminator — the GNU/ustar form
    val s = java.lang.Long.toOctalString(value)
    require(s.length <= width - 1, s"value $value overflows a $width-byte octal field")
    val out = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { out(i) = '0'; i += 1 }
    s.foreach { c => out(i) = c.toByte; i += 1 }
    out(width - 1) = 0
    out
  }

  /** Append one regular-file member. `name` must fit the 100-byte field. */
  def writeEntry(out: OutputStream, name: String, data: Array[Byte]): Unit = {
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.nonEmpty && nameBytes.length <= 100, s"member name '$name' exceeds 100 bytes")
    require(data.length <= MaxMemberBytes, s"member ${data.length} bytes exceeds bound")
    val h = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(0x1a4, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(data.length.toLong, 12), 0, h, 124, 12) // size
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: deterministic bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum blanked for the sum
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5) // magic + NUL at 262
    h(263) = '0'; h(264) = '0' // version "00"
    var sum = 0
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    // checksum: 6 octal digits, NUL, space (the historical layout)
    val cs = java.lang.Integer.toOctalString(sum)
    val pad = 6 - cs.length
    i = 0
    while (i < pad) { h(148 + i) = '0'; i += 1 }
    cs.foreach { c => h(148 + i) = c.toByte; i += 1 }
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(data)
    val rem = data.length % Block
    if (rem != 0) out.write(new Array[Byte](Block - rem))
  }

  /** Terminate the archive: two zero blocks. */
  def finish(out: OutputStream): Unit = out.write(new Array[Byte](2 * Block))

  /** Convenience: whole archive in memory. */
  def write(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (n, d) => writeEntry(out, n, d) }
    finish(out)
    out.toByteArray
  }

  private def isZeroBlock(bytes: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < Block) { if (bytes(off + i) != 0) return false; i += 1 }
    true
  }

  private def parseOctal(bytes: Array[Byte], off: Int, len: Int, what: String): Long = {
    // strict: leading NUL/space-free octal digits, terminated by NUL or
    // space, rest of field NUL/space only
    var i = off
    val end = off + len
    var v = 0L
    var digits = 0
    while (i < end && bytes(i) != 0 && bytes(i) != ' ') {
      val c = bytes(i)
      require(c >= '0' && c <= '7', s"non-octal byte in $what field")
      v = v * 8 + (c - '0')
      require(v <= Long.MaxValue / 8, s"$what field overflows")
      digits += 1
      i += 1
    }
    require(digits > 0, s"empty $what field")
    while (i < end) {
      require(bytes(i) == 0 || bytes(i) == ' ', s"junk after $what digits")
      i += 1
    }
    v
  }

  /** Decode a whole archive: Seq of (member name, content) in file order. */
  def readAll(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes.length % Block == 0, s"tar length ${bytes.length} not block-aligned")
    require(bytes.length >= 2 * Block, "truncated tar: no terminator")
    val out = Vector.newBuilder[(String, Array[Byte])]
    var pos = 0
    var done = false
    while (!done) {
      require(pos + Block <= bytes.length, "truncated tar header")
      if (isZeroBlock(bytes, pos)) {
        require(pos + 2 * Block <= bytes.length && isZeroBlock(bytes, pos + Block),
          "single zero block is not a valid terminator")
        require(pos + 2 * Block == bytes.length, "trailing bytes after the tar terminator")
        done = true
      } else {
        // magic: "ustar" + NUL at 257..262
        require(bytes(pos + 257) == 'u' && bytes(pos + 258) == 's' &&
          bytes(pos + 259) == 't' && bytes(pos + 260) == 'a' &&
          bytes(pos + 261) == 'r' && bytes(pos + 262) == 0, "bad ustar magic")
        val stored = parseOctal(bytes, pos + 148, 8, "chksum")
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
          i += 1
        }
        require(sum == stored, s"tar header checksum mismatch ($sum != $stored)")
        val tf = bytes(pos + 156)
        require(tf == '0' || tf == 0, s"unsupported member type '${tf.toChar}'")
        var nameLen = 0
        while (nameLen < 100 && bytes(pos + nameLen) != 0) nameLen += 1
        require(nameLen > 0, "empty member name")
        val name = new String(bytes, pos, nameLen, "UTF-8")
        val size = parseOctal(bytes, pos + 124, 12, "size")
        require(size <= MaxMemberBytes, s"member $name: $size bytes exceeds bound")
        val dataBlocks = ((size + Block - 1) / Block).toInt
        require(pos + Block + dataBlocks * Block <= bytes.length,
          s"member $name overruns the archive")
        val data = java.util.Arrays.copyOfRange(bytes, pos + Block, pos + Block + size.toInt)
        // padding after content must be zero — a smuggling channel otherwise
        i = pos + Block + size.toInt
        val padEnd = pos + Block + dataBlocks * Block
        while (i < padEnd) {
          require(bytes(i) == 0, s"nonzero padding after member $name")
          i += 1
        }
        out += ((name, data))
        pos = padEnd
      }
    }
    out.result()
  }
}
