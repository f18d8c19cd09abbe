package graft

import graft.sources.Tar
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the strict USTAR codec ([[graft.sources.Tar]]): exact
  * round-trips across sizes that hit every padding case, the WebDataset
  * adjacency shape, header-checksum and octal-field strictness, terminator
  * enforcement, and the house hostile-input bar (truncations + mutation
  * fuzz must reject cleanly or decode — never escape dirty).
  */
class TarSpec extends AnyFunSuite {

  private def cleanly[A](what: String, bytes: Array[Byte])(dec: Array[Byte] => A): Option[A] =
    try Some(dec(bytes))
    catch {
      case _: IllegalArgumentException => None
      case e: Throwable =>
        fail(s"$what escaped with ${e.getClass.getName}: ${e.getMessage}")
    }

  private def randomEntries(seed: Long): Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    (0 until 1 + rnd.nextInt(6)).map { i =>
      // sizes 0, 1, 511, 512, 513 all appear across seeds: every padding case
      val n = rnd.nextInt(5) match {
        case 0 => 0
        case 1 => 1
        case 2 => 511
        case 3 => 512
        case _ => 513 + rnd.nextInt(700)
      }
      (f"member-$seed%x-$i", Array.fill(n)(rnd.nextInt(256).toByte))
    }
  }

  test("round-trips entries of every padding shape exactly, in order") {
    for (seed <- 0 until 50) {
      val entries = randomEntries(seed.toLong)
      val back = Tar.readAll(Tar.write(entries))
      assert(back.map(_._1) == entries.map(_._1), s"seed $seed names")
      for (((_, a), (_, b)) <- back.zip(entries))
        assert(java.util.Arrays.equals(a, b), s"seed $seed content")
    }
  }

  test("an empty archive is just the terminator and reads back empty") {
    val bytes = Tar.write(Seq.empty)
    assert(bytes.length == 1024 && bytes.forall(_ == 0))
    assert(Tar.readAll(bytes).isEmpty)
  }

  test("member bytes are deterministic (mtime pinned), so retries rewrite identically") {
    val entries = Seq(("a.jpg", Array[Byte](1, 2, 3)), ("a.json", Array[Byte](4)))
    assert(java.util.Arrays.equals(Tar.write(entries), Tar.write(entries)))
  }

  test("header checksum is live: flipping any header byte of a member rejects") {
    val valid = Tar.write(Seq(("doc.json", "x".getBytes)))
    // every byte of the header either participates in the checksum or IS
    // the stored checksum — a single flip anywhere must mismatch
    for (pos <- 0 until 512) {
      val bad = valid.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      assert(cleanly(s"header flip at $pos", bad)(Tar.readAll).isEmpty,
        s"accepted a corrupted header byte at $pos")
    }
  }

  test("strict octal: junk in the size field rejects") {
    val valid = Tar.write(Seq(("doc.json", "hello".getBytes)))
    val bad = valid.clone()
    bad(124) = '9' // not an octal digit; also breaks the checksum — reject either way
    assert(cleanly("size junk", bad)(Tar.readAll).isEmpty)
  }

  test("terminator enforcement: missing, single, or followed by garbage rejects") {
    val valid = Tar.write(Seq(("doc.json", "hello".getBytes)))
    assert(cleanly("no terminator", valid.dropRight(1024))(Tar.readAll).isEmpty)
    assert(cleanly("one zero block", valid.dropRight(512))(Tar.readAll).isEmpty)
    assert(cleanly("trailing garbage", valid ++ new Array[Byte](512))(Tar.readAll) match {
      // a third zero block after the terminator is trailing bytes — reject
      case None => true
      case Some(_) => false
    }, "accepted bytes after the terminator")
    val junk = valid ++ Array.fill(512)(0x41.toByte)
    assert(cleanly("nonzero trailing", junk)(Tar.readAll).isEmpty)
  }

  test("nonzero padding after content rejects (no smuggling channel)") {
    val valid = Tar.write(Seq(("doc.json", "hello".getBytes)))
    val bad = valid.clone()
    bad(512 + 5) = 0x41 // first pad byte after the 5 content bytes
    assert(cleanly("pad smuggle", bad)(Tar.readAll).isEmpty)
  }

  test("unsupported member types (directories, links) reject") {
    val valid = Tar.write(Seq(("doc.json", "hello".getBytes)))
    for (tf <- Seq('5', '2', 'L')) {
      val bad = valid.clone()
      bad(156) = tf.toByte
      // recompute the checksum so ONLY the typeflag is at issue
      var sum = 0L
      for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else bad(i) & 0xff)
      val cs = java.lang.Long.toOctalString(sum)
      for (i <- 0 until 6) bad(148 + i) = '0'
      for ((c, i) <- cs.zipWithIndex) bad(148 + (6 - cs.length) + i) = c.toByte
      bad(154) = 0; bad(155) = ' '
      assert(cleanly(s"typeflag $tf", bad)(Tar.readAll).isEmpty,
        s"accepted member type '$tf'")
    }
  }

  test("every truncation of a valid archive rejects cleanly") {
    val valid = Tar.write(Seq(("a.jpg", Array.fill(700)(7.toByte)), ("a.json", "{}".getBytes)))
    for (len <- 0 until valid.length) {
      assert(cleanly(s"truncation to $len", valid.take(len))(Tar.readAll).isEmpty,
        s"accepted a $len-byte truncation of ${valid.length}")
    }
  }

  test("1000 single-byte mutations reject cleanly or decode") {
    for (i <- 0 until 1000) {
      val entries = randomEntries(0xBEEF00L + i % 20)
      val valid = Tar.write(entries)
      val rnd = new scala.util.Random(0x7A7A00L + i)
      val bad = valid.clone()
      val pos = rnd.nextInt(bad.length)
      bad(pos) = (bad(pos) ^ (1 + rnd.nextInt(255))).toByte
      cleanly(s"mutation at $pos", bad)(Tar.readAll) // contract: no dirty escape
    }
  }

  test("oversized member name and member size bounds are enforced at encode") {
    intercept[IllegalArgumentException](Tar.write(Seq(("x" * 101, Array[Byte](1)))))
    intercept[IllegalArgumentException](Tar.write(Seq(("", Array[Byte](1)))))
  }
}
