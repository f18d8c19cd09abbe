package graft

import graft.dedup.Dedup
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Semantic unit tests for the dedup primitives on crafted documents —
  * the DuckDB oracle checks cross-engine equality; these check the math
  * means what it claims.
  */
class DedupSpec extends SparkTestBase {

  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val near2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
  private val far = "completely different content about spark query engines and shuffles"

  private def docs = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")

  test("minhash signature has NumPerms entries and is permutation-stable") {
    val sig = docs
      .select(Dedup.minhashSignature(Dedup.shingleHashSet(col("text"), 3)).as("sig"))
      .head().getSeq[Long](0)
    assert(sig.length == Hashing.NumPerms)
    assert(sig.forall(h => h >= 0L && h < Hashing.M))
  }

  test("wide minhash signature has NumPermsWide entries and extends the narrow prefix") {
    val row = docs
      .select(
        Dedup.minhashSignature(Dedup.shingleHashSet(col("text"), 3), Hashing.NumPermsWide).as("wide"),
        Dedup.minhashSignature(Dedup.shingleHashSet(col("text"), 3)).as("narrow"))
      .head()
    val wide = row.getSeq[Long](0)
    val narrow = row.getSeq[Long](1)
    assert(wide.length == Hashing.NumPermsWide)
    assert(wide.forall(h => h >= 0L && h < Hashing.M))
    // the wide family's first NumPerms permutations ARE the narrow family,
    // so legacy 16-perm consumers (ngram banding, SQL extension) are
    // unchanged by the widening
    assert(wide.take(Hashing.NumPerms) == narrow)
  }

  test("near-duplicate docs agree on most minhash positions; unrelated docs on none") {
    val sigs = docs
      .select(col("doc_id"), Dedup.minhashSignature(Dedup.shingleHashSet(col("text"), 3)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Long, b: Long) = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
    assert(agree(1L, 2L) >= Hashing.NumPerms / 2, "near-dups should collide on >= half the perms")
    assert(agree(1L, 3L) <= 2, "unrelated docs should almost never collide")
  }

  test("estimated jaccard is the fraction of agreeing positions") {
    val est = docs.as("a").crossJoin(docs.as("b"))
      .where(col("a.doc_id") === 1 && col("b.doc_id") === 1)
      .select(Dedup.estJaccard(
        Dedup.minhashSignature(Dedup.shingleHashSet(col("a.text"), 3)),
        Dedup.minhashSignature(Dedup.shingleHashSet(col("b.text"), 3))).as("e"))
      .head().getDouble(0)
    assert(est == 1.0, "identical docs estimate jaccard 1.0")
  }

  test("simhash: identical docs have hamming 0, near-dups small, far docs large") {
    val fp = docs
      .select(col("doc_id"), Dedup.simhash(Dedup.shingleHashSet(col("text"), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(1L, 1L) == 0)
    assert(ham(1L, 2L) < ham(1L, 3L), "near-dup hamming below unrelated hamming")
    fp.values.foreach(v => assert(v >= 0L && v < (1L << 32)))
  }

  test("simhash byte-banding has perfect recall at hamming <= 3") {
    // any two 32-bit values within hamming 3 share at least one untouched byte
    val r = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val base = r.nextLong() & 0xffffffffL
      val flipped = (0 until 3).foldLeft(base)((v, _) => v ^ (1L << r.nextInt(32)))
      val bandsA = (0 until 4).map(b => (base >> (8 * b)) & 255L)
      val bandsB = (0 until 4).map(b => (flipped >> (8 * b)) & 255L)
      assert(bandsA.zip(bandsB).exists { case (x, y) => x == y })
    }
  }

  test("simhash64 16-bit banding has perfect recall at hamming <= 3") {
    // any two 64-bit fingerprints (carried as lo/hi halves) within hamming 3
    // share at least one untouched 16-bit band (pigeonhole over 4 bands)
    val r = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val baseLo = r.nextLong() & 0xffffffffL
      val baseHi = r.nextLong() & 0xffffffffL
      var (lo, hi) = (baseLo, baseHi)
      (0 until 3).foreach { _ =>
        val bit = r.nextInt(64)
        if (bit < 32) lo ^= (1L << bit) else hi ^= (1L << (bit - 32))
      }
      def bands(l: Long, h: Long) =
        Seq(l & 65535L, (l >> 16) & 65535L, h & 65535L, (h >> 16) & 65535L)
      assert(bands(baseLo, baseHi).zip(bands(lo, hi)).exists { case (x, y) => x == y })
    }
  }

  test("simhash64 halves decorrelate: hi differs for sets whose lo collides rarely") {
    val fps = docs
      .select(col("doc_id"),
              Dedup.simhashLo(Dedup.shingleHashSet(col("text"), 3)).as("lo"),
              Dedup.simhashHi(Dedup.shingleHashSet(col("text"), 3)).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    fps.foreach { case (lo, hi) =>
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32))
    }
    // the affine remix must actually change the voted bits
    assert(fps.count { case (lo, hi) => lo == hi } == 0)
  }

  test("exact jaccard of identical sets is 1.0 and of disjoint sets is 0.0") {
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"), Seq("x y z", "z z y")))
      .toDF("s1", "s2", "s3")
    val row = df.select(
      Dedup.jaccard(col("s1"), col("s2")).as("same"),
      Dedup.jaccard(col("s1"), col("s3")).as("disj")).head()
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 0.0)
  }

  test("containment catches an embedded document that jaccard misses") {
    // B = A's text verbatim + a long tail: every shingle of A appears in
    // B (containment 1.0) but jaccard collapses with the size gap —
    // exactly the quote/subset-duplication case symmetric dedup misses
    val a = "the quick brown fox jumps over the lazy dog"
    val b = a + " " + (1 to 60).map(i => s"tail$i token$i filler$i").mkString(" ")
    val row = Seq((a, b)).toDF("ta", "tb")
      .select(Dedup.shingleHashSet(col("ta"), 3).as("ha"),
              Dedup.shingleHashSet(col("tb"), 3).as("hb"))
      .select(
        (size(array_intersect(col("ha"), col("hb"))).cast("double") /
          size(col("ha")).cast("double")).as("c_a_in_b"),
        Dedup.jaccard(col("ha"), col("hb")).as("j"))
      .head()
    assert(row.getDouble(0) == 1.0, "A fully contained in B")
    assert(row.getDouble(1) < 0.3, s"jaccard ${row.getDouble(1)} below the dedup threshold")
  }

  test("containment CANDIDATE stage surfaces a short-in-long pair the banding misses") {
    // the recall hole round 5 documented: jaccard < 0.1 makes an r=2
    // minhash band collision unlikely by construction, but the prefix
    // filter's pigeonhole guarantee is unconditional — A's ⌊n/2⌋+1 rarest
    // shingles can't ALL miss B when every shingle of A is in B
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = a + " " + (1 to 150).map(i => s"tail$i token$i filler$i").mkString(" ")
    val planted = Seq((1L, a), (2L, b), (3L, far)).toDF("doc_id", "text")
    val hs = Dedup.shingleHashSets(planted, 3)
    val j = hs.where(col("doc_id") === 1L).select(col("hs").as("ha"))
      .crossJoin(hs.where(col("doc_id") === 2L).select(col("hs").as("hb")))
      .select(Dedup.jaccard(col("ha"), col("hb"))).head().getDouble(0)
    assert(j < 0.1, s"planted pair must be LOW-jaccard (got $j) for the test to bite")
    val cands = graft.queries.DedupQueries.containmentCandidates(hs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)), s"candidate stage must surface the embedded pair; got $cands")
  }

  test("min-label propagation is transitive and separates components") {
    // path component 10-20-30-40 (no direct 10-40 edge: label must travel
    // 3 hops) plus a disjoint pair 100-200 and ids chosen so min != first
    val pairs = Seq((20L, 30L), (10L, 20L), (30L, 40L), (200L, 100L))
      .toDF("doc_a", "doc_b")
    val labels = graft.queries.DedupQueries.propagateMinLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
                         100L -> 100L, 200L -> 100L))
  }

  test("dedup queries run end-to-end on the corpus and find the planted near-dups") {
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
    val ngram = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
    assert(lsh.count() > 0, "corpus has planted near-duplicates")
    assert(ngram.count() > 0)
    // every reported pair estimates above threshold
    assert(lsh.where(col("est_jaccard") < 0.5).count() == 0)
    assert(ngram.where(col("jaccard") < 0.3).count() == 0)
  }

  test("wide est-jaccard of dissimilar docs is near zero (the family actually mixes)") {
    // regression pin for the mod-2^61-1 near-order-preserving family: its
    // rank-correlated "permutations" estimated jaccard ~0.57 on pairs with
    // true jaccard < 0.01, which silently exploded banded candidates at
    // scale. A mixing family must estimate ~j on dissimilar docs.
    val est = docs.as("a").crossJoin(docs.as("b"))
      .where(col("a.doc_id") === 1 && col("b.doc_id") === 3)
      .select(Dedup.estJaccard(
        Dedup.minhashSignature(Dedup.shingleHashSet(col("a.text"), 3), Hashing.NumPermsWide),
        Dedup.minhashSignature(Dedup.shingleHashSet(col("b.text"), 3), Hashing.NumPermsWide),
        Hashing.NumPermsWide).as("e"))
      .head().getDouble(0)
    assert(est <= 0.1, s"disjoint shingle sets must estimate ~0 jaccard, got $est")
  }

  test("char-set-mask ED bound never drops a true ED<=3 pair (sound prefilter)") {
    import spark.implicits._
    // 200 seeded pairs within edit distance <= 3 (random subs/ins/del over
    // a small alphabet); the mask bound is a NECESSARY condition for
    // ED <= 3, so zero pairs may fail it
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 200).map { _ =>
      val a = randStr(8 + rnd.nextInt(25))
      var b = a
      (1 to rnd.nextInt(4)).foreach { _ =>
        val op = rnd.nextInt(3)
        val i = if (b.isEmpty) 0 else rnd.nextInt(b.length)
        b = op match {
          case 0 if b.nonEmpty => b.updated(i, alpha(rnd.nextInt(alpha.length))) // sub
          case 1 => b.take(i) + alpha(rnd.nextInt(alpha.length)) + b.drop(i)     // ins
          case _ if b.nonEmpty => b.take(i) + b.drop(i + 1)                      // del
          case _ => b
        }
      }
      (a, b)
    }
    val df = pairs.toDF("a", "b")
      .select(graft.queries.DedupQueries.charSetMask(col("a")).as("ca"),
              graft.queries.DedupQueries.charSetMask(col("b")).as("cb"))
    val violations = df.where(!graft.queries.DedupQueries.charSetBound(col("ca"), col("cb"))).count()
    assert(violations == 0, s"$violations ED<=3 pairs failed the mask bound - prefilter unsound")
  }

  test("minhash signature index round-trips through parquet (the written-once index)") {
    // the 100-TB story says the signature stage is written to a table once
    // and reused by every downstream pass (dedup_incremental reads it per
    // new batch); this pins that a parquet round-trip preserves signatures
    // bit-exactly, so the stored-index path equals the inline path
    val (sigs, pairs) = graft.queries.DedupQueries.minhashStages(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("sig_index").toString
    sigs.write.mode("overwrite").parquet(s"$dir/signatures.parquet")
    val stored = spark.read.parquet(s"$dir/signatures.parquet")
    assert(stored.count() == sigs.count())
    // bit-exact: anti-join in both directions is empty on (doc_id, sig)
    import org.apache.spark.sql.functions.col
    assert(sigs.join(stored, Seq("doc_id", "sig"), "left_anti").count() == 0)
    assert(stored.join(sigs, Seq("doc_id", "sig"), "left_anti").count() == 0)
    // and the banded pair stage rebuilt FROM the stored index lands on the
    // same candidate set
    import org.apache.spark.sql.functions.{posexplode, col => c}
    val bands = stored.select(c("doc_id"),
      posexplode(graft.dedup.Dedup.bandKeys(c("sig"), 8, graft.functions.Hashing.NumPermsWide))
        .as(Seq("band", "bkey")))
    val rebuilt = bands.as("a")
      .join(bands.as("b"),
            c("a.band") === c("b.band") && c("a.bkey") === c("b.bkey") &&
              c("a.doc_id") < c("b.doc_id"))
      .select(c("a.doc_id").as("doc_a"), c("b.doc_id").as("doc_b"))
      .distinct()
    assert(rebuilt.join(pairs, Seq("doc_a", "doc_b"), "left_anti").count() == 0)
    assert(pairs.join(rebuilt, Seq("doc_a", "doc_b"), "left_anti").count() == 0)
  }
}
