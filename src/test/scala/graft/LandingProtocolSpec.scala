package graft

import graft.queries.DedupQueries

/** The land-once marker protocol under the failure ADVICE r15 flagged:
  * a PARTIALLY deleted landing (some part files removed, at least one
  * left) must recompute, never be served as the full table. The marker
  * records key + row count; reuse re-checks the landed count against it
  * (parquet-footer-only), so any of {stale key, deleted landing, partial
  * landing, row-count drift} falls back to a fresh computation.
  */
class LandingProtocolSpec extends SparkTestBase {

  test("a partially deleted signature landing recomputes instead of serving a subset") {
    // first call lands the table and writes the key+count marker
    val full = DedupQueries.landedSignatures(spark, sf, recompute = false)
    val fullCount = full.count()
    assert(fullCount > 0)
    // a warm second call serves the landing (same count)
    assert(DedupQueries.landedSignatures(spark, sf, recompute = false).count() == fullCount)
    // sabotage: delete SOME part files but leave at least one — the
    // pre-r16 existence check would have served the remainder as complete
    val tgt = new java.io.File(
      graft.queries.StorageQueries.target("dedup_signatures_land"))
    val parts = Option(tgt.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assume(parts.length >= 2,
      s"landing wrote ${parts.length} part file(s) — cannot stage a partial deletion")
    parts.drop(1).foreach(f => assert(f.delete(), s"could not delete $f"))
    val partialCount = spark.read.parquet(tgt.getAbsolutePath).count()
    assert(partialCount < fullCount, "deletion did not actually shrink the landing")
    // the protocol must notice the count mismatch and recompute the FULL table
    val recovered = DedupQueries.landedSignatures(spark, sf, recompute = false)
    assert(recovered.count() == fullCount,
      s"reuse served $partialCount of $fullCount rows — the partial landing " +
      "was treated as complete")
    // and the re-landed marker is consistent again: another reuse is warm + full
    assert(DedupQueries.landedSignatures(spark, sf, recompute = false).count() == fullCount)
  }

  test("a stale marker key recomputes") {
    DedupQueries.landedSignatures(spark, sf, recompute = false).count()
    val marker = new java.io.File(
      graft.queries.StorageQueries.target("dedup_signatures_land_MARKER"))
    java.nio.file.Files.write(marker.toPath, "some-other-key\n42".getBytes("UTF-8"))
    val n = DedupQueries.landedSignatures(spark, sf, recompute = false).count()
    assert(n > 0)
    // the recompute re-landed under the CURRENT key
    val rewritten = new String(
      java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
    assert(!rewritten.startsWith("some-other-key"), "marker was not refreshed")
    assert(rewritten.endsWith(n.toString), s"marker count drifted: $rewritten vs $n")
  }
}
