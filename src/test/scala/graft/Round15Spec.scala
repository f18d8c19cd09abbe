package graft

import graft.queries.{DedupQueries, StorageQueries}
import org.apache.spark.sql.functions._

/** Specs for the round-15 surface: the shared minhash-signature landing
  * (including the missing-data-behind-intact-marker recovery the landing
  * caches now guarantee), and the variant-shredding storage parity.
  */
class Round15Spec extends SparkTestBase {

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  test("signature-landing reuse returns the exact computed signature table") {
    val computed = DedupQueries.landedSignatures(spark, sf, recompute = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the compute call above landed the table; a reuse call must now serve
    // the identical signatures from the landing
    val reused = DedupQueries.landedSignatures(spark, sf, recompute = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(computed.nonEmpty)
    assert(reused == computed, "landed signatures drifted from the computed ones")
  }

  test("a deleted landing behind an intact marker recomputes instead of failing") {
    // seed the landing + marker
    DedupQueries.landedSignatures(spark, sf, recompute = true).count()
    val tgt = new java.io.File(StorageQueries.target("dedup_signatures_land"))
    val marker = new java.io.File(StorageQueries.target("dedup_signatures_land_MARKER"))
    assert(marker.isFile, "landing marker missing after a landing write")
    rmTree(tgt)
    assert(!tgt.exists)
    // the stale-marker path must fall through to recompute + re-land, not
    // throw an AnalysisException on the vanished parquet
    val n = DedupQueries.landedSignatures(spark, sf, recompute = false).count()
    assert(n > 0)
    assert(tgt.exists, "recovery path did not re-land the signatures")
    // same contract for the cluster landing (the r14 ADVICE fix)
    DedupQueries.clusterLabels(spark, sf, reuseLanding = false).count()
    val ctgt = new java.io.File(StorageQueries.target("dedup_clusters_land"))
    rmTree(ctgt)
    val m = DedupQueries.clusterLabels(spark, sf, reuseLanding = true).count()
    assert(m > 0)
  }

  test("shredded and unshredded variant storage read back identical extractions") {
    val src = Tables.events(spark, sf)
      .select(col("event_id"), parse_json(col("props")).as("v"))
    val plain = StorageQueries.target("spec_variant_plain")
    val shred = StorageQueries.target("spec_variant_shred")
    src.write.mode("overwrite").parquet(plain)
    GraftSession.withConfs(spark,
      "spark.sql.variant.writeShredding.enabled" -> "true",
      "spark.sql.variant.inferShreddingSchema" -> "true") {
      src.write.mode("overwrite").parquet(shred)
    }
    def extract(path: String) = spark.read.parquet(path)
      .select(col("event_id"), variant_get(col("v"), "$.k", "long").as("k"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val a = extract(plain)
    val b = extract(shred)
    assert(a.nonEmpty)
    assert(a == b, "shredded storage changed extraction results")
  }
}
