package graft.queries

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import graft.functions.Hashing
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Deduplication queries over the `documents` corpus: exact, MinHash+LSH,
  * SimHash, and blocked exact n-gram Jaccard. All follow the same
  * scale-shape: a map-only per-document signature stage, an equi-join on
  * banding keys for candidates (ids + keys only through the shuffle), and
  * an id-join back to signatures for verification — never text through a
  * shuffle, never an O(n²) comparison.
  */
object DedupQueries {

  private val ShingleK = 3

  val defs: Seq[QueryDef] = Seq(

    // exact dedup: group by normalized-content hash
    QueryDef(
      "dedup_exact",
      (spark, dir) => {
        GraftSession.tune(spark)
        Tables.documents(spark, dir)
          .groupBy(TextAnalysis.contentHash(col("text")).as("content_md5"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      },
      Some(s"""SELECT ${TextAnalysis.contentHashSql("text")} AS content_md5,
              |       COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
              |FROM documents GROUP BY 1""".stripMargin)
    ),

    // MinHash signatures + banded LSH: near-dup pairs with estimated
    // jaccard >= 0.5 (16 perms, 8 bands of 2 => P(candidate) = 1-(1-j^2)^8)
    QueryDef(
      "dedup_minhash_lsh",
      (spark, dir) => {
        GraftSession.tune(spark)
        spark.catalog.clearCache() // queries run sequentially; drop stale persists
        val docs = Tables.documents(spark, dir)
        // Staged projections, then persist. The stages matter: each binds an
        // intermediate array ONCE per row before the next stage's lambdas
        // fan out over it — inlining instead re-evaluates the upstream
        // expression per lambda element / per permutation (measured 280s →
        // 3s at sf0.1). The persist then shares the signatures across both
        // sides of the band self-join and both verification join-backs. At
        // 100 TB this stage is written to a signatures table once.
        val sigs = Dedup.shingleHashSets(docs, ShingleK)
          .select(col("doc_id"), Dedup.minhashSignature(col("hs")).as("sig"))
          .persist()
        // eager: materialize ONCE before the plan fans out — the 4 cache
        // references (band self-join sides + verification join-backs)
        // otherwise race and each recomputes the signature pipeline
        sigs.count()
        val bands = sigs.select(col("doc_id"),
                                posexplode(Dedup.bandKeys(col("sig"), 2)).as(Seq("band", "bkey")))
        val pairs = bands.as("a")
          .join(bands.as("b"),
                col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
                  col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        pairs
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
                  Dedup.estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
          .where(col("est_jaccard") >= lit(0.5))
      },
      Some {
        val hs = Dedup.shingleHashSetSql("text", ShingleK)
        s"""WITH hs AS (
           |  SELECT doc_id, $hs AS hs FROM documents
           |), sigs AS (
           |  SELECT doc_id, ${Dedup.minhashSignatureSql("hs")} AS sig FROM hs WHERE len(hs) > 0
           |), bands AS (
           |  SELECT doc_id, b, (${Dedup.bandKeysSql("sig", 2)})[b + 1] AS bkey
           |  FROM sigs CROSS JOIN (SELECT unnest(range(0, ${Hashing.NumPerms / 2})) AS b) bs
           |), pairs AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |)
           |SELECT doc_a, doc_b, est_jaccard FROM (
           |  SELECT p.doc_a, p.doc_b,
           |         ${Dedup.estJaccardSql("sa.sig", "sb.sig")} AS est_jaccard
           |  FROM pairs p
           |  JOIN sigs sa ON sa.doc_id = p.doc_a
           |  JOIN sigs sb ON sb.doc_id = p.doc_b
           |) WHERE est_jaccard >= CAST(0.5 AS DOUBLE)""".stripMargin
      }
    ),

    // SimHash: 32-bit majority fingerprint over shingle hashes; byte-banded
    // blocking (perfect recall for hamming <= 3 by pigeonhole); pairs within
    // hamming distance 3
    QueryDef(
      "dedup_simhash",
      (spark, dir) => {
        GraftSession.tune(spark)
        spark.catalog.clearCache() // queries run sequentially; drop stale persists
        val docs = Tables.documents(spark, dir)
        val fps = Dedup.shingleHashSets(docs, ShingleK)
          .select(col("doc_id"), Dedup.simhash(col("hs")).as("sh"))
          .persist() // referenced by both sides of the band self-join
        fps.count() // eager (see dedup_minhash_lsh)
        val bands = fps.select(col("doc_id"), col("sh"),
                               posexplode(Dedup.simhashBands(col("sh"))).as(Seq("band", "bval")))
        bands.as("a")
          .join(bands.as("b"),
                col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
                  col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
                  col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
          .distinct()
          .select(col("doc_a"), col("doc_b"), Dedup.hamming(col("sh_a"), col("sh_b")).as("hamming"))
          .where(col("hamming") <= 3)
      },
      Some {
        s"""WITH hset AS (
           |  SELECT doc_id, ${Dedup.shingleHashSetSql("text", ShingleK)} AS hs FROM documents
           |), fp AS (
           |  SELECT doc_id, ${Dedup.simhashSql("hs")} AS sh FROM hset WHERE len(hs) > 0
           |), bands AS (
           |  SELECT doc_id, sh, b, (${Dedup.simhashBandsSql("sh")})[b + 1] AS bval
           |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs
           |), pairs AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
           |  FROM bands a JOIN bands b
           |    ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id
           |)
           |SELECT doc_a, doc_b, hamming FROM (
           |  SELECT doc_a, doc_b, ${Dedup.hammingSql("sh_a", "sh_b")} AS hamming FROM pairs
           |) WHERE hamming <= 3""".stripMargin
      }
    ),

    // fuzzy (edit-distance) matching: brand-blocked part-name pairs within
    // levenshtein 3, rolled up as a distance histogram. The block key turns
    // the O(n²) comparison into per-brand groups — the schema-matching /
    // entity-resolution shape.
    QueryDef(
      "dedup_fuzzy_names",
      (spark, dir) => {
        GraftSession.tune(spark)
        val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_name"))
        p.as("a")
          .join(p.as("b"),
                col("a.p_brand") === col("b.p_brand") && col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_brand").as("p_brand"),
                  levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("distance"))
          .where(col("distance") <= 3)
          .groupBy(col("p_brand"), col("distance"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""SELECT a.p_brand, CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance,
             |       COUNT(*) AS n_pairs
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |WHERE levenshtein(a.p_name, b.p_name) <= 3
             |GROUP BY 1, 2""".stripMargin)
    ),

    // blocked exact n-gram Jaccard: 16 single-row LSH bands for candidates
    // (recall 1-(1-j)^16), then exact set jaccard >= 0.3 on shingle sets
    QueryDef(
      "dedup_ngram_jaccard",
      (spark, dir) => {
        GraftSession.tune(spark)
        spark.catalog.clearCache() // queries run sequentially; drop stale persists
        val docs = Tables.documents(spark, dir)
        // persist both stages: `sigs` feeds the band self-join (2 refs) and
        // `sh` the exact-jaccard join-backs (2 refs) — shingling + hashing
        // must run once, not four times
        // staged binding (tokens → shingles → hashes → signature); `sh`
        // persists for the exact-jaccard join-backs, `sigs` for the bands
        val sh = docs
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .where(size(col("toks")) >= ShingleK) // pre-projection filter: see Dedup.shingleHashSets
          .select(col("doc_id"), array_distinct(TextAnalysis.shinglesOf(col("toks"), ShingleK)).as("sh"))
          .persist()
        val sigs = sh
          .select(col("doc_id"), array_distinct(transform(col("sh"), s => Hashing.h32(s))).as("hs"))
          .select(col("doc_id"), Dedup.minhashSignature(col("hs")).as("sig"))
          .persist()
        sigs.count() // eager: materializes sh too (see dedup_minhash_lsh)
        val bands = sigs.select(col("doc_id"), posexplode(col("sig")).as(Seq("band", "bval")))
        val pairs = bands.as("a")
          .join(bands.as("b"),
                col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
                  col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        pairs
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"), Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
          .where(col("jaccard") >= lit(0.3))
      },
      Some {
        s"""WITH sh AS (
           |  SELECT doc_id, list_distinct(${TextAnalysis.shinglesSql("text", ShingleK)}) AS sh
           |  FROM documents
           |), sh2 AS (
           |  SELECT doc_id, sh, list_distinct(list_transform(sh, s -> ${Hashing.h32Sql("s")})) AS hs
           |  FROM sh WHERE len(sh) > 0
           |), sigs AS (
           |  SELECT doc_id, sh, ${Dedup.minhashSignatureSql("hs")} AS sig FROM sh2
           |), bands AS (
           |  SELECT doc_id, b, sig[b + 1] AS bval
           |  FROM sigs CROSS JOIN (SELECT unnest(range(0, ${Hashing.NumPerms})) AS b) bs
           |), pairs AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id
           |)
           |SELECT doc_a, doc_b, jaccard FROM (
           |  SELECT p.doc_a, p.doc_b, ${Dedup.jaccardSql("sa.sh", "sb.sh")} AS jaccard
           |  FROM pairs p
           |  JOIN sigs sa ON sa.doc_id = p.doc_a
           |  JOIN sigs sb ON sb.doc_id = p.doc_b
           |) WHERE jaccard >= CAST(0.3 AS DOUBLE)""".stripMargin
      }
    )
  )
}
