package graft

import java.security.MessageDigest

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Pipeline-operator semantics that the DuckDB oracle alone can't pin:
  * chunk-coverage invariants, an independent Scala re-derivation of a chunk
  * content hash, stratified-sample quota/determinism, and the quantized
  * retrieval grade's bounds.
  */
class PipelineSpec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_chunk_documents covers every token exactly with stride-spaced full chunks") {
    val C = PipelineQueries.ChunkTokens
    val S = PipelineQueries.ChunkStride
    val chunks = run("q_chunk_documents")
      .select("doc_id", "chunk_idx", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(chunks.nonEmpty)
    // independent token counts straight off the table
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.foreach { case (docId, cs) =>
      val byIdx = cs.sortBy(_._2)
      val m = byIdx.length
      assert(byIdx.map(_._2).toSeq == (0L until m).toSeq, s"doc $docId: contiguous chunk_idx")
      byIdx.dropRight(1).foreach { case (_, i, len) =>
        assert(len == C, s"doc $docId chunk $i: non-final chunks are full")
      }
      val (_, _, lastLen) = byIdx.last
      assert(lastLen > 0 && lastLen <= C, s"doc $docId: final chunk in (0, C]")
      // last chunk ends exactly at the token count: full coverage, no spill
      assert((m - 1).toLong * S + lastLen == nTok(docId), s"doc $docId: coverage")
    }
    // every doc with at least one token is chunked
    assert(chunks.keySet == nTok.filter(_._2 > 0).keySet)
  }

  test("q_chunk_documents chunk hashes match an independent Scala slice+md5") {
    val C = PipelineQueries.ChunkTokens
    val S = PipelineQueries.ChunkStride
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("q_chunk_documents")
      .where(col("doc_id").isin(docs.keys.toSeq: _*))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3))
      .toMap
    val md = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (docId, text) =>
      val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
      val n = toks.length
      if (n > 0) {
        val m = 1 + ((math.max(n - C, 0) + S - 1) / S)
        for (i <- 0 until m) {
          val slice = toks.slice(i * S, math.min(i * S + C, n))
          assert(got.get((docId, i.toLong)).contains(md5hex(slice.mkString(" "))),
                 s"doc $docId chunk $i content hash")
        }
        assert(!got.contains((docId, m.toLong)), s"doc $docId: no chunk beyond $m")
      }
    }
  }

  test("q_stratified_sample keeps at most SampleK per stratum with contiguous ranks, deterministically") {
    val k = PipelineQueries.SampleK
    def snapshot() = run("q_stratified_sample").collect().map(_.toSeq).toSet
    val first = snapshot()
    assert(first == snapshot(), "byte-identical across runs")
    val perStratum = first.toSeq.groupBy(r => (r(0), r(1)))
    val sizes = Tables.documents(spark, sf)
      .groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(perStratum.keySet.map { case (s, l) => (s.asInstanceOf[String], l.asInstanceOf[String]) } ==
           sizes.keySet, "every stratum sampled")
    perStratum.foreach { case (key, rows) =>
      val expected = math.min(k.toLong,
        sizes((key._1.asInstanceOf[String], key._2.asInstanceOf[String])))
      assert(rows.length.toLong == expected, s"stratum $key quota")
      assert(rows.map(_(3).asInstanceOf[Long]).sorted == (1L to expected), s"stratum $key ranks")
    }
  }

  test("q_weighted_sample conserves pointers exactly and picks weight-proportionally") {
    val k = PipelineQueries.WsK.toLong
    val picks = run("q_weighted_sample")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every pointer lands in exactly one document interval
    assert(picks.map(_._3).sum == k, "total picks = WsK")
    // weight-proportionality: n_picks within ±1 of the exact share k·w/total
    val total = Tables.documents(spark, sf)
      .agg(sum(col("n_chars"))).head().getLong(0)
    picks.foreach { case (docId, w, n) =>
      val share = k * w / total
      assert(n >= share - 1 && n <= share + 1, s"doc $docId: $n vs $share")
    }
    // deterministic across re-runs (hash-free systematic scheme)
    val again = run("q_weighted_sample")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(picks.toSeq == again.toSeq)
  }

  test("q_bm25_search favors the rare query term and returns a full top-K") {
    import graft.queries.TextQueries
    val rows = run("q_bm25_search").collect()
    assert(rows.length == TextQueries.Bm25TopK)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "descending score order")
    assert(scores.forall(s => !s.isNaN && s > 0.0), "positive finite scores")
    // idf semantics: every top doc must contain the rare term ("dup",
    // df≈25/500) — its idf dwarfs the common terms' (df≈390/500), so a
    // doc without it cannot out-score docs that have it
    val topIds = rows.map(_.getLong(0)).toSet
    val withDup = Tables.documents(spark, sf)
      .where(col("doc_id").isin(topIds.toSeq: _*))
      .select(col("doc_id"),
              size(filter(graft.text.TextAnalysis.tokens(col("text")),
                          t => t === "dup")).as("tf"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(withDup.values.forall(_ > 0),
           s"top-K contains docs without the rare term: $withDup")
  }

  test("ann_quantized_recall is bounded and near-exact on the test corpus") {
    val rows = run("ann_quantized_recall").collect()
    assert(rows.length == 10, "one row per query vector")
    rows.foreach { r =>
      val hits = r.getLong(1)
      val recall = r.getDouble(2)
      assert(hits >= 0 && hits <= 10)
      assert(recall == hits.toDouble / 10.0)
    }
    // int8 keeps ~7 significant bits per component: top-10 cosine retrieval
    // should survive nearly intact — a collapse below 0.7 mean recall means
    // the quantizer (not the corpus) broke
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean >= 0.7, s"mean recall@10 $mean")
  }

  test("substring cuts: a copied paragraph is cut in both docs, unique text is not") {
    import spark.implicits._
    // 20-token shared paragraph (>= CutL=15) embedded in two docs at
    // different offsets; doc 3 is all-unique and must not appear
    val para = (1 to 20).map(i => s"shared$i").mkString(" ")
    val d1 = "alpha beta gamma " + para + " " + (1 to 30).map(i => s"u1t$i").mkString(" ")
    val d2 = (1 to 10).map(i => s"u2t$i").mkString(" ") + " " + para
    val d3 = (1 to 40).map(i => s"u3t$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    spark.catalog.dropTempView("__subcut_docs__") // no-op if absent
    val outDir = java.nio.file.Files.createTempDirectory("subcut").toString
    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val out = SparkEntry.queries("q_substring_cuts")(spark, outDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.contains(1L) && out.contains(2L), "both copy-holders are cut")
    assert(!out.contains(3L), "unique doc is untouched")
    // doc 1: paragraph occupies tokens 3..22 => every CutL-window inside
    // it is shared; the merged range must cover exactly those tokens
    assert(out(1L).getAs[String]("ranges_str") == "3-22")
    assert(out(2L).getAs[String]("ranges_str") == "10-29")
    assert(out(1L).getAs[Long]("n_cut_tokens") == 20L)
  }

  test("q_quality_topp matches a sequential greedy fold over the bucket histogram") {
    val out = run("q_quality_topp").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("q_cut_bucket"), r.getAs[Long]("n_docs_kept"),
         r.getAs[Long]("tokens_kept"), r.getAs[Long]("tokens_total"),
         r.getAs[Long]("kept_permille"))).toMap
    assert(out.nonEmpty)
    // independent sequential re-derivation: collect the (source, bucket,
    // n_tokens) rows and run the greedy rule as a plain fold — validates
    // the window+join machinery against the definition
    val s = graft.text.TextAnalysis.qualitySignals(col("text")).toMap
    val rows = Tables.documents(spark, sf)
      .select(col("source"), s("n_tokens").as("nt"),
              floor(s("quality_score") * PipelineQueries.QtBuckets).cast("long").as("b"))
      .where(col("nt") > 0L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("b"), r.getAs[Long]("nt")))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val hist = rs.groupBy(_._2).view
        .mapValues(g => (g.map(_._3).sum, g.size.toLong)).toMap
      val total = hist.values.map(_._1).sum
      var cumBefore = 0L
      var kept = (0L, 0L) // (tokens, docs)
      var cut = Long.MaxValue
      hist.keys.toSeq.sorted(Ordering[Long].reverse).foreach { b =>
        val (btok, bdocs) = hist(b)
        if (cumBefore * 1000 < total * PipelineQueries.TopPermille) {
          kept = (kept._1 + btok, kept._2 + bdocs); cut = b
        }
        cumBefore += btok
      }
      val (cutB, nKept, tokKept, tokTotal, permille) = out(src)
      assert(cutB == cut, s"$src cut bucket")
      assert(nKept == kept._2 && tokKept == kept._1, s"$src kept counts")
      assert(tokTotal == total, s"$src total")
      assert(permille == tokKept * 1000 / tokTotal && permille >= PipelineQueries.TopPermille,
             s"$src permille $permille")
    }
  }

  test("q_shard_balance conserves tokens and stays within the serpentine bound") {
    val out = run("q_shard_balance").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
                 r.getAs[Long]("shard_tokens"), r.getAs[Long]("load_permille")))
    assert(out.map(_._1).sorted.toSeq == (0L until PipelineQueries.NShards).toSeq,
           "every shard populated exactly once")
    val docs = Tables.documents(spark, sf)
      .select(graft.text.TextAnalysis.wsTokenCount(col("text")).cast("long").as("nt"))
      .collect().map(_.getLong(0))
    assert(out.map(_._2).sum == docs.length, "every doc assigned")
    assert(out.map(_._3).sum == docs.sum, "token conservation")
    // serpentine over size-sorted docs bounds shard spread by one block's
    // internal spread, which is at most the largest document
    val spread = out.map(_._3).max - out.map(_._3).min
    assert(spread <= docs.max, s"spread $spread vs max doc ${docs.max}")
  }
}
