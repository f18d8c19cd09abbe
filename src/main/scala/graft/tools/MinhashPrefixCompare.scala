package graft.tools

import graft.GraftSession
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Measured comparison (the IvfLloydCompare pattern): est-jaccard over the
  * FULL 128-perm signature vs a 32-perm PREFIX, under the same 16×8 wide
  * banding.
  *
  * Why it might win: banding needs all 128 signature entries (that width is
  * what bought the ×100 scale pass), but the est-jaccard verification that
  * follows reads the signature per CANDIDATE PAIR — each permutation is an
  * unbiased Bernoulli(j) estimator, so a 32-entry prefix is a valid
  * estimate at a quarter of the per-pair comparisons, recovering the
  * pre-widening verification cost. Why it might lose: 4× the variance
  * (σ = √(j(1−j)/32) ≈ 0.088 at j = 0.5 vs 0.044 at 128), which moves
  * borderline pairs across the 0.5 emission threshold in both directions.
  *
  * Graded on (a) wall time of the full pair pipeline, (b) emission recall
  * against the exact-jaccard ≥ 0.5 truth arm (`dedup_minhash_recall`'s
  * instrument — must stay 1.0 or the prefix is disqualified regardless of
  * speed), and (c) emitted-pair count drift (precision proxy: pairs the
  * wider estimate would have rejected).
  *
  * Usage: runMain graft.tools.MinhashPrefixCompare [sfDir] [reps]
  */
object MinhashPrefixCompare {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(threads = 16, appName = "minhash-prefix-compare")
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(estPerms: Int): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = DedupQueries.minhashPairsSpark(spark, dir, estPerms)
      df.select(struct(df.columns.map(col).toIndexedSeq: _*).as("s"))
        .selectExpr("count(*) AS n", "bit_xor(xxhash64(s)) AS h")
        .collect()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }

    val variants = Seq(128, 32)
    val times = scala.collection.mutable.Map(variants.map(_ -> Vector.empty[Double]): _*)
    // rep-major, same as graft.Bench: one contention window costs at most
    // one rep of each variant
    for (r <- 1 to reps; v <- variants) {
      val t = timeOnce(v)
      times(v) = times(v) :+ t
      println(f"[minhash-prefix] rep $r/$reps estPerms=$v%-4d $t%8.3fs")
      System.out.flush()
    }

    // recall + emitted-count arms (not timed; truth persists across both)
    spark.catalog.clearCache()
    val truth = DedupQueries.minhashTruthPairs(spark, dir).persist()
    val nTrue = truth.count()
    val grades = variants.map { v =>
      val emitted = DedupQueries.minhashPairsSpark(spark, dir, v)
        .select(col("doc_a"), col("doc_b")).persist()
      val nEmit = emitted.count()
      val nHit = truth.join(emitted, Seq("doc_a", "doc_b"), "left_semi").count()
      val recall = nHit.toDouble / nTrue.toDouble
      println(f"[minhash-prefix] estPerms=$v%-4d emitted=$nEmit%6d truth=$nTrue%4d hit=$nHit%4d recall=$recall%.4f")
      emitted.unpersist()
      v -> (nEmit, recall)
    }.toMap

    val t128 = times(128).min
    val t32 = times(32).min
    val r128 = grades(128)._2
    val r32 = grades(32)._2
    // the prefix must keep emission recall at the incumbent's level AND
    // actually be faster to displace it
    val prefixWins = r32 >= r128 && t32 < t128 * 0.95
    println(s"""{"metric":"minhash_prefix_compare","sf":"$dir","reps":$reps,""" +
      s""""full_sec":$t128,"prefix_sec":$t32,""" +
      s""""full_emitted":${grades(128)._1},"prefix_emitted":${grades(32)._1},""" +
      s""""full_recall":$r128,"prefix_recall":$r32,"prefix_wins":$prefixWins}""")
    spark.stop()
  }
}
