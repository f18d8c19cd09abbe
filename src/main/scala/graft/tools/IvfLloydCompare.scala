package graft.tools

import graft.GraftSession
import graft.queries.SimilarityQueries
import graft.similarity.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement rig for the IVF Lloyd-iteration count: does a second
  * refinement iteration move the recall/cost frontier?
  *
  * For each iteration count it rebuilds the IVF assignment
  * ([[SimilarityQueries.ivfAssignment]] with `iters` = 1, 2, 3), probes
  * IvfProbe cells per query, and grades against exact brute-force top-K —
  * the same instrument `ann_recall` uses in-query — plus the candidate
  * fraction (scored candidates / full-scan candidates, the retrieval cost)
  * and the assignment-stage wall time. One JSON line per (sfdir, iters).
  *
  * Usage: runMain graft.tools.IvfLloydCompare [sfDir] [maxIters]
  */
object IvfLloydCompare {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val maxIters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(threads = 16, appName = "ivf-lloyd-compare")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nQ = SimilarityQueries.NumQueries
    val k = SimilarityQueries.K
    val n = SimilarityQueries.normed(spark, sfDir).persist()
    val corpusN = n.count()

    // exact ground truth: brute-force cosine top-K per query
    val q = n.where(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val truth = n.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
              (Vectors.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
      .persist()
    val truthN = truth.count()

    for (iters <- 1 to maxIters) {
      spark.catalog.clearCache(); n.persist().count(); truth.persist().count()
      val t0 = System.nanoTime()
      val assigned = SimilarityQueries.ivfAssignment(n, SimilarityQueries.IvfProbe, iters).persist()
      assigned.count()
      val tAssign = (System.nanoTime() - t0) / 1e9
      val corpusCells = assigned.where(col("rk") === 1).select(col("vec_id"), col("cid").as("cell"))
      val queryCells = assigned.where(col("vec_id") < nQ)
        .select(col("vec_id").as("query_id"), col("cid").as("cell"))
      val cand = corpusCells.join(broadcast(queryCells), "cell")
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id")).distinct().persist()
      val candN = cand.count()
      val hit = truth.join(cand, Seq("query_id", "vec_id"), "left_semi").count()
      val recall = hit.toDouble / truthN
      val candFrac = candN.toDouble / (nQ.toDouble * (corpusN - 1))
      println(s"""{"metric":"ivf_lloyd","sf":"$sfDir","iters":$iters,"corpus":$corpusN,""" +
        s""""recall_at_$k":$recall,"cand_frac":$candFrac,"assign_sec":$tAssign}""")
      assigned.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
