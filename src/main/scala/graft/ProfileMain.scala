package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: times one named query (arg 1) at an SF dir
  * (arg 2), printing the physical plan. Dev tool, not part of the driver
  * contract.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    if (name == "_stages") {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val toks = docs.select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      time("tokens")(toks.select(sum(size(col("toks")))).collect())
      val shn = toks.select(col("doc_id"), graft.text.TextAnalysis.shinglesOf(col("toks"), 3).as("shn"))
      time("shingles")(shn.select(sum(size(col("shn")))).collect())
      val hs = shn.select(col("doc_id"), array_distinct(transform(col("shn"), s => graft.functions.Hashing.h32(s))).as("hs"))
      time("hashes")(hs.select(sum(size(col("hs")))).collect())
      val sig = hs.where(size(col("hs")) > 0)
        .select(col("doc_id"), graft.dedup.Dedup.minhashSignature(col("hs")).as("sig"))
      time("signature")(sig.select(sum(element_at(col("sig"), 1))).collect())
      sig.explain("formatted")
      spark.stop(); return
    }
    if (name == "_lsh") {
      import org.apache.spark.sql.functions._
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
      }
      val docs = Tables.documents(spark, sfDir)
      val sigs = graft.dedup.Dedup.shingleHashSets(docs, 3)
        .select(col("doc_id"), graft.dedup.Dedup.minhashSignature(col("hs")).as("sig"))
        .persist()
      sigs.explain("formatted")
      time("sigs materialize")(sigs.count())
      val bands = sigs.select(col("doc_id"), posexplode(graft.dedup.Dedup.bandKeys(col("sig"), 2)).as(Seq("band", "bkey")))
      time("bands")(bands.count())
      val pairs = bands.as("a")
        .join(bands.as("b"),
              col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
                col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      time("pairs")(pairs.count())
      val fin = pairs
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), graft.dedup.Dedup.estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .where(col("est_jaccard") >= lit(0.5))
      time("final")(fin.count())
      time("final again")(fin.count())
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"run $i: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
