package graft

import graft.functions.Udafs
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class UdafSpec extends SparkTestBase {

  import spark.implicits._

  test("weighted mean matches hand arithmetic and is partition-insensitive") {
    val data = Seq((1.0, 1.0), (3.0, 3.0), (10.0, 0.0))
    val expected = (1.0 * 1.0 + 3.0 * 3.0 + 10.0 * 0.0) / (1.0 + 3.0 + 0.0)
    val wm = udaf(Udafs.WeightedMean)
    for (parts <- Seq(1, 4)) {
      val df = data.toDF("x", "w").repartition(parts)
      val got = df.select(wm(col("x"), col("w")).as("m")).head().getDouble(0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("weighted mean over zero total weight yields NaN") {
    val wm = udaf(Udafs.WeightedMean)
    val got = Seq((5.0, 0.0)).toDF("x", "w")
      .select(wm(col("x"), col("w"))).head().getDouble(0)
    assert(got.isNaN)
  }

  test("aggregators register into SQL and group correctly") {
    spark.udf.register("wmean", udaf(Udafs.WeightedMean))
    Tables.events(spark, sf).createOrReplaceTempView("udaf_events")
    val rows = spark.sql(
      """SELECT event_type, wmean(value, CAST(1.0 AS DOUBLE)) AS m, AVG(value) AS a
        |FROM udaf_events GROUP BY event_type""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
             "unit-weight weighted mean == AVG")
    }
  }

  test("TopKByScore equals the window top-k formulation and is partition-insensitive") {
    import org.apache.spark.sql.expressions.Window
    // deterministic scored set with duplicate cosines (exercises the
    // vec_id tiebreak) across 3 query groups
    val scored = spark.range(300).select(
      (col("id") % 3).as("query_id"),
      col("id").as("vec_id"),
      concat(lit("l"), col("id") % 5).as("label"),
      ((col("id") * 37 % 11) / lit(10.0)).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    val viaWindow = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 7)
      .select("query_id", "vec_id", "label", "rank", "cosine")
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 8)) {
      val viaAgg = scored.repartition(parts)
        .as[Udafs.QueryHit]
        .groupByKey(_.query_id)
        .agg(Udafs.TopKByScore(7).toColumn.name("tops"))
        .flatMap { case (qid, tops) =>
          tops.iterator.zipWithIndex.map { case (t, i) =>
            (qid, t.vec_id, t.label, (i + 1).toLong, t.cosine)
          }
        }
        .toDF("query_id", "vec_id", "label", "rank", "cosine")
        .collect().map(_.toSeq).toSet
      assert(viaAgg == viaWindow, s"parts=$parts")
    }
  }

  test("MinKByHash equals the window row_number formulation and is partition-insensitive") {
    import org.apache.spark.sql.expressions.Window
    // strata with duplicate hashes (exercises the doc_id tiebreak)
    val docs = spark.range(400).select(
      concat(lit("s"), col("id") % 3).as("source"),
      concat(lit("l"), col("id") % 2).as("lang"),
      col("id").as("doc_id"),
      (col("id") * 31 % 17).as("h"))
    val w = Window.partitionBy("source", "lang").orderBy(col("h").asc, col("doc_id").asc)
    val viaWindow = docs
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= 5)
      .select("source", "lang", "doc_id", "sample_rank", "h")
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 8)) {
      val viaAgg = docs.repartition(parts)
        .as[Udafs.StratumDoc]
        .groupByKey(d => (d.source, d.lang))
        .agg(Udafs.MinKByHash(5).toColumn.name("picked"))
        .flatMap { case ((source, lang), picked) =>
          picked.iterator.zipWithIndex.map { case (p, i) =>
            (source, lang, p.doc_id, (i + 1).toLong, p.h)
          }
        }
        .toDF("source", "lang", "doc_id", "sample_rank", "h")
        .collect().map(_.toSeq).toSet
      assert(viaAgg == viaWindow, s"parts=$parts")
    }
  }

  test("MinKLong equals sorted-distinct-take-k, is partition-insensitive, and composes") {
    // duplicate-heavy stream: id*31 mod 97 yields repeats across groups
    val rows = spark.range(500).select(
      concat(lit("g"), col("id") % 2).as("grp"),
      (col("id") * 31 % 97).as("h"))
    val expected = rows.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).distinct.sorted.take(7).toSeq).toMap
    for (parts <- Seq(1, 8)) {
      val got = rows.repartition(parts)
        .as[Udafs.KeyedHash]
        .groupByKey(_.grp).mapValues(_.h)
        .agg(Udafs.MinKLong(7).toColumn.name("sketch"))
        .collect().toMap
      assert(got == expected, s"parts=$parts")
    }
    // composability: the union sketch is the trim of the member sketches'
    // concatenation — the identity q_kmv_overlap relies on
    val unionExpected = rows.collect().map(_.getLong(1)).distinct.sorted.take(7).toSeq
    val composed = (expected("g0") ++ expected("g1")).distinct.sorted.take(7)
    assert(composed == unionExpected)
  }

  test("MisraGries honors the heavy-hitter guarantee under any partitioning") {
    // skewed stream: three dominant terms well above N/(k+1), a graded
    // mid-tail below it, and singleton noise
    val rows = Seq.fill(10000)("mega0") ++ Seq.fill(6000)("mega1") ++
      Seq.fill(5000)("mega2") ++
      (0 until 50).flatMap(i => Seq.fill((i + 1) * i)(s"t$i")) ++
      (0 until 500).map(i => s"noise$i")
    val n = rows.length.toLong
    val k = 16
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustFind = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(mustFind.nonEmpty, "test stream must contain guaranteed heavy hitters")
    for (parts <- Seq(1, 7)) {
      val summary = spark.createDataset(rows)(Encoders.STRING)
        .repartition(parts)
        .select(Udafs.MisraGries(k).toColumn.name("s"))
        .head()
      assert(summary.size <= k, s"parts=$parts: at most k counters")
      assert(mustFind.subsetOf(summary.keySet.toSet),
             s"parts=$parts: guaranteed items missing: ${mustFind.diff(summary.keySet.toSet)}")
      // undercount bound: reported <= exact, exact - reported <= N/(k+1)
      summary.foreach { case (t, c) =>
        assert(c <= exact(t), s"parts=$parts: $t overcounted")
        assert(exact(t) - c <= n / (k + 1) + 1, s"parts=$parts: $t undercounted too far")
      }
    }
  }

  test("MisraGriesKeyed summarizes each group's stream independently") {
    // two groups with different dominants — a per-group summary must find
    // each group's own heavy hitter with that group's own N
    val rows = Seq.fill(2000)(("g1", "alpha")) ++ Seq.fill(100)(("g1", "beta")) ++
      Seq.fill(1500)(("g2", "gamma")) ++ (0 until 300).map(i => ("g2", s"noise$i"))
    val k = 8
    for (parts <- Seq(1, 6)) {
      val summaries = spark.createDataset(rows)
        .repartition(parts)
        .groupByKey(_._1)
        .agg(Udafs.MisraGriesKeyed(k).toColumn.name("s"))
        .collect().toMap
      assert(summaries("g1").contains("alpha"), s"parts=$parts")
      assert(summaries("g2").contains("gamma"), s"parts=$parts")
      assert(!summaries("g1").contains("gamma"),
             s"parts=$parts: group streams must not bleed")
      summaries.values.foreach(s => assert(s.size <= k))
    }
  }

  test("TermCountTopK equals the per-group window top-k and is partition-insensitive") {
    import org.apache.spark.sql.expressions.Window
    // duplicate counts (exercises the term tiebreak) across 3 groups
    val counted = spark.range(120).select(
      concat(lit("g"), col("id") % 3).as("source"),
      concat(lit("term"), col("id")).as("term"),
      (col("id") * 13 % 9 + 1).as("n_exact"))
    val w = Window.partitionBy("source").orderBy(col("n_exact").desc, col("term").asc)
    val viaWindow = counted
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select("source", "term", "n_exact")
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 8)) {
      val viaAgg = counted.repartition(parts)
        .as[(String, String, Long)]
        .groupByKey(_._1)
        .agg(Udafs.TermCountTopK(5).toColumn.name("top"))
        .flatMap { case (g, top) => top.iterator.map { case (t, n) => (g, t, n) } }
        .toDF("source", "term", "n_exact")
        .collect().map(_.toSeq).toSet
      assert(viaAgg == viaWindow, s"parts=$parts")
    }
  }

  test("typed aggregation on Dataset with LongMin") {
    val ds = spark.range(100).map(i => (i % 3, i + 7)).toDF("k", "v").as[(Long, Long)]
    val got = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(Udafs.LongMin.toColumn.name("minv"))
      .collect().toMap
    // mapped before aggregation: min of (i+7) per residue class
    assert(got == Map(0L -> 7L, 1L -> 8L, 2L -> 9L))
  }
}
