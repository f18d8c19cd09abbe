package graft

import graft.functions.Money
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Specs for the round-14 surface: VARIANT ingestion parity, the shared
  * cluster-assignment landing, and dynamic-gap session windows.
  */
class Round14Spec extends SparkTestBase {

  test("variant path computes the identical rollup to the string-JSON path") {
    val events = Tables.events(spark, sf)
    def rollup(kLong: org.apache.spark.sql.Column,
               kStr: org.apache.spark.sql.Column) =
      events
        .select(col("event_type"), col("value"), kLong.as("k"), kStr.as("k_str"))
        .groupBy(col("event_type"), pmod(col("k"), lit(10)).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
             Money.lsum(Money.cents(col("value"))).as("sum_value_cents"),
             max(col("k")).as("max_k"),
             max(length(col("k_str"))).cast("long").as("max_k_len"))
        .orderBy(col("event_type"), col("k_bucket"))
        .collect().map(_.toSeq).toSeq
    val v = parse_json(col("props"))
    val variantPath = rollup(variant_get(v, "$.k", "long"),
                             variant_get(v, "$.k", "string"))
    val stringPath = rollup(get_json_object(col("props"), "$.k").cast("long"),
                            get_json_object(col("props"), "$.k"))
    assert(variantPath.nonEmpty)
    assert(variantPath == stringPath,
      "parse_json + variant_get must agree with the get_json_object path")
  }

  test("variant extractions share ONE parse in the optimized plan") {
    val parsed = Tables.events(spark, sf)
      .select(parse_json(col("props")).as("v"))
      .select(variant_get(col("v"), "$.k", "long").as("a"),
              variant_get(col("v"), "$.k", "string").as("b"))
    val plan = parsed.queryExecution.optimizedPlan.toString
    val needle = "VariantExpressionEvalUtils.parseJson"
    assert(plan.sliding(needle.length).count(_ == needle) == 1,
      s"CollapseProject must not duplicate the non-cheap parse:\n$plan")
  }

  test("cluster-landing reuse returns the exact computed assignment") {
    val computed = DedupQueries.clusterLabels(spark, sf, reuseLanding = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the compute call above landed the assignment; a reuse call must now
    // serve the identical map from the landing
    val reused = DedupQueries.clusterLabels(spark, sf, reuseLanding = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(computed.nonEmpty)
    assert(reused == computed, "landed assignment drifted from the computed one")
  }

  test("star CC agrees with min-label propagation on hand graphs") {
    import spark.implicits._
    // two components (a 4-chain and a triangle) + the pair order scrambled
    val pairs = Seq((4L, 3L), (2L, 1L), (3L, 2L), (10L, 12L), (11L, 10L), (12L, 11L))
      .toDF("doc_a", "doc_b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = toMap(DedupQueries.propagateStarLabels(pairs))
    val minl = toMap(DedupQueries.propagateMinLabels(pairs)
      .where(col("doc_id") =!= col("label")))
    assert(star == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 11L -> 10L, 12L -> 10L))
    assert(star == minl, "the two CC algorithms must produce identical non-root labels")
  }

  test("star CC converges on a 300-node chain within its O(log n) round bound") {
    import spark.implicits._
    // a 300-chain has diameter 299: min-label would need ~299 sweeps, the
    // star alternation's own require(iters <= 30) enforces the log bound
    val chain = (2L to 300L).map(i => (i, i - 1)).toDF("doc_a", "doc_b")
    val labels = DedupQueries.propagateStarLabels(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 299)
    assert(labels.forall(_._2 == 1L),
      "every chain node must label to the component minimum")
  }

  test("dynamic-gap session window: a long-gap event type extends the session") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    // purchase at t0 carries a 60-min gap, so the view at t0+40 merges;
    // under the static 30-min gap the same pair is two sessions
    val ev = Seq(
      (1L, ts(0), "purchase"),
      (1L, ts(40), "view")
    ).toDF("user_id", "ts", "event_type")
    val dyn = ev.groupBy(col("user_id"),
        session_window(col("ts"),
          when(col("event_type") === "purchase", lit("60 minutes"))
            .otherwise(lit("30 minutes"))).as("w"))
      .agg(count(lit(1)).as("n")).collect()
    assert(dyn.length == 1 && dyn.head.getAs[Long]("n") == 2L,
      s"dynamic gap must merge the pair into one session; got ${dyn.toSeq}")
    val static = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n")).collect()
    assert(static.length == 2,
      s"static 30-min gap must split the pair; got ${static.toSeq}")
  }
}
