package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.functions._

/** The bucketed-range-join optimizer rule: same rows as the naive plan,
  * different physical join. The rule is session-global once registered, so
  * every test restores the conf to unset.
  */
class RangeJoinRuleSpec extends SparkTestBase {

  private def withWidth[A](w: Option[Long])(body: => A): A = {
    GraftExtensions.register(spark)
    w match {
      case Some(v) => spark.conf.set(RangeJoinRule.WidthConfKey, v.toString)
      case None    => spark.conf.unset(RangeJoinRule.WidthConfKey)
    }
    try body
    finally spark.conf.unset(RangeJoinRule.WidthConfKey)
  }

  /** events ts joined into 7-day windows derived from orders — no equi key. */
  private def naiveRangeJoin = {
    val o = Tables.orders(spark, sf)
    val windows = o.where(pmod(col("o_orderkey"), lit(97)) === 0)
      .select(col("o_orderkey").as("window_id"),
              col("o_orderdate").as("w_start"),
              (col("o_orderdate") + expr("INTERVAL '7' DAY")).as("w_end"))
    val points = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate"))
    points.join(windows,
      col("l_shipdate") >= col("w_start") && col("l_shipdate") < col("w_end"))
  }

  test("rule rewrites an inequality-only join into an equi-join on the bucket") {
    withWidth(Some(7L * 24 * 3600)) {
      val plan = naiveRangeJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
             s"nested-loop join survived the rewrite:\n$plan")
      assert(plan.contains("__graft_range_bucket"), s"no bucket key in plan:\n$plan")
    }
  }

  test("rewritten join returns exactly the naive join's rows") {
    val naive = withWidth(None) {
      val plan = naiveRangeJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
             s"baseline unexpectedly not nested-loop:\n$plan")
      naiveRangeJoin.collect().map(_.toString).sorted
    }
    val rewritten = withWidth(Some(7L * 24 * 3600)) {
      naiveRangeJoin.collect().map(_.toString).sorted
    }
    assert(naive.nonEmpty, "test join must produce rows")
    assert(rewritten.toSeq == naive.toSeq, "row sets differ")
  }

  test("rewrite is exact for negatives, degenerate intervals, and width straddles") {
    import spark.implicits._
    // points and intervals around zero, a lo > hi interval, and intervals
    // that straddle bucket boundaries at W = 10
    val points = Seq(-25L, -11L, -10L, -1L, 0L, 1L, 9L, 10L, 15L, 99L)
      .toDF("p").withColumn("pid", col("p"))
    val intervals = Seq(
      (1L, -30L, -10L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 8L, 12L),
      (5L, 20L, 10L), // degenerate: must match nothing, not crash
      (6L, -100L, 100L)
    ).toDF("iid", "lo", "hi")
    def join() = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = withWidth(None)(join())
    val rewritten = withWidth(Some(10L))(join())
    assert(naive.nonEmpty && rewritten == naive)
  }

  test("rewrite is exact on 200 random intervals across random widths (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val points = Seq.fill(300)(rnd.nextLong() % 1000L).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val intervals = Seq.fill(200) {
      val a = rnd.nextLong() % 1000L
      val b = a + rnd.nextInt(120) - 10 // some degenerate (lo > hi)
      (a, b)
    }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")
    def join() = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = withWidth(None)(join())
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1000L, 1000000L)) {
      val rewritten = withWidth(Some(w))(join())
      assert(rewritten == naive, s"width $w drifted")
    }
  }

  test("an interval wider than maxBucketsPerInterval fails fast with both conf names") {
    import spark.implicits._
    val points = Seq(5L, 500L).toDF("p")
    // one sane interval plus one open-end-sentinel-style outlier: 100001
    // buckets at W = 1 — without the guard this would explode 100k rows
    val intervals = Seq((1L, 0L, 10L), (2L, 0L, 100000L)).toDF("iid", "lo", "hi")
    def join() = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
    withWidth(Some(1L)) {
      spark.conf.set(RangeJoinRule.MaxBucketsConfKey, "1000")
      try {
        val ex = intercept[Exception](join().collect())
        val msg = Option(ex.getMessage).getOrElse("") + Option(ex.getCause).map(_.getMessage).getOrElse("")
        assert(msg.contains(RangeJoinRule.MaxBucketsConfKey) && msg.contains(RangeJoinRule.WidthConfKey),
               s"guard message must name both confs, got: $msg")
        // raising the limit clears the failure and the rows are exact
        spark.conf.set(RangeJoinRule.MaxBucketsConfKey, "200000")
        val rows = join().select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(rows == Seq((5L, 1L), (5L, 2L), (500L, 2L)))
      } finally spark.conf.unset(RangeJoinRule.MaxBucketsConfKey)
    }
  }

  test("NULL interval bounds drop the row under the guard, matching the naive join") {
    import spark.implicits._
    // the SCD2 open-end encoding: NULL lo / NULL hi rows. The range
    // predicate itself drops them (NULL comparison), so the rewrite must
    // too — and the max-buckets guard must NOT RaiseError on the NULL
    // nBuckets (If treats a NULL predicate as false → the error branch).
    val points = Seq(5L, 15L, 500L).toDF("p")
    val intervals = Seq(
      (1L, Some(0L), Some(10L)),     // sane
      (2L, None, Some(10L)),         // NULL lo
      (3L, Some(0L), None),          // NULL hi (open-ended sentinel)
      (4L, Option.empty[Long], Option.empty[Long]) // both NULL
    ).toDF("iid", "lo", "hi")
    def join() = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = withWidth(None)(join())
    assert(naive == Seq((5L, 1L)), s"naive baseline unexpected: $naive")
    withWidth(Some(1L)) {
      // tight guard limit: NULL bounds must flow through as NULL, not trip it
      spark.conf.set(RangeJoinRule.MaxBucketsConfKey, "100")
      try {
        val rewritten = join()
        assert(rewritten == naive, s"NULL-bound rows diverged: $rewritten vs $naive")
      } finally spark.conf.unset(RangeJoinRule.MaxBucketsConfKey)
    }
  }

  test("rule leaves joins with a null-safe equi key alone") {
    withWidth(Some(86400L)) {
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
      val j = l.join(o, col("l_orderkey") <=> col("o_orderkey") &&
                        col("l_shipdate") >= col("o_orderdate"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_range_bucket"),
             s"rule rewrote a join Catalyst could already hash-join (<=> key):\n$plan")
    }
  }

  test("rule leaves joins with an existing equi key alone") {
    withWidth(Some(86400L)) {
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey") &&
                        col("l_shipdate") >= col("o_orderdate"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_range_bucket"),
             s"rule touched an equi-keyed join:\n$plan")
    }
  }
}
