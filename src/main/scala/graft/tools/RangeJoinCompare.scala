package graft.tools

import graft.{GraftExtensions, GraftSession, Tables}
import graft.functions.Money
import graft.plans.RangeJoinRule
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured comparison (the IvfLloydCompare pattern): the keyless interval
  * join `q_range_join_auto` runs with the rule OFF (Spark's native plan — a
  * BroadcastNestedLoopJoin scanning |points|·|windows| pairs) vs ON (the
  * bucketed equi-join rewrite).
  *
  * Both arms aggregate to the same per-window rollup and the run asserts
  * the two results are IDENTICAL before reporting times — a speedup with
  * drifted values would be disqualifying, not impressive. The expected
  * shape: nested-loop work is points × windows, the rewrite's is
  * shuffle + points × (buckets-per-window ≈ 2 at W = window length), so
  * the ratio should grow linearly with the window count — the sf0.1 corpus
  * (~600k lineitem points × ~1.5k windows ≈ 10⁹ comparisons) is already
  * deep in the regime where the nested loop loses.
  *
  * Usage: runMain graft.tools.RangeJoinCompare [sfDir] [reps]
  */
object RangeJoinCompare {

  private def joined(spark: SparkSession, dir: String) = {
    val windows = Tables.orders(spark, dir)
      .where(pmod(col("o_orderkey"), lit(97)) === 0)
      .select(col("o_orderkey").as("window_id"),
              col("o_orderdate").as("w_start"),
              (col("o_orderdate") + expr("INTERVAL '7' DAY")).as("w_end"))
    val points = Tables.lineitem(spark, dir)
      .select(col("l_shipdate"), Money.cents(col("l_extendedprice")).as("cents"))
    points.join(windows,
        col("l_shipdate") >= col("w_start") && col("l_shipdate") < col("w_end"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).cast("long").as("n_hits"),
           sum(col("cents")).cast("long").as("sum_cents"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(threads = 16, appName = "range-join-compare")
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def run(width: Option[Long]): (Double, Array[String]) = {
      width match {
        case Some(w) => spark.conf.set(RangeJoinRule.WidthConfKey, w.toString)
        case None    => spark.conf.unset(RangeJoinRule.WidthConfKey)
      }
      try {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = joined(spark, dir).collect()
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, rows.map(_.toString).sorted)
      } finally spark.conf.unset(RangeJoinRule.WidthConfKey)
    }

    val w = 7L * 24 * 3600
    // plan sanity up front: the two arms really are different joins
    spark.conf.set(RangeJoinRule.WidthConfKey, w.toString)
    val planOn = joined(spark, dir).queryExecution.executedPlan.toString
    spark.conf.unset(RangeJoinRule.WidthConfKey)
    val planOff = joined(spark, dir).queryExecution.executedPlan.toString
    require(planOn.contains("__graft_range_bucket"), "rule did not fire")
    require(planOff.contains("BroadcastNestedLoopJoin") || planOff.contains("CartesianProduct"),
            "baseline is not a nested-loop join")

    // rep-major interleave, min-of-reps (the ScaleStress methodology)
    var tOff = Vector.empty[Double]; var tOn = Vector.empty[Double]
    var rowsOff: Array[String] = null; var rowsOn: Array[String] = null
    for (r <- 1 to reps) {
      val (a, ra) = run(None);   tOff :+= a; rowsOff = ra
      val (b, rb) = run(Some(w)); tOn :+= b; rowsOn = rb
      println(f"[range-join-compare] rep $r/$reps naive=$a%8.3fs rewritten=$b%8.3fs")
    }
    require(rowsOff.nonEmpty && rowsOff.sameElements(rowsOn),
            "rewritten arm drifted from the naive result")
    val (bOff, bOn) = (tOff.min, tOn.min)
    println(f"[range-join-compare] naive(BNLJ)=$bOff%.3fs rewritten(bucketed)=$bOn%.3fs " +
      f"speedup=${bOff / bOn}%.2fx rows=${rowsOff.length} (values identical)")
    println(s"""{"metric":"range_join_compare","sf":"$dir","naive_sec":$bOff,""" +
      s""""rewritten_sec":$bOn,"speedup":${bOff / bOn},"rows":${rowsOff.length},"identical":true}""")
    spark.stop()
  }
}
