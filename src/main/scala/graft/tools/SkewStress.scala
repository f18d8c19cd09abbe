package graft.tools

import graft.GraftSession
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Skew-stress rig: measures the salted-join path (`q_skew_join`'s
  * operator) against a PLANTED hot key — 50% of all fact rows carry
  * user_id 0 — at base and `factor`× sizes. The engine claim under test:
  * salting keeps the hot key's shuffle parallelism at `salt` instead of 1,
  * so wall time grows ≤ linearly with volume even though half the table
  * shares one key. An unsalted plain join is timed alongside for contrast
  * (not part of the pass criterion — AQE's runtime skew splitting also
  * helps it; the salted path must stand on its own).
  *
  * Pass criterion (same as ScaleStress): wall(scaled) ≤ wall(base) ×
  * factor × Slack, min over rep-major repetitions.
  *
  * Usage: runMain graft.tools.SkewStress [baseRows] [factor] [workDir]
  */
object SkewStress {

  val Slack: Double = 1.5
  val Salt: Int = 8

  def main(args: Array[String]): Unit = {
    val baseRows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val workDir = args.lift(2).getOrElse("/tmp/graft_skew_stress")
    val spark = GraftSession.local(threads = 16, appName = "skew-stress")
    spark.sparkContext.setLogLevel("WARN")

    // synthesize: every even row id hits the single hot key 0; odd rows
    // spread uniformly over baseRows/10 cold keys (constant key density
    // across scales, so the dim side grows linearly like a real dimension)
    def synth(n: Long, out: String): Unit =
      spark.range(n)
        .select(
          when(pmod(col("id"), lit(2)) === 0, lit(0L))
            .otherwise(pmod(xxhash64(col("id")), lit(baseRows / 10)) + 1).as("user_id"),
          pmod(col("id"), lit(1000)).cast("double").as("value"))
        .repartition(32).write.mode("overwrite").parquet(out)
    synth(baseRows, s"$workDir/base")
    synth(baseRows * factor, s"$workDir/scaled")
    val hotShare = spark.read.parquet(s"$workDir/scaled")
      .agg(avg(when(col("user_id") === 0, 1.0).otherwise(0.0))).head().getDouble(0)
    println(f"[skew-stress] base=$baseRows%d factor=$factor%d hot-key share=${hotShare}%.3f")

    def timeOnce(dir: String, salted: Boolean): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ev = spark.read.parquet(dir)
      val dim = ev.select(col("user_id")).distinct()
        .withColumn("segment", concat(lit("seg"), pmod(col("user_id"), lit(5))))
      val joined =
        if (salted) SkewJoin.saltedJoin(ev, dim, "user_id", Salt)
        else ev.join(dim, "user_id")
      joined.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        .collect()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_STRESS_REPS", "2").toInt
    val cells = Seq(("salted", s"$workDir/base"), ("salted", s"$workDir/scaled"),
                    ("plain", s"$workDir/base"), ("plain", s"$workDir/scaled"))
    val times = scala.collection.mutable.LinkedHashMap(cells.map(c => c -> Vector.empty[Double]): _*)
    for (r <- 1 to reps; cell <- cells) {
      val t = timeOnce(cell._2, cell._1 == "salted")
      times(cell) = times(cell) :+ t
      val side = if (cell._2.endsWith("base")) "base" else "scaled"
      println(f"[skew-stress] rep $r/$reps ${cell._1}%-7s $side%-6s $t%8.3fs")
      System.out.flush()
    }
    def best(mode: String, dir: String): Double = times((mode, dir)).min
    val sBase = best("salted", s"$workDir/base")
    val sScaled = best("salted", s"$workDir/scaled")
    val pBase = best("plain", s"$workDir/base")
    val pScaled = best("plain", s"$workDir/scaled")
    val ratio = sScaled / sBase
    val ok = ratio <= factor * Slack
    println(f"[skew-stress] salted base=$sBase%8.3fs scaled=$sScaled%8.3fs ratio=$ratio%6.2fx " +
      (if (ok) "PASS" else f"FAIL (> ${factor * Slack}%.1fx)"))
    println(f"[skew-stress] plain  base=$pBase%8.3fs scaled=$pScaled%8.3fs ratio=${pScaled / pBase}%6.2fx (contrast only)")
    println(s"""{"metric":"skew_stress","base_rows":$baseRows,"factor":$factor,"salt":$Salt,""" +
      s""""hot_share":$hotShare,"salted_base_sec":$sBase,"salted_scaled_sec":$sScaled,""" +
      s""""salted_ratio":$ratio,"plain_base_sec":$pBase,"plain_scaled_sec":$pScaled,"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
