package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology (each query, each repetition):
  *   - caches cleared BEFORE (queries persist intermediates internally) and
  *     AFTER (so query N's leftover cache/GC pressure can't bleed into
  *     query N+1) — the r1/r2 numbers swung up to 60× on identical code
  *     from exactly that interference;
  *   - forced evaluation is `count + sum(xxhash64(struct(*)))` over ALL
  *     output columns — a bare `.count()` lets Spark prune every projection
  *     the count doesn't need, timing a different (cheaper) plan;
  *   - `reps` repetitions (default 3), reporting the MIN — the
  *     least-interfered observation of a deterministic computation —
  *     PLUS the full per-rep array (`"reps"` field), so a noisy host is
  *     visible in the artifact itself (r4's apparent 77% regression was
  *     host contention that only an out-of-band re-run could disprove);
  *   - repetitions run round-robin ACROSS queries (rep 1 of every query,
  *     then rep 2 of every query, …) so one contention window degrades at
  *     most one rep of each query instead of every rep of a few.
  *
  * Re-check one suspicious query without a full run:
  *   SPARK_GRAFT_BENCH_ONLY=q_price_moments sbt "runMain graft.Bench"
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT and the parquet reader path once so the first
    // timed query doesn't absorb session startup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(10000L)
      .selectExpr("md5(regexp_replace(lower(concat('x ', id)), '\\\\s+', ' ')) AS h")
      .selectExpr("count(distinct h)").collect()
    Tables.load(spark, sfDir, "region").count()

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val t =
        try {
          val df = fn(spark, sfDir)
          df.select(org.apache.spark.sql.functions.struct(
              df.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*).as("s"))
            .selectExpr("count(*) AS n", "bit_xor(xxhash64(s)) AS h")
            .collect()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getMessage}")
          -1.0
        }
      spark.catalog.clearCache()
      t
    }

    // dev-only subset filter (comma-separated names); driver leaves it
    // unset. Blank entries are ignored (an empty-string env var must not
    // silently filter out everything), and an active filter is announced on
    // stderr so a partial bench run is visible.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { f =>
      System.err.println(
        s"[bench] SPARK_GRAFT_BENCH_ONLY is set — PARTIAL run over: ${f.toSeq.sorted.mkString(", ")}")
    }
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // rep-major order: one host-contention window hits at most one rep of
    // each query, so the per-query min stays a clean observation
    val times = scala.collection.mutable.LinkedHashMap(
      named.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    for (r <- 1 to reps; (name, fn) <- named) {
      times(name) = times(name) :+ once(fn)
    }
    val results = named.map { case (name, _) =>
      val ts = times(name)
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val repArrays = named.map { case (name, _) =>
      s"\"" + name + "\":" + times(name).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // failures keep their -1 marker per query but must not shrink the total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repArrays,"sf":"$sfDir"}""")
    spark.stop()
  }
}
