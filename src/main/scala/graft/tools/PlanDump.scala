package graft.tools

/** Dev harness for the optimization rounds: dump `explain("formatted")` for
  * named queries to files (plans/rNN/<query>_<tag>.txt), under the same
  * session shape the bench uses (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus), so plan claims in OPTIMIZATION_r*.md are
  * reproducible artifacts rather than prose.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <sfDir> <name> [name...]
  *
  * NOTE: building a QueryDef can have side effects (landing sink files;
  * streaming gates RUN their stream and return the sink readback, so their
  * dumped plan is the readback's — still the honest "what the bench times
  * last", but the stream's own plan is in the checkpoint's offsets/metadata,
  * not here).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus,2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
      println(s"PLAN $name -> $p")
    }
    spark.stop()
  }
}
