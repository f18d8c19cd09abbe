package graft.tools

/** Dev harness: run ONE named query from [[graft.SparkEntry.queries]]
  * against a testdata dir and dump the result to parquet, for ad-hoc
  * DuckDB-side comparison without a full Verify pass.
  *
  * Usage: runMain graft.tools.OneQueryDump <name> <sfDir> <outDir>
  */
object OneQueryDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = graft.GraftSession.local()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(out)
    println(s"DUMPED $name -> $out")
    spark.stop()
  }
}
