package graft.queries

import graft.{GraftSession, Tables}
import graft.functions.Money
import org.apache.spark.sql.functions._

/** Storage-lifecycle queries: sink + source capabilities exercised INSIDE
  * the driver's correctness gate rather than only in specs. The write
  * targets live under java.io.tmpdir (never the read-only testdata).
  */
object StorageQueries {

  /** Per-process sink root. A fixed shared path raced when two driver JVMs
    * ran concurrently (Verify and Bench, or parallel CI jobs): one
    * overwrites while the other reads, producing flaky oracle mismatches —
    * and a stale dir owned by another user fails the write outright. Unique
    * per JVM, reused across reps within it (mode=overwrite keeps reps
    * idempotent), best-effort removed on exit.
    */
  private lazy val sinkRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_sink_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }
    p
  }

  private def target(name: String): String =
    sinkRoot.resolve(name).toAbsolutePath.toString

  val defs: Seq[QueryDef] = Seq(

    // partitioned parquet sink + partition-pruned re-read, oracle-checked:
    // documents are written partitioned BY SOURCE (the layout a corpus
    // store actually uses — per-source ingestion, per-source deletes), then
    // re-read with a two-source filter that Spark satisfies by PRUNING
    // PARTITIONS (the filter binds to the partition column, so non-matching
    // directories are never listed or scanned — at 100 TB that is the
    // difference between reading 2 sources and reading 20), and aggregated.
    // The oracle computes the same rollup straight from the ORIGINAL table:
    // a sink that drops/duplicates/mangles rows, or a pruned read that
    // misses a partition, hash-mismatches. Partition values round-trip
    // through directory names, which is exactly the encode/decode path the
    // capability claims. Rewrites its target each run (overwrite), so
    // repeated Verify/Bench invocations are idempotent.
    QueryDef(
      "q_partitioned_sink",
      (spark, dir) => {
        GraftSession.tune(spark)
        val tgt = target("partitioned_sink")
        Tables.documents(spark, dir)
          .write.mode("overwrite").partitionBy("source").parquet(tgt)
        spark.read.parquet(tgt)
          .where(col("source").isin("src0", "src3"))
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(length(col("text"))).cast("long").as("n_chars"))
      },
      Some("""SELECT source, lang, COUNT(*) AS n_docs,
             |       CAST(SUM(length(text)) AS BIGINT) AS n_chars
             |FROM documents
             |WHERE source IN ('src0', 'src3')
             |GROUP BY 1, 2""".stripMargin)
    ),

    // CTAS-shaped sink lifecycle on the lineitem fact: a filtered
    // projection is written to parquet (the materialized-datamart shape,
    // O10's CREATE TABLE AS SELECT on a fact table), re-read, and
    // aggregated with exact integer cents. The oracle recomputes from the
    // source table, so the round-trip must preserve every row and value
    // bit-exactly — including the decimal-to-cents conversion surviving a
    // write/read cycle.
    QueryDef(
      "q_ctas_roundtrip",
      (spark, dir) => {
        GraftSession.tune(spark)
        val tgt = target("ctas_roundtrip")
        Tables.lineitem(spark, dir)
          .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz"))
          .select(col("l_orderkey"), col("l_returnflag"),
                  Money.cents(col("l_extendedprice")).as("price_cents"))
          .write.mode("overwrite").parquet(tgt)
        spark.read.parquet(tgt)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
               sum(col("price_cents")).cast("long").as("sum_price_cents"),
               countDistinct(col("l_orderkey")).cast("long").as("n_orders"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n_rows,
              |       CAST(SUM(${Money.centsSql("l_extendedprice")}) AS BIGINT) AS sum_price_cents,
              |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              |GROUP BY 1""".stripMargin)
    )
  )
}
