package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Two schema normalizations happen here so every operator downstream sees
  * clean types:
  *
  *   1. The testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS,false).
  *      Spark cannot read that type natively, so we read nanos as longs
  *      (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
  *      `TIMESTAMP_NTZ` — exactly what DuckDB does on the oracle side
  *      (TIMESTAMP_NS -> TIMESTAMP truncates).
  *   2. Any plain `TIMESTAMP` column is cast to `TIMESTAMP_NTZ` (session tz is
  *      pinned UTC so the wall clock is preserved). Zoneless civil time is the
  *      engine-wide convention, mirroring BigQuery DATETIME in the reference
  *      (/root/reference/models/datamart/schema.yml:10).
  *
  * The conversions are plain Column expressions, so they stay inside
  * whole-stage codegen and do not block parquet filter/column pushdown on the
  * untouched columns.
  */
object Tables {

  /** Columns persisted as INT64 nano timestamps, per table. */
  private val nanoTimestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate")
  )

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$table.parquet")
    val nanoCols = nanoTimestampCols.getOrElse(table, Nil).toSet
    val cols = raw.schema.fields.map { f =>
      if (nanoCols.contains(f.name) && f.dataType == LongType)
        // integer nanos -> integer micros (truncating div, not double div:
        // a double round-trip would lose precision above 2^53 nanos)
        timestamp_micros(expr(s"${f.name} div 1000"))
          .cast(TimestampNTZType).as(f.name)
      else if (f.dataType == TimestampType)
        col(f.name).cast(TimestampNTZType).as(f.name)
      else col(f.name)
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
