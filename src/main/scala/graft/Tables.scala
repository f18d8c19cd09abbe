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

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    loadRanged(spark, sfDir, table)

  /** [[load]] plus an optional coarse event-time range on one timestamp
    * column, applied to the RAW column *before* any conversion.
    *
    * Why this exists: nano-encoded columns go through a computed
    * nanos→TIMESTAMP_NTZ projection, so a filter on the converted column
    * can never reach the parquet scan — at 100 TB that forfeits
    * row-group/page pruning on the fact table's time axis, the single most
    * important pushdown there is. For those columns the raw-space long
    * bounds here are padded by one second to a strict superset (truncation
    * can't produce false negatives) and push down as ordinary long-column
    * filters; natively-typed timestamp columns get direct (inclusive,
    * still-superset) bounds, which Spark pushes as-is. Either way the
    * caller keeps its exact predicate for semantics.
    */
  def loadRanged(
      spark: SparkSession,
      sfDir: String,
      table: String,
      rangeCol: Option[String] = None,
      notBefore: Option[java.time.LocalDateTime] = None,
      notAfter: Option[java.time.LocalDateTime] = None
  ): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$table.parquet")
    val nanoCols = nanoTimestampCols.getOrElse(table, Nil).toSet
    def nanosOf(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + t.getNano
    val ranged = rangeCol match {
      case Some(c) if raw.schema(c).dataType == LongType && nanoCols.contains(c) =>
        val padNanos = 1000000000L // 1 s superset padding
        val lo = notBefore.map(t => col(c) >= lit(nanosOf(t) - padNanos))
        val hi = notAfter.map(t => col(c) <= lit(nanosOf(t) + padNanos))
        (lo.toSeq ++ hi.toSeq).foldLeft(raw)(_ filter _)
      case Some(c) if raw.schema(c).dataType == TimestampNTZType ||
          raw.schema(c).dataType == TimestampType =>
        val target = raw.schema(c).dataType
        val lo = notBefore.map(t => col(c) >= lit(t).cast(target))
        val hi = notAfter.map(t => col(c) <= lit(t).cast(target))
        (lo.toSeq ++ hi.toSeq).foldLeft(raw)(_ filter _)
      case _ => raw
    }
    val cols = ranged.schema.fields.map { f =>
      if (nanoCols.contains(f.name) && f.dataType == LongType)
        // integer nanos -> integer micros (truncating div, not double div:
        // a double round-trip would lose precision above 2^53 nanos)
        timestamp_micros(expr(s"${f.name} div 1000"))
          .cast(TimestampNTZType).as(f.name)
      else if (f.dataType == TimestampType)
        col(f.name).cast(TimestampNTZType).as(f.name)
      else col(f.name)
    }
    ranged.select(cols.toIndexedSeq: _*)
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
