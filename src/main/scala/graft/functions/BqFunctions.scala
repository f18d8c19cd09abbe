package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Column-level implementations of the reference's BigQuery SQL semantics.
  *
  * Everything here is built from codegen'd Catalyst expressions (`coalesce`,
  * `try_to_timestamp`, `to_timestamp`) — no Scala UDF opacity, so predicate
  * pushdown and whole-stage codegen survive around these calls.
  */
object BqFunctions {

  /** The five lenient parse formats of the reference's `parse_datetime`
    * (/root/reference/models/udf/function/parse_datetime.sql:10-14), in
    * evaluation order.
    */
  val parseDatetimeFormats: Seq[String] = Seq(
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%Y-%m-%dT%H:%M:%E*SZ"
  )

  /** `SAFE.PARSE_DATETIME(fmt, s)`: NULL on mismatch instead of error.
    * Spark's `try_to_timestamp` has the same whole-string-match semantics;
    * the cast to `TIMESTAMP_NTZ` is wall-clock-preserving under the pinned
    * UTC session timezone (BigQuery DATETIME is zoneless).
    */
  def safeParseDatetime(s: Column, bqFormat: String): Column =
    try_to_timestamp(s, lit(BqDateFormat.toSpark(bqFormat)))
      .cast(TimestampNTZType)

  /** Strict `PARSE_DATETIME(fmt, s)`: runtime error on mismatch (requires
    * ANSI mode, which is Spark 4's default — matches BigQuery).
    */
  def parseDatetimeStrict(s: Column, bqFormat: String): Column =
    to_timestamp(s, BqDateFormat.toSpark(bqFormat))
      .cast(TimestampNTZType)

  /** The reference's `parse_datetime` UDF
    * (/root/reference/models/udf/function/parse_datetime.sql:9-16): first
    * match among five lenient formats; if none matches, the final strict arm
    * raises. Catalyst's `Coalesce` is lazy left-to-right, so the strict arm
    * is only evaluated when every SAFE arm returned NULL — the load-bearing
    * short-circuit called out in SURVEY.md §2 O7.
    */
  def parseDatetime(s: Column): Column = {
    val lenient = parseDatetimeFormats.map(f => safeParseDatetime(s, f))
    val strict = parseDatetimeStrict(s, parseDatetimeFormats.head)
    coalesce(lenient :+ strict: _*)
  }

  /** SQL-text body of the same function, for `CREATE FUNCTION` registration
    * through the materializer (the SQL twin of [[parseDatetime]]).
    */
  def parseDatetimeSqlBody(arg: String): String = {
    // Spark patterns quote literals with single quotes ('T', 'Z'); double
    // them to survive embedding in a SQL string literal.
    def q(f: String): String = BqDateFormat.toSpark(f).replace("'", "''")
    val lenient = parseDatetimeFormats.map { f =>
      s"CAST(try_to_timestamp($arg, '${q(f)}') AS TIMESTAMP_NTZ)"
    }
    val strict =
      s"CAST(to_timestamp($arg, '${q(parseDatetimeFormats.head)}') AS TIMESTAMP_NTZ)"
    (lenient :+ strict).mkString("COALESCE(\n    ", ",\n    ", "\n  )")
  }

  /** DuckDB oracle expression for the same chain (used by SparkEntry's
    * oracle SQL): `try_strptime` arms in the same order, strict `strptime`
    * last. `%E*S` expands to two DuckDB variants.
    */
  def parseDatetimeDuckDbExpr(arg: String): String = {
    val arms = parseDatetimeFormats.flatMap(BqDateFormat.toDuckDbVariants).map {
      f => s"try_strptime($arg, '$f')"
    }
    val strict = s"strptime($arg, '${parseDatetimeFormats.head}')"
    (arms :+ strict).mkString("COALESCE(", ", ", ")")
  }

  /** SAFE whole-chain variant: NULL when every lenient arm fails, no strict
    * raise — lets the strict-semantics gate (`udf_parse_strict`) COUNT the
    * unparseable rows without tripping the error it is there to prove.
    */
  def parseDatetimeSafe(s: Column): Column =
    coalesce(parseDatetimeFormats.map(f => safeParseDatetime(s, f)): _*)

  /** DuckDB twin of [[parseDatetimeSafe]]. */
  def parseDatetimeSafeDuckDbExpr(arg: String): String =
    parseDatetimeFormats.flatMap(BqDateFormat.toDuckDbVariants)
      .map(f => s"try_strptime($arg, '$f')")
      .mkString("COALESCE(", ", ", ")")
}
