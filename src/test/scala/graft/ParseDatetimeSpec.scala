package graft

import graft.functions.BqFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import java.time.LocalDateTime

class ParseDatetimeSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(ss: String*): Seq[LocalDateTime] =
    ss.toDF("s")
      .select(BqFunctions.parseDatetime(col("s")).as("dt"))
      .collect()
      .map(_.getAs[LocalDateTime]("dt"))
      .toSeq

  test("each of the five format arms parses") {
    val got = parse(
      "2023/01/01 12:00:00",
      "2023/01/01",
      "2023-01-01 12:00:00",
      "2023-01-01",
      "2023-01-01T12:00:00.123456Z"
    )
    assert(got(0) == LocalDateTime.of(2023, 1, 1, 12, 0, 0))
    assert(got(1) == LocalDateTime.of(2023, 1, 1, 0, 0, 0))
    assert(got(2) == LocalDateTime.of(2023, 1, 1, 12, 0, 0))
    assert(got(3) == LocalDateTime.of(2023, 1, 1, 0, 0, 0))
    assert(got(4) == LocalDateTime.of(2023, 1, 1, 12, 0, 0, 123456000))
  }

  test("%E*S accepts 0, 3 and 6 fractional digits") {
    val got = parse(
      "2023-01-01T12:00:00Z",
      "2023-01-01T12:00:00.5Z",
      "2023-01-01T12:00:00.123Z"
    )
    assert(got(0) == LocalDateTime.of(2023, 1, 1, 12, 0, 0))
    assert(got(1) == LocalDateTime.of(2023, 1, 1, 12, 0, 0, 500000000))
    assert(got(2) == LocalDateTime.of(2023, 1, 1, 12, 0, 0, 123000000))
  }

  test("the reference's documented example: parse_datetime('2023/01/01 12:00:00')") {
    // /root/reference/models/udf/schema.yml:10-12
    assert(parse("2023/01/01 12:00:00").head == LocalDateTime.of(2023, 1, 1, 12, 0))
  }

  test("strict final arm: unparseable input raises, not NULL") {
    // port of parse_datetime.sql:15 — BigQuery PARSE_DATETIME errors
    val e = intercept[Exception] {
      Seq("not a date").toDF("s").select(BqFunctions.parseDatetime(col("s"))).collect()
    }
    assert(e.toString.toLowerCase.contains("time") || e.getCause != null)
  }

  test("result type is zoneless TIMESTAMP_NTZ (BigQuery DATETIME)") {
    val df = Seq("2023-01-01").toDF("s").select(BqFunctions.parseDatetime(col("s")).as("dt"))
    assert(df.schema("dt").dataType == TimestampNTZType)
  }

  test("whole-string match: prefix formats do not fire on longer strings") {
    // '2023/01/01 12:00:00' must NOT be claimed by the date-only '%Y/%m/%d' arm
    assert(parse("2023/01/01 12:00:00").head.getHour == 12)
  }

  test("SQL UDF twin registered via the materializer gives the same answers") {
    graft.udf.Materializer.materializeFunction(
      spark, ReferencePipeline.parseDatetimeSpec, temporary = true)
    val got = spark
      .sql("SELECT parse_datetime('2023-01-01T12:00:00.5Z') AS dt")
      .collect()
      .head
      .getAs[LocalDateTime]("dt")
    assert(got == LocalDateTime.of(2023, 1, 1, 12, 0, 0, 500000000))
  }
}
