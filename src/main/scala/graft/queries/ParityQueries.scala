package graft.queries

import graft.{GraftSession, ReferencePipeline, Tables}
import graft.functions.BqFunctions
import org.apache.spark.sql.functions._

/** Queries exercising the reference's own semantics (SURVEY.md §2 O1–O12):
  * the parse_datetime UDF over all five format arms, and the flagship
  * TVF → datamart pipeline.
  */
object ParityQueries {

  /** CASE expression rendering events.ts into the 5 accepted layouts,
    * DuckDB side (index-aligned with ReferencePipeline.renderFormats).
    */
  private def renderCaseDuckDb(tsCol: String, idCol: String): String = {
    val arms = ReferencePipeline.renderFormatsDuckDb.zipWithIndex.map {
      case (f, i) => s"WHEN $i THEN strftime($tsCol, '$f')"
    }
    s"CASE $idCol % 5 ${arms.mkString(" ")} END"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "udf_parse_datetime",
      (spark, dir) => {
        GraftSession.tune(spark)
        val ev = Tables.events(spark, dir)
        val rendered = Seq(
          "yyyy/MM/dd HH:mm:ss",
          "yyyy/MM/dd",
          "yyyy-MM-dd HH:mm:ss",
          "yyyy-MM-dd",
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
        ).zipWithIndex.foldLeft(lit(null: String)) { case (acc, (f, i)) =>
          when(pmod(col("event_id"), lit(5)) === i, date_format(col("ts"), f)).otherwise(acc)
        }
        ev.select(col("event_id"), rendered.as("raw"))
          .select(col("event_id"), col("raw"), BqFunctions.parseDatetime(col("raw")).as("datetime"))
          .orderBy("event_id")
      },
      Some(s"""WITH t AS (
              |  SELECT event_id, ${renderCaseDuckDb("ts", "event_id")} AS raw FROM events
              |)
              |SELECT event_id, raw, ${BqFunctions.parseDatetimeDuckDbExpr("raw")} AS datetime
              |FROM t ORDER BY event_id""".stripMargin)
    ),
    QueryDef(
      "udf_datamart",
      (spark, dir) => ReferencePipeline.datamart(spark, dir, id = "13"),
      Some(s"""WITH test_table AS (
              |  SELECT CAST(user_id AS VARCHAR) AS id,
              |         CAST(event_id AS VARCHAR) AS column1,
              |         ${renderCaseDuckDb("ts", "event_id")} AS column2
              |  FROM events
              |)
              |SELECT CAST(column1 AS BIGINT) AS column1,
              |       ${BqFunctions.parseDatetimeDuckDbExpr("column2")} AS datetime
              |FROM test_table WHERE id = '13'
              |ORDER BY column1""".stripMargin)
    )
  )
}
