package graft

import graft.functions.BqFunctions
import graft.udf.{Materializer, Param, UdfSpec}

/** SURVEY.md §2 O17: the same logical UDF routes to per-environment
  * databases (the reference's `udf` / `udf_dev` / `udf_staging` / `udf_ci`
  * dataset routing, README.md:181-193) — here as Spark catalog databases,
  * with persistent, independently-droppable function objects.
  */
class EnvRoutingSpec extends SparkTestBase {

  private def spec = UdfSpec(
    name = "parse_datetime_env",
    params = Seq(Param("timestamp_expression", "STRING")),
    returnType = "TIMESTAMP_NTZ",
    body = BqFunctions.parseDatetimeSqlBody("timestamp_expression"),
    description = "env-routed lenient datetime parse"
  )

  test("one logical UDF materializes into isolated per-env databases") {
    val envs = Seq("udf_dev_t", "udf_ci_t")
    try {
      envs.foreach { db =>
        Materializer.materializeFunction(spark, spec, database = Some(db), temporary = false)
      }
      // both resolve independently and compute the same thing
      envs.foreach { db =>
        val r = spark.sql(
          s"SELECT $db.parse_datetime_env('2023/01/01 12:00:00') AS t").head()
        assert(r.getAs[java.time.LocalDateTime]("t") ==
          java.time.LocalDateTime.of(2023, 1, 1, 12, 0, 0))
      }
      // dropping one env's function leaves the other intact
      spark.sql("DROP FUNCTION udf_dev_t.parse_datetime_env")
      assert(!spark.catalog.functionExists("udf_dev_t.parse_datetime_env"))
      assert(spark.catalog.functionExists("udf_ci_t.parse_datetime_env"))
    } finally {
      envs.foreach(db => spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE"))
    }
  }

  test("create-or-replace is idempotent per env") {
    try {
      Materializer.materializeFunction(spark, spec, database = Some("udf_dev_t2"), temporary = false)
      Materializer.materializeFunction(spark, spec, database = Some("udf_dev_t2"), temporary = false)
      assert(spark.catalog.functionExists("udf_dev_t2.parse_datetime_env"))
    } finally {
      spark.sql("DROP DATABASE IF EXISTS udf_dev_t2 CASCADE")
    }
  }
}
