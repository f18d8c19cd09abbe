package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType}

class ReferencePipelineSpec extends SparkTestBase {

  test("flagship datamart reproduces the reference's output shape and filters by id") {
    val dm = ReferencePipeline.datamart(spark, sf, id = "13")
    val schema = dm.schema
    // /root/reference/models/datamart/schema.yml:6-10: (column1 INT64, datetime DATETIME)
    assert(schema("column1").dataType == LongType)
    assert(schema("datetime").dataType == TimestampNTZType)
    val rows = dm.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getAs[Any]("datetime") != null))
  }

  test("TVF argument binds at runtime: different ids give disjoint row sets") {
    val a = ReferencePipeline.datamart(spark, sf, id = "13").collect().map(_.getLong(0)).toSet
    val b = ReferencePipeline.datamart(spark, sf, id = "7").collect().map(_.getLong(0)).toSet
    assert(a.nonEmpty && b.nonEmpty && a.intersect(b).isEmpty)
  }

  test("datamart model persists docs: DESCRIBE shows reference schema.yml comments") {
    new graft.udf.ModelRunner(Seq(ReferencePipeline.datamartModel(sf)))
      .run(spark)
    val desc = spark.sql("DESCRIBE TABLE test_datamart").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(desc("column1").contains("INT64"))
    assert(desc("datetime").contains("civil datetime"))
    val tbl = spark.sql("DESCRIBE TABLE EXTENDED test_datamart").collect()
      .find(_.getString(0) == "Comment").map(_.getString(1))
    assert(tbl.exists(_.contains("datamart")))
    spark.sql("DROP TABLE test_datamart")
  }

  test("type-conflict guard: existing view with the function's name raises") {
    import spark.implicits._
    Seq(1).toDF("x").createOrReplaceTempView("conflicted_name")
    val spec = ReferencePipeline.parseDatetimeSpec.copy(name = "conflicted_name")
    val e = intercept[IllegalStateException] {
      graft.udf.Materializer.materializeFunction(spark, spec, temporary = true)
    }
    assert(e.getMessage.contains("exists as a table/view"))
  }
}
