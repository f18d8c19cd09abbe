package graft

import graft.udf.{Materialization, Model, ModelRunner}
import org.apache.spark.sql.functions._

class ModelRunnerSpec extends SparkTestBase {

  private def m(name: String, refs: String*)(b: org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame) =
    Model(name, refs, b)

  test("levels: topological order with independent models in the same level") {
    val runner = new ModelRunner(Seq(
      m("a")(_.range(1).toDF()),
      m("b")(_.range(1).toDF()),
      m("c", "a", "b")(_.range(1).toDF()),
      m("d", "c")(_.range(1).toDF())
    ))
    assert(runner.levels(Seq.empty).isEmpty)
    val levels = runner.levels(Seq(Model("d", Seq("c"), _.range(1).toDF())))
    assert(levels.map(_.map(_.name).toSet) == Seq(Set("a", "b"), Set("c"), Set("d")))
  }

  test("cycle detection raises") {
    val runner = new ModelRunner(Seq(
      m("x", "y")(_.range(1).toDF()),
      m("y", "x")(_.range(1).toDF())
    ))
    intercept[IllegalArgumentException] {
      runner.levels(Seq(Model("x", Seq("y"), _.range(1).toDF())))
    }
  }

  test("unknown ref raises at construction") {
    intercept[IllegalArgumentException] {
      new ModelRunner(Seq(m("a", "ghost")(_.range(1).toDF())))
    }
  }

  test("run materializes views in dependency order and selection pulls upstream closure") {
    val events = Tables.events(spark, sf)
    events.createOrReplaceTempView("mr_events")
    val runner = new ModelRunner(Seq(
      m("mr_base") { s => s.table("mr_events").select("user_id", "event_type", "value") },
      m("mr_purchases", "mr_base") { s => s.table("mr_base").filter(col("event_type") === "purchase") },
      m("mr_spend", "mr_purchases") { s =>
        s.table("mr_purchases").groupBy("user_id").agg(sum("value").as("spend"))
      }
    ))
    // selecting only the leaf builds the whole upstream chain
    val built = runner.run(spark, runner.selectByName("mr_spend"))
    assert(built.keySet == Set("mr_base", "mr_purchases", "mr_spend"))
    assert(spark.table("mr_spend").count() > 0)
    // the view chain gives the same answer as the direct computation
    val direct = events.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum("value").as("spend"))
    assert(spark.table("mr_spend").except(direct).isEmpty)
    assert(direct.except(spark.table("mr_spend")).isEmpty)
  }

  test("table materialization persists to the warehouse catalog") {
    val runner = new ModelRunner(Seq(
      Model("mr_tbl", Nil, s => s.range(5).toDF("n"), Materialization.Table)
    ))
    runner.run(spark)
    assert(spark.catalog.tableExists("mr_tbl"))
    assert(spark.table("mr_tbl").count() == 5)
    spark.sql("DROP TABLE mr_tbl")
  }
}
