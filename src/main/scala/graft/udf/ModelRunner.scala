package graft.udf

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** A declared transformation node — the Spark-native form of a dbt model.
  *
  * `refs` replaces dbt's `{{ ref(...) }}` DAG edges
  * (/root/reference/models/udf/table_function/test_table_function.sql:10-12);
  * `tags` replaces `+tags:` routing (/root/reference/dbt_project.yml:37,45);
  * `materialization` replaces dbt's `+materialized:` — `View` registers a
  * temp view (zero storage; Catalyst inlines it), `Table` persists via
  * `saveAsTable` (the port of the reference's CTAS datamart, SURVEY.md §2 O10).
  */
final case class Model(
    name: String,
    refs: Seq[String],
    build: SparkSession => DataFrame,
    materialization: Materialization = Materialization.View,
    tags: Set[String] = Set.empty
)

sealed trait Materialization
object Materialization {
  case object View extends Materialization
  case object Table extends Materialization
}

/** Topo-ordered, level-parallel model materializer — the port of dbt's
  * selective/parallel DAG build (SURVEY.md §2 O18; the reference's run log
  * shows "Concurrency: 8 threads"). Independent models in the same
  * topological level materialize concurrently; Spark's scheduler
  * interleaves their jobs across executor slots.
  *
  * Most ordering needs vanish on Spark: only *materialization boundaries*
  * (tables) actually execute; views are lazy and inlined. The runner exists
  * for those boundaries and for selective rebuilds.
  */
final class ModelRunner(models: Seq[Model]) {
  private val byName = models.map(m => m.name -> m).toMap
  require(byName.size == models.size, "duplicate model names")
  models.foreach { m =>
    m.refs.foreach { r =>
      require(byName.contains(r), s"model ${m.name} refs unknown model '$r'")
    }
  }

  /** Topological levels (Kahn); models within a level are independent. */
  def levels(selected: Seq[Model]): Seq[Seq[Model]] = {
    // include upstream closure of the selection
    val needed = scala.collection.mutable.Set.empty[String]
    def visit(n: String): Unit =
      if (needed.add(n)) byName(n).refs.foreach(visit)
    selected.foreach(m => visit(m.name))
    var remaining = models.filter(m => needed.contains(m.name))
    val out = Seq.newBuilder[Seq[Model]]
    val done = scala.collection.mutable.Set.empty[String]
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.refs.forall(done.contains))
      require(ready.nonEmpty, s"cycle among models: ${blocked.map(_.name).mkString(", ")}")
      out += ready
      done ++= ready.map(_.name)
      remaining = blocked
    }
    out.result()
  }

  /** Materialize the selected models (default: all) in dependency order,
    * parallel within each level. Returns the built DataFrames by name.
    */
  def run(
      spark: SparkSession,
      select: Model => Boolean = _ => true,
      parallelism: Int = 8
  ): Map[String, DataFrame] = {
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val built = scala.collection.mutable.Map.empty[String, DataFrame]
      levels(models.filter(select)).foreach { level =>
        val fs = level.map { m =>
          Future {
            val df = m.build(spark)
            m.materialization match {
              case Materialization.View =>
                df.createOrReplaceTempView(m.name)
              case Materialization.Table =>
                df.write.mode("overwrite").saveAsTable(m.name)
            }
            m.name -> df
          }
        }
        built ++= Await.result(Future.sequence(fs), Duration.Inf)
      }
      built.toMap
    } finally pool.shutdown()
  }

  def selectByTag(tag: String): Model => Boolean = _.tags.contains(tag)
  def selectByName(names: String*): Model => Boolean = {
    val s = names.toSet; m => s.contains(m.name)
  }
}
