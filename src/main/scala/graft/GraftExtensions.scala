package graft

import graft.expressions.SignatureExpressions.{H32Array, MinHashSignature, SimHash32}
import graft.expressions.VectorExpressions.DotProduct

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same one-pass signature/vector kernels the DataFrame API uses:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT minhash_signature(h32_array(shingles)) FROM docs")
  * }}}
  *
  * Also installable on an existing session via [[GraftExtensions.register]]
  * (the driver harness owns session construction, so the builder hook isn't
  * always available).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator optimizer extension: bucketed range joins (inert
    // until spark.graft.rangeJoin.binWidth is set — see RangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}

object GraftExtensions {

  private def unary(name: String, f: Expression => Expression): (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
     new ExpressionInfo(classOf[GraftExtensions].getName, name),
     { args =>
       require(args.length == 1, s"$name takes exactly 1 argument")
       f(args.head)
     })

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    unary("h32_array", H32Array.apply),
    unary("minhash_signature", e => MinHashSignature(e)),
    unary("simhash32", SimHash32.apply),
    ("dot_product",
     new ExpressionInfo(classOf[GraftExtensions].getName, "dot_product"),
     { args =>
       require(args.length == 2, "dot_product takes exactly 2 arguments")
       DotProduct(args(0), args(1))
     })
  )

  /** Register the same functions into an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    definitions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, FunctionIdentifier(name), info, builder)
    }
    // existing-session path for the optimizer extension (the driver
    // harness owns session construction); idempotent
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRule
  }
}
