package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression for the vector-similarity hot path.
  *
  * Arithmetic contract (load-bearing for the DuckDB oracle): the dot
  * product folds strictly left-to-right from a 0.0 accumulator — the same
  * order as the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` combinator form
  * and the oracle's `list_reduce(list_prepend(0.0, …))`, so results are
  * bit-identical across all three. The custom expression exists purely to
  * replace ~200 boxed interpreted lambda calls per pair with one primitive
  * loop (the pair stage of brute-force similarity evaluates this millions
  * of times).
  */
object VectorExpressions {

  /** `(array<double>, array<double>)` → `double`: Σ a[i]·b[i], folded
    * left-to-right from 0.0. Lengths must match (enforced upstream by the
    * fixed embedding dimension).
    *
    * Participates in whole-stage codegen ([[doGenCode]] emits the same
    * left-to-right primitive loop as [[nullSafeEval]], so the two paths are
    * bit-identical) — a CodegenFallback here would put a boxed
    * interpreted-eval call in the middle of the pair-stage codegen pipeline,
    * the hottest loop in the engine.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
