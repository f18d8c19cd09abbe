package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions, for
  * wiring custom Catalyst expressions into the public DataFrame API. Lives
  * under `org.apache.spark.sql` purely for access — the standard pattern
  * for Spark-native extension libraries built without
  * `SparkSessionExtensions` (the driver harness owns session construction,
  * so injection at build time isn't available).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into an already-built session's registry
    * (the post-hoc twin of `SparkSessionExtensions.injectFunction`).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
