package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the latest right row whose
  * time is at-or-before the left row's time, per key.
  *
  * Spark has no native ASOF JOIN; the naive formulations are a range
  * self-join (quadratic in hot keys) or a per-key sort-merge in
  * `mapPartitions` (manual). This is the scalable declarative form:
  * union both sides, one window pass with `last(_, ignoreNulls)` over
  * `(key ORDER BY time, side)` — a single shuffle on the key, state
  * bounded by the window frame, no join blow-up. Ties (equal timestamps)
  * match the right row (right sorts before left at the same instant).
  *
  * The q_asof_click_before_purchase oracle cross-checks this formulation
  * against DuckDB's *native* ASOF JOIN — two independent algorithms, same
  * answer.
  */
object AsOfJoin {

  /** @param left        rows to enrich (all columns preserved)
    * @param right       rows providing the as-of value
    * @param key         equi-join key column (present in both)
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightValues right columns to carry (each emitted as the value
    *                    of the latest right row at-or-before `leftTime`,
    *                    NULL when no such row exists)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String]
  ): DataFrame = {
    require(rightValues.nonEmpty, "need at least one right value column")
    val leftCols = left.columns.toSeq
    require(rightValues.forall(v => !leftCols.contains(v)),
            "right value columns must not collide with left columns")
    val t = "__asof_t"
    val side = "__asof_side"

    def nullAs(name: String, from: DataFrame): Column =
      lit(null).cast(from.schema(name).dataType).as(name)

    // left rows carry their own columns; right rows carry only the values
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightValues.map(nullAs(_, right)): _*)
    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(0))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(nullAs(_, left)) ++
        rightValues.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightValues
      .foldLeft(l.unionByName(r)) { (df, v) =>
        df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
      }
      .where(col(side) === 1)
      .select(leftCols.map(col) ++ rightValues.map(col): _*)
  }
}
