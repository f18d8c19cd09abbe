package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Exact integer money arithmetic shared by every oracle-checked query.
  *
  * The driver's comparator materializes Spark results and DuckDB results
  * through different type paths (parquet decimals arrive as exact Decimal
  * objects; DuckDB decimals and HUGEINT sums arrive as float64), so any
  * DECIMAL — or any un-cast SUM — in a final output column hash-mismatches
  * whenever a value's last decimal digit is zero. The contract is therefore:
  * **no DECIMAL and no un-cast SUM ever reaches an output column**. Money
  * becomes integer cents (BIGINT) at the first projection; every aggregate
  * is a LongType sum on the Spark side and a `CAST(SUM(…) AS BIGINT)` on the
  * DuckDB side (undoing DuckDB's HUGEINT widening). Integer sums are also
  * associative, so results are independent of partitioning/merge order —
  * exactly what a 1000-executor aggregation needs.
  *
  * The double→cents conversion goes through DECIMAL(18,2) *inside the
  * expression* (never in the output): both engines round the double to two
  * decimals identically, and the ×100 + truncating cast of an integral
  * decimal is exact.
  */
object Money {

  private val dec = DecimalType(18, 2)

  /** Double money column → exact integer cents (LongType). */
  def cents(c: Column): Column = (c.cast(dec) * 100).cast(LongType)

  /** DuckDB twin of [[cents]]. */
  def centsSql(e: String): String =
    s"CAST(CAST($e AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** LongType sum of an already-long column (Spark SUM(LONG) is LONG). */
  def lsum(c: Column): Column = sum(c).cast(LongType)

  /** DuckDB twin of [[lsum]]: undo the HUGEINT widening of SUM(BIGINT). */
  def lsumSql(e: String): String = s"CAST(SUM($e) AS BIGINT)"
}
