package graft

import graft.functions.Money
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class MoneySpec extends SparkTestBase {

  import spark.implicits._

  test("cents converts doubles exactly, including negatives and halves") {
    val rows = Seq(0.0, 0.01, 123.45, -123.45, 1400362.00, 0.005, -0.005, 99999999.99)
      .toDF("x")
      .select(col("x"), Money.cents(col("x")).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(rows(0.0) == 0L)
    assert(rows(0.01) == 1L)
    assert(rows(123.45) == 12345L)
    assert(rows(-123.45) == -12345L)
    assert(rows(1400362.00) == 140036200L)
    assert(rows(99999999.99) == 9999999999L)
    // the DECIMAL(18,2) rounding step is HALF_UP away from zero
    assert(rows(0.005) == 1L)
    assert(rows(-0.005) == -1L)
  }

  test("lsum stays LongType and is exact under any partitioning") {
    val df = spark.range(10000).select((col("id") % 997).cast("double").as("x"))
    val expected = (0L until 10000L).map(i => (i % 997) * 100).sum
    for (parts <- Seq(1, 32)) {
      val out = df.repartition(parts).agg(Money.lsum(Money.cents(col("x"))).as("s"))
      assert(out.schema("s").dataType == LongType)
      assert(out.head().getLong(0) == expected, s"parts=$parts")
    }
  }
}
