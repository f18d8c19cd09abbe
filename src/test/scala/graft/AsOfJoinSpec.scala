package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)

  test("backward as-of: latest right at-or-before, ties match, missing gives NULL") {
    val left = Seq(
      (1L, 10L, ts(10)), // after clicks at 5 and 8 -> 8
      (2L, 10L, ts(5)),  // tie with click at 5 -> 5 (same-instant matches)
      (3L, 10L, ts(1)),  // before any click -> NULL
      (4L, 20L, ts(10))  // other key, no clicks -> NULL
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, ts(5)), (10L, ts(8)), (10L, ts(12))
    ).toDF("user_id", "rt").withColumn("matched_ts", col("rt"))

    val out = AsOfJoin.backward(left, right, "user_id", "t", "rt", Seq("matched_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Timestamp]("matched_ts"))).toMap
    assert(out(1L).contains(ts(8)))
    assert(out(2L).contains(ts(5)))
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
    assert(out.size == 4, "every left row survives (left-join semantics)")
  }

  test("single shuffle: the plan has no join operator at all") {
    val left = Seq((1L, 10L, ts(1))).toDF("event_id", "user_id", "t")
    val right = Seq((10L, ts(0))).toDF("user_id", "rt").withColumn("v", col("rt"))
    val plan = AsOfJoin.backward(left, right, "user_id", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"union+window formulation must not join:\n$plan")
    assert(plan.contains("Window"))
  }
}
