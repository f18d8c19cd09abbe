package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  test("pagerank: top-20 is rank-sorted, positive, and fixed-point-consistent") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    assert(rows.length == 20)
    val fx = rows.map(_.getLong(2))
    assert(fx.toSeq == fx.sortBy(-_).toSeq, "rank_fx non-increasing")
    assert(fx.forall(_ > 0L), "all ranks positive")
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / (1L << 40).toDouble,
             "rank is exactly rank_fx / 2^40")
    }
    spark.catalog.clearCache()
  }

  test("pagerank mass: integer floors only ever lose mass, never create it") {
    // each division floors, so after any iteration the total fixed-point
    // mass is ≤ the initial Fx budget — a creation bug (e.g. double
    // counting an edge) would push the sum ABOVE it
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    val topMass = rows.map(_.getLong(2)).sum
    assert(topMass <= (1L << 40), "top-20 mass alone must stay under the total budget")
    spark.catalog.clearCache()
  }
}
