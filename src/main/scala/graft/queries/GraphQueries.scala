package graft.queries

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond the connected-components dedup:
  * PageRank over the customer–supplier trade graph (an edge per distinct
  * (customer, supplier) pair that shares an order line, materialized in
  * BOTH directions so no node dangles).
  *
  * Determinism: rank mass flows as FIXED-POINT longs (2^40 scale) with
  * integer division everywhere — contribution `r div outdeg`, damping
  * `(sum × 85) div 100` — so per-node sums are exact and associative,
  * independent of partitioning/merge order, and bit-equal to the DuckDB
  * oracle's `//` arithmetic (a double formulation would make the
  * reduction order observable and break the hash compare). Magnitudes
  * stay far under 2^63: total mass ≈ 2^40, ×85 ≈ 2^47.
  *
  * Scale shape: the standard distributed PageRank loop — edges persisted
  * with out-degree attached, each of the 3 unrolled iterations is one
  * equi-join (ranks ⋈ edges on src) + one hash aggregation (sum by dst);
  * ranks are 16 bytes/node through every shuffle, vectors/payloads never
  * move. The driver never sees per-node data; top-20 leaves via
  * TakeOrderedAndProject.
  */
object GraphQueries {

  private val Fx = 1L << 40
  private val SuppOffset = 10000000L
  private val Iters = 3

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_pagerank",
      (spark, dir) => {
        GraftSession.tune(spark)
        spark.catalog.clearCache() // sequential query contract
        val pairs = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
                col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"),
                  (col("l_suppkey") + lit(SuppOffset)).as("supp"))
          .distinct()
        val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
          .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        // persist + eager count: the edge list with out-degree attached is
        // read once per iteration (at cluster scale this is the
        // materialized adjacency table, partitioned by src)
        val ed = edges.join(deg, "src").persist()
        ed.count()
        val nodes = ed.select(col("src").as("node")).distinct()
        val nn = nodes.agg(count(lit(1)).as("n"))
        val tele = nn.select(expr(s"(($Fx * 15) div 100) div n").as("tp"))
        val r0 = nodes.crossJoin(broadcast(nn)).select(col("node"), expr(s"$Fx div n").as("r"))
        def step(r: DataFrame): DataFrame =
          ed.join(r.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node"), expr("r div outdeg").as("contrib"))
            .groupBy(col("node"))
            .agg(sum(col("contrib")).as("csum"))
            .crossJoin(broadcast(tele))
            .select(col("node"), (col("tp") + expr("(csum * 85) div 100")).as("r"))
        val rFinal = Iterator.iterate(r0)(step).drop(Iters).next()
        rFinal.orderBy(col("r").desc, col("node").asc).limit(20)
          .select(col("node"),
                  when(col("node") >= SuppOffset, lit("supplier"))
                    .otherwise(lit("customer")).as("node_type"),
                  col("r").as("rank_fx"),
                  (col("r").cast("double") / lit(Fx.toDouble)).as("rank"))
      },
      Some {
        def stepSql(prev: String, out: String) =
          s"""$out AS (
             |  SELECT ed.dst AS node, tp + (SUM($prev.r // ed.outdeg) * 85) // 100 AS r
             |  FROM ed JOIN $prev ON ed.src = $prev.node, tele
             |  GROUP BY ed.dst, tp
             |)""".stripMargin
        s"""WITH pairs AS (
           |  SELECT DISTINCT o_custkey AS cust, l_suppkey + $SuppOffset AS supp
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |),
           |edges AS (
           |  SELECT cust AS src, supp AS dst FROM pairs
           |  UNION ALL
           |  SELECT supp AS src, cust AS dst FROM pairs
           |),
           |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
           |ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |tele AS (SELECT (($Fx * 15) // 100) // n AS tp FROM nn),
           |r0 AS (SELECT node, $Fx // n AS r FROM nodes, nn),
           |${stepSql("r0", "r1")},
           |${stepSql("r1", "r2")},
           |${stepSql("r2", "r3")}
           |SELECT node,
           |       CASE WHEN node >= $SuppOffset THEN 'supplier' ELSE 'customer' END AS node_type,
           |       CAST(r AS BIGINT) AS rank_fx,
           |       CAST(r AS DOUBLE) / CAST($Fx AS DOUBLE) AS rank
           |FROM r3 ORDER BY r DESC, node ASC LIMIT 20""".stripMargin
      }
    )
  )
}
