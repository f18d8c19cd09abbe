package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-fidelity ×factor corpus synthesis for the whole-suite scale
  * verification (round-17, the r16 verdict's #7): every table the driver
  * contract reads, at full column width, so `graft.Verify` + the DuckDB
  * selfcheck can run END-TO-END against a corpus `factor`× sf0.1 — not
  * just the per-query wall-ratio grades [[ScaleStress]] runs.
  *
  * Documents and embeddings reuse [[ScaleStress.synthesize]]'s transforms
  * verbatim (per-replica token shuffle, norm-preserving rotation — the
  * properties that keep near-dup and ANN structure scaling linearly);
  * this tool then overwrites the fact tables with FULL-column replicas
  * under the same key-shift discipline, and adds the tables the stress
  * rig never needed:
  *
  *   - orders / lineitem / customer / supplier / part: every base column
  *     rides; key columns shift per replica in FK lockstep (l_suppkey
  *     with s_suppkey, l_partkey with p_partkey, o_custkey with
  *     c_custkey on the 97-aligned shift ScaleStress derives), so
  *     relationship structure — and every join's per-replica result — is
  *     identical to the base;
  *   - region / nation copy VERBATIM: they are bounded dimension tables
  *     at any corpus size (the 100 TB shape — facts scale, geography
  *     does not), and replicating them would break their PK-uniqueness.
  *
  * Correctness at the synthesized corpus is judged the same way as at
  * the base: both engines read the SAME parquet, so the gate checks
  * engine agreement, not synthesis realism.
  *
  * Usage: runMain graft.tools.SynthCorpus [baseDir] [factor] [outDir]
  * (defaults: /root/testdata/sf0.1, 10, /tmp/graft_synth_x10)
  */
object SynthCorpus {

  def synthesizeFull(spark: SparkSession, baseDir: String, factor: Int, outDir: String): Unit = {
    // documents, embeddings, events (full-width already) + the narrow
    // fact tables this tool immediately overwrites below
    ScaleStress.synthesize(spark, baseDir, factor, outDir)

    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")

    val ord = Tables.orders(spark, baseDir)
    val li = Tables.lineitem(spark, baseDir)
    val cust = Tables.customer(spark, baseDir)
    val supp = Tables.supplier(spark, baseDir)
    val part = Tables.part(spark, baseDir)

    // the same shift derivation as ScaleStress.synthesize: disjoint key
    // spaces per replica, custkey shift 97-aligned so the BFS seed rule
    // commutes, and the pagerank node-space guard
    val om = ord.agg(max("o_orderkey"), max("o_custkey")).head
    val cm = cust.agg(max("c_custkey")).head
    val lm = li.agg(max("l_suppkey"), max("l_partkey")).head
    val ckMax = math.max(om.getLong(1), cm.getLong(0))
    val okShift = om.getLong(0) + 1
    val ckShift = ((ckMax + 1 + 96) / 97) * 97
    val (skShift, pkShift) = (lm.getLong(0) + 1, lm.getLong(1) + 1)
    require(ckShift * factor < 10000000L,
      s"custkey shift $ckShift × $factor collides with the supplier id space")

    ord.select(col("*"), reps)
      .select((col("o_orderkey") + col("rep") * okShift).as("o_orderkey"),
              (col("o_custkey") + col("rep") * ckShift).as("o_custkey"),
              col("o_orderstatus"), col("o_totalprice"),
              col("o_orderdate"), col("o_orderpriority"))
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    li.select(col("*"), reps)
      .select((col("l_orderkey") + col("rep") * okShift).as("l_orderkey"),
              (col("l_partkey") + col("rep") * pkShift).as("l_partkey"),
              (col("l_suppkey") + col("rep") * skShift).as("l_suppkey"),
              col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax"), col("l_returnflag"),
              col("l_linestatus"), col("l_shipdate"))
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    cust.select(col("*"), reps)
      .select((col("c_custkey") + col("rep") * ckShift).as("c_custkey"),
              col("c_name"), col("c_nationkey"), col("c_acctbal"),
              col("c_mktsegment"))
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    supp.select(col("*"), reps)
      .select((col("s_suppkey") + col("rep") * skShift).as("s_suppkey"),
              col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/supplier.parquet")

    part.select(col("*"), reps)
      .select((col("p_partkey") + col("rep") * pkShift).as("p_partkey"),
              col("p_name"), col("p_brand"), col("p_type"),
              col("p_size"), col("p_retailprice"))
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/part.parquet")

    Seq("region", "nation").foreach { t =>
      Tables.load(spark, baseDir, t)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outDir = args.lift(2).getOrElse("/tmp/graft_synth_x10")
    val spark = GraftSession.local(threads = 32, appName = "synth-corpus")
    spark.sparkContext.setLogLevel("WARN")
    synthesizeFull(spark, baseDir, factor, outDir)
    val counts = Seq("region", "nation", "customer", "supplier", "part", "orders",
                     "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$outDir/$t.parquet").count()}")
    println(s"[synth-corpus] base=$baseDir factor=$factor out=$outDir ${counts.mkString(" ")}")
    spark.stop()
  }
}
