package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType}

/** Pins the assumption the whole file-fed streaming harness rests on:
  * `FileStreamSource` processes landed band files OLDEST-MODIFICATION-TIME
  * FIRST, so with `maxFilesPerTrigger=1` band i replays as micro-batch i.
  * Every order-sensitive streaming query (sessionize, watermarked windows,
  * the interval join) depends on this — if Spark ever changed the listing
  * order, those queries' oracles would catch it indirectly; this spec
  * catches it DIRECTLY, with the band→batch mapping spelled out.
  */
class LandBandsSpec extends SparkTestBase {

  test("bands replay as micro-batches in band (mtime) order, one per trigger") {
    import spark.implicits._
    val nBands = 4
    // v encodes its band (v / 1000), so batch contents identify bands
    val df = (0 until nBands).flatMap(b => (0 until 50).map(i => (b * 1000L + i, b)))
      .toDF("v", "__band")
    val land = graft.queries.StreamingQueries.landBands(df, nBands, "spec_land_order")

    // the landed files must carry strictly increasing mtimes in band order
    val files = new java.io.File(land).listFiles().sortBy(_.getName)
    assert(files.map(_.getName).toSeq == (0 until nBands).map(i => f"b$i%04d.parquet"),
      "one file per band, named in band order")
    assert(files.map(_.lastModified).sliding(2).forall(p => p(0) < p(1)),
      "band mtimes must be strictly increasing")

    val batches = scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]()
    val q = spark.readStream
      .schema(new StructType().add("v", LongType))
      .option("maxFilesPerTrigger", "1").parquet(land)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches.synchronized { batches += ((id, b.collect().map(_.getLong(0)).toSet)) }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination()

    val ordered = batches.sortBy(_._1).toSeq
    assert(ordered.size == nBands, s"expected $nBands micro-batches, got ${ordered.size}")
    for (((_, vs), b) <- ordered.zipWithIndex) {
      assert(vs.nonEmpty && vs.forall(_ / 1000 == b),
        s"micro-batch $b must hold exactly band $b's rows, got bands ${vs.map(_ / 1000)}")
    }
  }
}
