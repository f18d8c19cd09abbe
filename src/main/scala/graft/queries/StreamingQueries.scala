package graft.queries

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.Tables
import graft.functions.{Hashing, Udafs}
import graft.streaming.Streaming
import graft.text.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** The streaming surface made oracle-checkable: the events table replayed
  * through the REAL Structured Streaming sessionizer
  * ([[Streaming.sessionize]], `flatMapGroupsWithState`), aggregated to the
  * exact shape of the batch `q_sessionize` query and checked against the
  * SAME DuckDB oracle — the stream and the oracle reach the answer by
  * entirely independent algorithms (incremental keyed state vs a lag
  * window).
  *
  * The `collect()` here is the MemoryStream REPLAY HARNESS boundary, not
  * the operator: MemoryStream is fed from driver-local data by design. The
  * operator under test is fully distributed (state hash-partitioned by
  * user across executors); in production the same `sessionize` call reads
  * from a partitioned source (Kafka/files) and nothing touches the driver.
  */
object StreamingQueries {

  /** Memory-sink names must be unique per run within a session (Bench and
    * Verify invoke the builder repeatedly).
    */
  private val runId = new AtomicInteger(0)

  /** One document in the replayed stream (q_streaming_dedup). */
  final case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_streaming_sessionize",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Streaming.Event]
        val eventsDs = Streaming.eventsBatch(spark, dir)
        // one sentinel per user, a full gap past that user's last event:
        // it closes every REAL session, while the sentinel's own 1-event
        // session stays open in state and (flushOnTimeout=false) is never
        // emitted — the emitted sessions partition exactly the real events.
        // The per-user max is a DISTRIBUTED aggregation; only the one-row-
        // per-user result (and the replay feed itself, the harness boundary)
        // crosses to the driver.
        val sentinels = eventsDs.groupBy(col("user_id"))
          .agg(max(col("ts")).as("max_ts"))
          .collect()
          .map { r =>
            Streaming.Event(-1L,
              new Timestamp(r.getTimestamp(1).getTime + 2 * Streaming.SessionGapMs),
              r.getLong(0), "sentinel", 0.0)
          }
        input.addData(eventsDs.collect().toIndexedSeq: _*)
        input.addData(sentinels.toIndexedSeq: _*)
        val sink = s"streaming_sessionize_${runId.incrementAndGet()}"
        val q = Streaming.sessionize(input.toDS(), flushOnTimeout = false)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        // resolve the aggregate against the sink eagerly (the plan keeps a
        // reference to the already-resolved in-memory relation), then drop
        // the temp view so repeated invocations in one session (Bench reps,
        // Verify) don't accumulate one retained session table per run
        val sessions = spark.table(sink)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast(LongType).as("n_sessions"),
               sum(col("n_events")).cast(LongType).as("n_events"))
        val resolved = sessions.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      // the batch q_sessionize oracle, verbatim: the stream must land on
      // the identical per-user session partition
      Some("""SELECT user_id,
             |       CAST(SUM(is_session_start) AS BIGINT) AS n_sessions,
             |       COUNT(*) AS n_events
             |FROM (
             |  SELECT user_id,
             |         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes'
             |              THEN 1 ELSE 0 END AS is_session_start
             |  FROM (SELECT user_id, ts, event_id,
             |               LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |        FROM events))
             |GROUP BY user_id""".stripMargin)
    ),

    // the REAL watermarked tumbling-window aggregation
    // ([[Streaming.windowedCounts]], 10-min windows, 30-min watermark,
    // append mode) replayed over the events table and checked against a
    // batch DuckDB oracle computing the same windows from epoch seconds.
    // Two determinism devices:
    //   - `value` is converted to integer cents BEFORE the stream (cents
    //     ride as integral doubles ≤ ~10^4, so the windowed SUM is exact
    //     under ANY arrival/merge order — the stream's incremental sums and
    //     DuckDB's batch sum land on the same integer);
    //   - one sentinel event 2 h past the corpus max pushes the watermark
    //     past every real window (append mode only emits CLOSED windows);
    //     the sentinel's own window stays open and is never emitted.
    // the REAL stream-stream interval join ([[Streaming.clickAttribution]]):
    // purchases matched to the same user's clicks in the preceding 7 days,
    // replayed over the events table and aggregated per purchase. Inner
    // joins emit matches as soon as both sides arrive, so no sentinel is
    // needed; the watermark + range predicate exist to bound state, not to
    // gate emission. Checked against a batch DuckDB interval join — stream
    // and oracle compute the same pairs by entirely different algorithms
    // (incremental symmetric hash join vs batch join).
    QueryDef(
      "q_streaming_click_attribution",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Streaming.Event]
        input.addData(Streaming.eventsBatch(spark, dir).collect().toIndexedSeq: _*)
        val sink = s"streaming_click_attr_${runId.incrementAndGet()}"
        val q = Streaming.clickAttribution(input.toDF())
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        val out = spark.table(sink)
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).cast(LongType).as("n_clicks"),
               max(col("click_ts")).as("last_click_ts"))
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some(s"""SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks,
              |       MAX(c.ts) AS last_click_ts
              |FROM events p JOIN events c
              |  ON c.user_id = p.user_id
              | AND c.event_type = 'click'
              | AND c.ts < p.ts
              | AND c.ts >= p.ts - INTERVAL ${Streaming.AttributionDays} DAY
              |WHERE p.event_type = 'purchase'
              |GROUP BY p.event_id""".stripMargin)
    ),

    // the REAL watermark-bounded streaming dedup
    // ([[Streaming.streamingDedup]], `dropDuplicatesWithinWatermark` on the
    // normalized content hash) replayed over the documents table. WHICH
    // physical row survives per hash is arrival/partition-order dependent,
    // so the oracle-checked result is the surviving KEY SET — exactly one
    // row per distinct content hash, no duplicate leaked, no key lost —
    // which is the dedup contract itself and is deterministic. The batch
    // twin is dedup_exact's distinct-hash set.
    QueryDef(
      "q_streaming_dedup",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[StreamDoc]
        val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
        val docs = graft.Tables.documents(spark, dir)
          .select(col("doc_id").cast("long").as("_1"), col("text").as("_2"))
          .as[(Long, String)]
          .collect().toIndexedSeq
          .map { case (id, text) =>
            StreamDoc(id, text, new Timestamp(base.getTime + id * 1000L))
          }
        input.addData(docs: _*)
        val sink = s"streaming_dedup_${runId.incrementAndGet()}"
        val q = Streaming.streamingDedup(input.toDF())
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        val out = spark.table(sink).select(col("content_md5"))
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some(s"""SELECT DISTINCT ${graft.text.TextAnalysis.contentHashSql("text")} AS content_md5
              |FROM documents""".stripMargin)
    ),

    // the REAL stream-static enrichment join ([[Streaming.enrich]]): the
    // event stream broadcast-joined per microbatch to the static customer
    // dimension — stateless, no watermark, the canonical dimension-attach
    // stage. The sink holds the enriched ROWS (append mode, no in-stream
    // agg); the per-segment rollup below is batch-side over the sink, and
    // the oracle recomputes it from a plain batch join. Value rides as
    // exact integer cents so the rollup sum is arrival-order-independent.
    QueryDef(
      "q_streaming_enrich",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Streaming.Event]
        input.addData(Streaming.eventsBatch(spark, dir).collect().toIndexedSeq: _*)
        val dim = graft.Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        val sink = s"streaming_enrich_${runId.incrementAndGet()}"
        val q = Streaming.enrich(input.toDF(), dim)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        val out = spark.table(sink)
          .groupBy(col("segment"))
          .agg(count(lit(1)).cast(LongType).as("n_events"),
               countDistinct(col("user_id")).cast(LongType).as("n_users"),
               sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
                 .cast(LongType).as("total_cents"))
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some("""SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
             |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
             |       CAST(SUM(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1""".stripMargin)
    ),

    QueryDef(
      "q_streaming_window_counts",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Streaming.Event]
        val eventsDs = Streaming.eventsBatch(spark, dir)
        val maxTs = eventsDs.agg(max(col("ts"))).collect()(0).getTimestamp(0)
        input.addData(eventsDs.collect().toIndexedSeq: _*)
        input.addData(Streaming.Event(-1L,
          new Timestamp(maxTs.getTime + 2 * 60 * 60 * 1000L), -1L, "sentinel", 0.0))
        val centsIn = input.toDF()
          .withColumn("value", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE)"))
        val sink = s"streaming_window_counts_${runId.incrementAndGet()}"
        val q = Streaming.windowedCounts(centsIn)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        val out = spark.table(sink)
          .select(col("window_start"), col("event_type"),
                  col("n_events").cast(LongType).as("n_events"),
                  col("total_value").cast(LongType).as("total_cents"))
          .orderBy(col("window_start"), col("event_type"))
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some("""SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS TIMESTAMP) AS window_start,
             |       event_type, COUNT(*) AS n_events,
             |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)
    ),

    // the FILE-BASED streaming SINK — closing the loop the file SOURCE
    // opened (q_streaming_file_source): the same watermarked windowed
    // aggregation, but written as append-mode PARQUET FILES with a
    // checkpoint (the exactly-once file sink a production stream lands
    // in), then re-read as a batch table and compared to the batch
    // oracle. Append mode emits a window only once its watermark closes
    // it — the sentinel closes every real window — so the file set must
    // hold each closed window EXACTLY once: a duplicate emission,
    // re-fired window, or manifest/commit defect (files visible that the
    // sink's _spark_metadata did not commit, or vice versa) changes the
    // re-read rollup and hash-mismatches. Sink + checkpoint dirs are
    // fresh per invocation (append-mode file sinks have no overwrite).
    QueryDef(
      "q_streaming_file_sink",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Streaming.Event]
        val eventsDs = Streaming.eventsBatch(spark, dir)
        val maxTs = eventsDs.agg(max(col("ts"))).collect()(0).getTimestamp(0)
        input.addData(eventsDs.collect().toIndexedSeq: _*)
        input.addData(Streaming.Event(-1L,
          new Timestamp(maxTs.getTime + 2 * 60 * 60 * 1000L), -1L, "sentinel", 0.0))
        val centsIn = input.toDF()
          .withColumn("value", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE)"))
        val id = runId.incrementAndGet()
        val sinkDir = StorageQueries.target(s"stream_file_sink_$id")
        val q = Streaming.windowedCounts(centsIn)
          .writeStream.format("parquet")
          .option("path", sinkDir)
          .option("checkpointLocation", StorageQueries.target(s"stream_file_sink_ckpt_$id"))
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        spark.read.parquet(sinkDir)
          .select(col("window_start"), col("event_type"),
                  col("n_events").cast(LongType).as("n_events"),
                  col("total_value").cast(LongType).as("total_cents"))
          .orderBy(col("window_start"), col("event_type"))
          .localCheckpoint(eager = true)
      },
      Some("""SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS TIMESTAMP) AS window_start,
             |       event_type, COUNT(*) AS n_events,
             |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)
    ),

    // streaming KMV distinct-cardinality over the document stream — the
    // sketch × streaming crossover: per-(half, shard) bounded O(k) state
    // via mapGroupsWithState ([[Streaming.kmvSketch]]), fed in FOUR
    // separate micro-batches so cross-batch state folding is genuinely
    // exercised, shard sketches merged on read (KMV composability), and
    // the result checked bit-for-bat against a BATCH DuckDB oracle — valid
    // because the k-min fold is order- and duplicate-insensitive, so the
    // stream must land on exactly the batch sketch whatever the batch
    // boundaries. Update-mode emissions accumulate in the memory sink;
    // the latest per shard is selected by its monotone n_seen. The
    // collect() feed is the MemoryStream harness boundary as documented in
    // the object scaladoc; shingling/hashing run INSIDE the stream.
    QueryDef(
      "q_streaming_kmv",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val K = TextQueries.KmvK
        val num = (K - 1).toLong * Hashing.H32Max
        val input = MemoryStream[TokenDoc]
        val docs = Tables.documents(spark, dir)
          .select(col("source"), col("text")).as[TokenDoc].collect()
        val sink = s"streaming_kmv_${runId.incrementAndGet()}"
        val hashes = input.toDF()
          .select(when(substring(col("source"), 4, 10).cast("int") < 10, lit("a"))
                    .otherwise(lit("b")).as("grp"),
                  TextAnalysis.tokens(col("text")).as("toks"))
          .select(col("grp"),
                  explode(TextAnalysis.shinglesOf(col("toks"), TextQueries.KmvShingleK))
                    .as("term"))
          .select(col("grp"), Hashing.h32(col("term")).as("h"))
          .select(col("grp"), pmod(col("h"), lit(8)).cast("int").as("sub"), col("h"))
          .as[Streaming.SubHash]
        val q = Streaming.kmvSketch(hashes, K)
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        docs.grouped(math.max(1, docs.length / 4 + 1)).foreach { chunk =>
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk: real state folds
        }
        q.stop(); q.awaitTermination()
        val w = Window.partitionBy(col("grp"), col("sub")).orderBy(col("n_seen").desc)
        val latest = spark.table(sink)
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        val merged = latest
          .select(col("grp"), explode(col("sketch")).as("h")).distinct()
          .as[Udafs.KeyedHash].groupByKey(_.grp).mapValues(_.h)
          .agg(Udafs.MinKLong(K).toColumn.name("sk")).toDF("grp", "sk")
        val out = merged.select(
            col("grp"),
            expr("CAST(size(sk) AS BIGINT)").as("n_in_sketch"),
            expr("element_at(sk, size(sk))").as("kth_hash"),
            expr(s"CASE WHEN size(sk) < $K THEN CAST(size(sk) AS BIGINT) " +
                 s"ELSE CAST($num div element_at(sk, $K) AS BIGINT) END").as("kmv_est"))
          .orderBy(col("grp"))
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some {
        val K = TextQueries.KmvK
        val num = (K - 1).toLong * Hashing.H32Max
        val h = Hashing.h32Sql("term")
        s"""WITH toks AS (
           |  SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'a' ELSE 'b' END AS grp,
           |         unnest(${TextAnalysis.shinglesSql("text", TextQueries.KmvShingleK)}) AS term
           |  FROM documents
           |),
           |gh AS (SELECT DISTINCT grp, $h AS h FROM toks),
           |sk AS (
           |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
           |  FROM gh
           |)
           |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
           |       CAST(MAX(h) AS BIGINT) AS kth_hash,
           |       CASE WHEN COUNT(*) < $K THEN CAST(COUNT(*) AS BIGINT)
           |            ELSE CAST($num // MAX(h) AS BIGINT) END AS kmv_est
           |FROM sk WHERE rn <= $K
           |GROUP BY grp
           |ORDER BY grp""".stripMargin
      }
    ),

    // streaming Misra–Gries heavy hitters — the second streaming sketch,
    // and the harder grading problem: unlike KMV, MG summary CONTENTS are
    // arrival-order-dependent, so the stream cannot be value-compared to a
    // batch run; what holds for ANY order is the theorem, and the grade
    // exposes exactly the batch q_heavy_hitters consequence — every term
    // with exact count > N/(k+1) must appear in the summary (`ok` pinned
    // TRUE by the oracle). Terms shard BY TERM HASH across 8 state
    // partitions ([[Streaming.mgSketch]]): each shard folds the classic
    // O(k) counter update across micro-batches (fed in four), and because
    // a term's entire stream lives in one shard, the plain union of shard
    // summaries is a valid global summary with the full N/(k+1) guarantee
    // — the reader never weakens the bound. The exact-count arm exists to
    // GRADE the sketch (as in every graded-sketch query); production
    // drops it.
    QueryDef(
      "q_streaming_heavy_hitters",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val K = TextQueries.HhK
        val input = MemoryStream[TokenDoc]
        val docs = Tables.documents(spark, dir)
          .select(col("source"), col("text")).as[TokenDoc].collect()
        val sink = s"streaming_hh_${runId.incrementAndGet()}"
        val shardTerms = input.toDF()
          .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
          .select(pmod(Hashing.h32(col("term")), lit(8)).cast("int").as("shard"),
                  col("term"))
          .as[Streaming.ShardTerm]
        val q = Streaming.mgSketch(shardTerms, K)
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        docs.grouped(math.max(1, docs.length / 4 + 1)).foreach { chunk =>
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        q.stop(); q.awaitTermination()
        val w = Window.partitionBy(col("shard")).orderBy(col("n_seen").desc)
        val summary = spark.table(sink)
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(explode(map_keys(col("summary"))).as("term"))
          .distinct()
          .withColumn("in_summary", lit(true))
        val terms = Tables.documents(spark, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        val cnt = terms.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
        val tot = cnt.agg(sum(col("n_exact")).cast("long").as("n_total"))
        val guaranteed = col("n_exact") * (K + 1).toLong > col("n_total")
        val top = cnt.orderBy(col("n_exact").desc, col("term").asc)
          .limit(TextQueries.HhTop)
        val guar = cnt.crossJoin(broadcast(tot))
          .where(guaranteed).select(col("term"), col("n_exact"))
        val out = top.union(guar).distinct()
          .crossJoin(broadcast(tot))
          .join(broadcast(summary), Seq("term"), "left")
          .select(col("term"), col("n_exact"),
                  guaranteed.as("guaranteed"),
                  (!guaranteed || coalesce(col("in_summary"), lit(false))).as("ok"))
          .orderBy(col("n_exact").desc, col("term").asc)
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some {
        val K = TextQueries.HhK
        s"""WITH t AS (
           |  SELECT unnest(${TextAnalysis.tokensSql("text")}) AS term FROM documents
           |),
           |cnt AS (SELECT term, COUNT(*) AS n_exact FROM t GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n_exact) AS BIGINT) AS n_total FROM cnt),
           |sel AS (
           |  SELECT term, n_exact FROM (
           |    SELECT term, n_exact FROM cnt
           |    ORDER BY n_exact DESC, term ASC LIMIT ${TextQueries.HhTop})
           |  UNION
           |  SELECT term, n_exact FROM cnt CROSS JOIN tot
           |  WHERE n_exact * ${K + 1} > n_total
           |)
           |SELECT term, n_exact,
           |       (n_exact * ${K + 1} > n_total) AS guaranteed,
           |       TRUE AS ok
           |FROM sel CROSS JOIN tot
           |ORDER BY n_exact DESC, term ASC""".stripMargin
      }
    ),

    // the FILE-BASED streaming source — the one streaming query whose
    // input is NOT a MemoryStream: events are landed as a multi-file
    // parquet directory (the "files arriving in a landing zone" shape —
    // 8 hash-partitioned files standing in for 8 ingestion batches), then
    // `readStream.schema(...).parquet(dir)` discovers and processes them
    // INCREMENTALLY — maxFilesPerTrigger=3 forces ≥3 separate microbatches
    // under Trigger.AvailableNow, so the complete-mode aggregation state
    // genuinely folds across batches rather than seeing one big batch.
    // The schema is EXPLICIT (a streaming file source requires it — no
    // inference pass over a 100 TB landing zone), value rides as exact
    // integer cents so the cross-batch fold is order-independent, and the
    // oracle computes the same rollup from the original events table: a
    // missed file, double-processed file, or state-fold defect all
    // hash-mismatch. This retires the "all streaming inputs are
    // MemoryStream" caveat for the source side of the surface.
    QueryDef(
      "q_streaming_file_source",
      (spark, dir) => {
        graft.GraftSession.tune(spark)
        val land = StorageQueries.target("stream_land_events")
        val batch = Tables.events(spark, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
                  col("event_type"), col("value"))
        batch.repartition(8, col("event_id"))
          .write.mode("overwrite").parquet(land)
        val sink = s"streaming_file_source_${runId.incrementAndGet()}"
        val q = spark.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", "3")
          .parquet(land)
          .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast(LongType).as("n_events"),
               sum(col("cents")).cast(LongType).as("total_cents"),
               min(col("event_id")).cast(LongType).as("min_event_id"),
               max(col("event_id")).cast(LongType).as("max_event_id"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.awaitTermination()
        val out = spark.table(sink)
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents,
             |       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
             |       CAST(MAX(event_id) AS BIGINT) AS max_event_id
             |FROM events
             |GROUP BY 1""".stripMargin)
    ),

    // streaming CDC snapshot maintenance ([[Streaming.cdcState]]): the
    // events changelog replayed in FOUR micro-batches through per-key LWW
    // `mapGroupsWithState` (O(1) state per key — the state IS the
    // materialized row), checked bit-for-bit against the SAME batch
    // DuckDB oracle as q_cdc_snapshot. Valid because LWW by the total
    // order (ts, event_id) is an order- and batch-boundary-insensitive
    // fold, so the stream must land on exactly the batch snapshot — the
    // q_streaming_kmv grading pattern applied to materialized-view
    // maintenance. Update-mode emissions accumulate in the sink; the
    // latest per key is selected by its monotone n_changes.
    QueryDef(
      "q_streaming_cdc",
      (spark, dir) => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Streaming.CdcChange]
        val changes = Tables.events(spark, dir)
          .select(col("user_id"),
                  expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_micros"),
                  col("event_id"),
                  when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
                  expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
          .as[Streaming.CdcChange].collect()
        val sink = s"streaming_cdc_${runId.incrementAndGet()}"
        val q = Streaming.cdcState(input.toDS())
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        changes.grouped(math.max(1, changes.length / 4 + 1)).foreach { chunk =>
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        q.stop(); q.awaitTermination()
        val w = Window.partitionBy(col("user_id")).orderBy(col("n_changes").desc)
        val out = spark.table(sink)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1 && col("op") === "U")
          .select(col("user_id"),
                  expr("timestamp_micros(ts_micros)").as("last_ts"),
                  col("event_id").cast(LongType).as("last_event_id"),
                  col("cents").cast(LongType).as("last_cents"),
                  col("n_changes").cast(LongType).as("n_changes"))
        val resolved = out.localCheckpoint(eager = true)
        spark.catalog.dropTempView(sink)
        resolved
      },
      // the batch q_cdc_snapshot oracle verbatim: the stream must agree
      Some("""WITH ch AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM events
             |),
             |r AS (
             |  SELECT user_id, ts, event_id, op, cents,
             |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
             |         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
             |  FROM ch
             |)
             |SELECT user_id, ts AS last_ts, CAST(event_id AS BIGINT) AS last_event_id,
             |       cents AS last_cents, CAST(n_changes AS BIGINT) AS n_changes
             |FROM r WHERE rn = 1 AND op = 'U'""".stripMargin)
    )
  )

  /** One document in the KMV stream feed (source half + text only). */
  final case class TokenDoc(source: String, text: String)
}
