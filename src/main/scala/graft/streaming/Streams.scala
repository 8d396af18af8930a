package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming facade (SURVEY §2.7).
  *
  * The reference's streaming surface is ingest-only
  * (streaming/.../HiveStreamingConnection.java:107 — transactional record
  * append; kafka-handler for offset-based pull). This module exposes the
  * continuous-query capabilities a modern pipeline expects, as thin
  * compositions of Spark's native streaming operators: tumbling/sliding
  * windows, session windows, watermarked late-data handling, streaming dedup,
  * and stream-static joins. Every transform here is identical to its batch
  * twin in graft.queries.EventQueries — the same expressions run over
  * readStream.
  */
object Streams {

  /** File-source stream over an events-shaped parquet directory. `ts`
    * normalizes to session-zoned TIMESTAMP whatever the stored type, same as
    * Engine.table (testdata generations vary: ns-long vs TIMESTAMP_NTZ).
    */
  def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Engine.configure(spark)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    graft.Engine.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Tumbling-window counts with a watermark for late data. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Sliding-window aggregate. */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows per user (gap-based). */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-duplicate suppression: the streaming twin of
    * `Dedup.withMinhash` + keep-first. Signatures are map-side codegen'd
    * expressions, so they attach to a stream unchanged; dedup keys on the
    * full MinHash signature (documents whose shingle sets collide on every
    * permutation are near-identical) within the watermark horizon. State is
    * bounded by distinct signatures per horizon — the streaming analog of the
    * batch keep-first pass.
    */
  def dedupNearDuplicates(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "2 hours", shingleSize: Int = 3,
      numHashes: Int = 16): DataFrame =
    docs
      .withColumn("_minhash_sig", graft.functions.TextHashColumns
        .minhashSignature(graft.operators.TextAnalysis.tokens(col(textCol)),
          shingleSize, numHashes))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_minhash_sig")
      .drop("_minhash_sig")

  /** Streaming contamination monitor: the streaming twin of
    * `Decontaminate.overlapStats` for docs arriving on a stream. Gram
    * generation is the same map-side shingle projection; the benchmark gram
    * set is static (stream-static equi-join, broadcast by Catalyst); the
    * per-document overlap count is a keyed streaming aggregation, so run it
    * in update/complete mode. Emits `(idCol, n_overlap)` for documents at or
    * above `minOverlap` — the quarantine feed a training-data ingest pipeline
    * tails.
    */
  def contaminationMonitor(docs: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 4, minOverlap: Int = 2): DataFrame = {
    val benchGrams = broadcast(graft.operators.Decontaminate
      .grams(benchmark, idCol, textCol, k).select(col("__gram")).distinct())
    graft.operators.Decontaminate.grams(docs, idCol, textCol, k)
      .join(benchGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Stream-stream event-time range join (click attribution): each `click`
    * joins the same user's `purchase` events inside `[click_ts, click_ts +
    * horizon]`. On streams, BOTH sides carry a watermark and the join
    * condition bounds event time on both inputs — exactly what Structured
    * Streaming needs to age out join state, so per-key buffered state is
    * bounded by `watermark + horizon` of input, never the whole stream.
    * At 100 TB/day the join is one shuffle keyed on user_id; the range
    * predicate is a residual on the sorted match, not a second shuffle.
    * Works identically on batch frames (watermarks are streaming-only
    * physical hints; the batch twin is the e08 oracle query).
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "6 hours", watermark: String = "12 hours",
      joinType: String = "inner"): DataFrame = {
    // watermark AFTER the rename so it tags the attribute the join
    // condition actually references
    def wm(df: DataFrame, tsCol: String) =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val c = wm(clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts")), "click_ts")
    val p = wm(purchases
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts")),
      "purchase_ts")
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .drop("p_user_id")
  }

  /** Left-outer attribution (the funnel view): every click emits, matched
    * or with NULL purchase columns. On streams this is the watermark-
    * driven outer join — an unmatched click's NULL row emits once both
    * watermarks pass its eligibility window (click_ts + horizon), which is
    * also when its buffered state evicts, so state stays bounded exactly
    * as in the inner variant. Batch frames evaluate it as a plain left
    * join (the e09 oracle).
    */
  def attributionFunnel(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "6 hours", watermark: String = "12 hours"): DataFrame =
    clickAttribution(clicks, purchases, horizon, watermark, "left_outer")

  /** Stream-static enrichment join (static side broadcast by Catalyst). */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(dim, events(eventKey) === dim(dimKey), "left_outer")

  /** Run a streaming DataFrame to completion against a memory sink and return
    * the finished query (test/drain harness; production sinks use
    * writeStream.format(...) directly).
    */
  def drainToMemory(df: DataFrame, name: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming upsert sink: each micro-batch MERGEs into a parquet table by
    * key (insert new keys, overwrite matched rows) — the Structured Streaming
    * analog of Hive's transactional ingest API (HiveStreamingConnection.java:
    * 107). Commit granularity is per-LEAF, not per-batch: the bucketed layout
    * commits via sequential per-bucket renames, so a mid-batch failure can
    * leave some buckets updated and others not; each bucket swap is
    * individually atomic, failures restore any bucket staged in its
    * `._cow_bak_*` dir before rethrowing, and replaying the micro-batch is
    * idempotent (same keys → same buckets → same post-image).
    *
    * Scale design: the table is laid out in `numBuckets` hash-bucket
    * partitions of the key (a `bucketCol=N` directory layout, derived
    * deterministically as xxhash64(key) mod numBuckets). The per-batch MERGE
    * goes through Dml's partition-pruned copy-on-write, so a micro-batch
    * rewrites only the buckets its keys hash into — cost proportional to the
    * batch's bucket coverage, not to accumulated table size. Size numBuckets
    * so one bucket ≈ a few HDFS blocks at the target scale.
    *
    * Within a batch, the surviving row per key is the one with the greatest
    * `versionCol` (e.g. an event timestamp) — streams carry no row order, so
    * deterministic last-writer-wins needs an explicit version; with
    * `versionCol = None` the within-batch winner is arbitrary (documented,
    * not last-writer). Cross-batch, later batches always win. Rows with a
    * NULL key are dropped: a MERGE key never matches NULL, so they would
    * re-insert on every batch. The bucket column is part of the stored
    * schema (it reads back as the table's last column).
    */
  def upsertSink(df: DataFrame, path: String, key: String,
      versionCol: Option[String] = None, numBuckets: Int = 16,
      bucketCol: String = "bucket_id"): StreamingQuery = {
    import org.apache.spark.sql.DataFrame
    val q = df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val keyed = batch.filter(col(key).isNotNull)
        val deduped = versionCol match {
          case Some(v) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col(key)).orderBy(col(v).desc)
            keyed.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") === 1).drop("_rn")
          case None => keyed.dropDuplicates(key)
        }
        val bucketed = deduped.withColumn(bucketCol,
          pmod(xxhash64(col(key)), lit(numBuckets.toLong)))
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
          bucketed.write.partitionBy(bucketCol).parquet(path)
        else
          // matched rows keep their bucket (the key, hence the hash, is
          // unchanged) — bucketCol is never assigned, so Dml's pruned COW
          // rewrites only buckets containing this batch's matched keys and
          // appends inserts into their hash buckets. Plain column names
          // resolve to the source (batch) row inside Dml.merge; the batch is
          // already deduped by key, so the cardinality guard is skipped.
          graft.plans.Dml.merge(spark, path, bucketed, key, key,
            whenMatchedSet = deduped.columns.filterNot(_ == key)
              .map(c => c -> col(c)).toMap,
            sourceKeysUnique = true)
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Custom stateful operator: running per-user aggregate maintained with
    * flatMapGroupsWithState — the extension point for state Spark's built-in
    * windows can't express (Hive has no equivalent; its GenericUDAFEvaluator
    * state lives within one query). Emits one update per user per
    * micro-batch: (user_id, events_seen, total_value).
    */
  case class UserRunning(user_id: Long, events_seen: Long, total_value: Double)

  def runningUserTotals(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) => {
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          Iterator(UserRunning(user, n, v))
        })
  }

  /** Transactional-ish file sink mirroring HiveStreamingConnection semantics:
    * per-batch atomic parquet append via foreachBatch (each micro-batch lands
    * in its own directory, committed by Spark's file-commit protocol).
    */
  def parquetAppendSink(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("append").parquet(path)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** End-to-end exactly-once append sink into a snapshot table (which must
    * already exist): each micro-batch commits one manifest version stamped
    * with (streamId, batchId), so a batch replayed after a crash-restart
    * finds itself already in the log and no-ops — at-least-once delivery
    * from the checkpoint becomes exactly-once in the table. Readers get
    * snapshot isolation over the stream's output for free, and
    * [[graft.plans.Snapshots.SnapshotTable.compact]] folds the micro-batch
    * file debris without blocking the writer.
    */
  /** A sink target may be a snapshot root path or a catalog name registered
    * in [[graft.plans.NamedTables]] — resolved once at sink construction.
    */
  private def rootOf(s: String): String = graft.plans.NamedTables.get(s) match {
    case Some(r: graft.plans.NamedTables.SnapshotRef) => r.root
    case _ => s
  }

  def snapshotAppendSink(df: DataFrame, tableRoot: String,
      streamId: String): StreamingQuery = {
    val root = rootOf(tableRoot)
    val q = df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.plans.Snapshots.table(batch.sparkSession, root)
          .appendBatch(batch, streamId, batchId)
        ()
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming upsert into a snapshot table: each micro-batch is deduped by
    * key (highest `versionCol` wins, like [[upsertSink]]) and MERGEd —
    * matched keys update, new keys insert, at file granularity with the
    * table's optimistic concurrency (a racing batch/compaction replays
    * cleanly). Crash-replay safe WITHOUT batch stamping: re-applying the
    * same keyed upsert converges to the same state — a replayed update
    * rewrites the same values, a replayed insert finds its key matched and
    * updates in place. NULL keys drop (a MERGE key never matches NULL).
    */
  def snapshotUpsertSink(df: DataFrame, tableRoot: String, key: String,
      versionCol: Option[String] = None): StreamingQuery = {
    val root = rootOf(tableRoot)
    val q = df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyed = batch.filter(col(key).isNotNull)
        val deduped = versionCol match {
          case Some(v) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col(key)).orderBy(col(v).desc)
            keyed.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") === 1).drop("_rn")
          case None => keyed.dropDuplicates(key)
        }
        val t = graft.plans.Snapshots.table(batch.sparkSession, root)
        t.merge(deduped, key, key,
          whenMatchedSet = deduped.columns.filterNot(_ == key)
            .map(c => c -> col(c)).toMap,
          sourceKeysUnique = true)
        ()
      }
      .start()
    q.processAllAvailable()
    q
  }
}
