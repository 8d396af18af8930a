package graft

import org.apache.spark.sql.functions._
import graft.sources.KafkaShaped

/** SURVEY §2.2 row 34: the Kafka storage-handler record model (key/value +
  * topic/partition/offset/timestamp metadata, per-key partition affinity,
  * offset-resumed consumption, streaming reads), exercised against the
  * file-backed façade. Production swaps `format("kafka")` — same schema.
  */
class KafkaShapedSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_kafka_").toString + "/topic"

  private def batch(ids: Range) = {
    import spark.implicits._
    ids.map(i => (s"user_${i % 7}", s"""{"event":$i}""",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00")))
      .toDF("key", "value", "ts")
  }

  test("produce assigns kafka schema, key-sticky partitions, dense per-partition offsets") {
    import spark.implicits._
    val dir = tmp()
    KafkaShaped.produce(batch(0 until 100), dir, "events", numPartitions = 4)
    val rec = spark.read.parquet(dir)
    assert(rec.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      KafkaShaped.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(rec.count() === 100)
    assert(rec.select($"topic").distinct().head().getString(0) === "events")
    // per-key partition affinity (the Kafka ordering contract)
    assert(rec.groupBy($"key").agg(countDistinct($"partition").as("np"))
      .filter($"np" > 1).count() === 0)
    // offsets are dense 0..n-1 within every partition
    val perPart = rec.groupBy($"partition")
      .agg(count(lit(1)).as("n"), min($"offset").as("lo"), max($"offset").as("hi"),
        countDistinct($"offset").as("d"))
      .collect()
    perPart.foreach { r =>
      assert(r.getLong(r.fieldIndex("lo")) === 0L)
      assert(r.getLong(r.fieldIndex("hi")) === r.getLong(r.fieldIndex("n")) - 1)
      assert(r.getLong(r.fieldIndex("d")) === r.getLong(r.fieldIndex("n")))
    }
  }

  test("second produce continues offsets; readBatch resumes from committed offsets") {
    import spark.implicits._
    val dir = tmp()
    KafkaShaped.produce(batch(0 until 60), dir, "events", numPartitions = 3)
    val committed = KafkaShaped.latestOffsets(spark, dir).map { case (p, o) => p -> (o + 1) }
    KafkaShaped.produce(batch(60 until 100), dir, "events", numPartitions = 3)
    val all = KafkaShaped.readBatch(spark, dir)
    assert(all.count() === 100)
    // offsets stayed dense across the two produces (no restart at 0)
    all.groupBy($"partition")
      .agg(count(lit(1)).as("n"), max($"offset").as("hi")).collect()
      .foreach(r => assert(r.getLong(r.fieldIndex("hi")) === r.getLong(r.fieldIndex("n")) - 1))
    // resuming from the committed map yields exactly the second batch
    val resumed = KafkaShaped.readBatch(spark, dir, committed)
    assert(resumed.count() === 40)
    assert(resumed.select($"value".cast("string")).as[String].collect()
      .forall(v => v.stripPrefix("""{"event":""").stripSuffix("}").toInt >= 60))
  }

  test("streaming read sees produced records with metadata columns intact") {
    import spark.implicits._
    val dir = tmp()
    KafkaShaped.produce(batch(0 until 30), dir, "events", numPartitions = 2)
    val stream = KafkaShaped.readStream(spark, dir)
      .select($"partition", $"offset", $"timestamp",
        $"key".cast("string").as("k"), $"value".cast("string").as("v"))
    val q = graft.streaming.Streams.drainToMemory(stream, "kafka_shaped_stream")
    try {
      val got = spark.table("kafka_shaped_stream")
      assert(got.count() === 30)
      assert(got.filter($"offset".isNull || $"partition".isNull).count() === 0)
      assert(got.select(countDistinct($"k")).head().getLong(0) === 7)
    } finally q.stop()
  }

  test("offset sidecar matches the data and falls back to a scan when absent") {
    import spark.implicits._
    val dir = tmp()
    KafkaShaped.produce(batch(0 until 50), dir, "events", numPartitions = 3)
    KafkaShaped.produce(batch(50 until 90), dir, "events", numPartitions = 3)
    val fromSidecar = KafkaShaped.latestOffsets(spark, dir)
    val fromScan = KafkaShaped.scanOffsets(spark, dir)
    assert(fromSidecar === fromScan)
    // external writer scenario: sidecar gone -> scan fallback, same answer,
    // and the next produce rebuilds it consistently
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_graft_offsets"), false)
    assert(KafkaShaped.latestOffsets(spark, dir) === fromScan)
    KafkaShaped.produce(batch(90 until 100), dir, "events", numPartitions = 3)
    assert(KafkaShaped.latestOffsets(spark, dir) ===
      KafkaShaped.scanOffsets(spark, dir))
    assert(KafkaShaped.readBatch(spark, dir).count() === 100)
  }

  test("kafka stream composes with windowed aggregation (stream = batch)") {
    import spark.implicits._
    val dir = tmp()
    KafkaShaped.produce(batch(0 until 100), dir, "events", numPartitions = 4)
    // the standard consumer shape: value bytes -> JSON -> event-time window
    def shape(records: org.apache.spark.sql.DataFrame) = records
      .select($"timestamp".as("ts"),
        get_json_object($"value".cast("string"), "$.event").cast("long").as("event"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"), sum($"event").as("s"))
      .select($"window.start".as("w"), $"n", $"s")
    val q = graft.streaming.Streams.drainToMemory(
      shape(KafkaShaped.readStream(spark, dir)), "kafka_windowed", "complete")
    try {
      val streamed = spark.table("kafka_windowed").orderBy($"w")
        .collect().map(_.toSeq).toSeq
      val batched = shape(KafkaShaped.readBatch(spark, dir)).orderBy($"w")
        .collect().map(_.toSeq).toSeq
      assert(streamed === batched)
      assert(streamed.map(_(1).asInstanceOf[Long]).sum === 100L)
    } finally q.stop()
  }

  test("null keys round-robin instead of landing in one partition") {
    import spark.implicits._
    val dir = tmp()
    val nulls = spark.range(40).select(
      lit(null).cast("string").as("key"),
      concat(lit("v"), $"id").as("value"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
    KafkaShaped.produce(nulls, dir, "events", numPartitions = 4)
    val spread = spark.read.parquet(dir)
      .groupBy($"partition").count().collect()
    assert(spread.length === 4) // every partition got some of the null-key flow
  }
}
