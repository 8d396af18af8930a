package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Watermark semantics under controlled micro-batches: late data beyond the
  * watermark is dropped from append-mode windowed aggregation; dedup state is
  * bounded by the watermark horizon.
  */
class WatermarkSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode windowed agg drops events later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Double)]
    val agg = source.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("wm_agg")
      .outputMode("append").start()
    try {
      // batch 1: events at 10:00-10:04, then 10:30 (advances watermark to 10:20)
      source.addData((ts("2024-01-01 10:00:30"), 1.0), (ts("2024-01-01 10:03:00"), 1.0))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      // batch 3: a late event at 10:01 — window [10:00,10:05) is already
      // finalized (watermark 10:20) -> dropped
      source.addData((ts("2024-01-01 10:01:00"), 99.0))
      q.processAllAvailable()
      // batch 4: advance watermark far enough to close every window
      source.addData((ts("2024-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_agg").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      // the 10:00 window emitted exactly 2 — the late 10:01 event was dropped
      assert(rows("2024-01-01 10:00:00.0") === 2L)
      assert(q.lastProgress != null)
    } finally q.stop()
  }

  test("stream-stream join within event-time bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user", "cts").withWatermark("cts", "10 minutes")
    val b = buys.toDF().toDF("buser", "bts").withWatermark("bts", "10 minutes")
    val joined = c.join(b,
      expr("user = buser AND bts BETWEEN cts AND cts + INTERVAL 15 minutes"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      buys.addData((1L, ts("2024-01-01 10:05:00")),  // within 15m -> joins
        (2L, ts("2024-01-01 10:30:00")))             // outside bound -> no join
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(0) === 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val dedup = source.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      source.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:00:01")),
        (2L, ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      source.addData((1L, ts("2024-01-01 10:05:00"))) // duplicate within horizon
      q.processAllAvailable()
      assert(spark.table("wm_dedup").count() === 2) // ids 1 and 2 once each
    } finally q.stop()
  }
}
