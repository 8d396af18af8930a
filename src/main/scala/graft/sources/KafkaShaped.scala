package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped source/sink façade (SURVEY §2.2 row 34) — the record model
  * of the reference's Kafka storage handler (ref kafka-handler/src/java/org/
  * apache/hadoop/hive/kafka/KafkaStorageHandler.java and
  * KafkaInputFormat.java: a topic surfaced as a table with `__key`,
  * `__partition`, `__offset`, `__timestamp` metadata columns, offset-bounded
  * scans, and one split per topic-partition), implemented file-backed so the
  * semantics are testable in this container.
  *
  * A "topic" is a parquet directory whose rows carry exactly Spark's
  * `format("kafka")` schema ([[KafkaShaped.schema]]). Producing assigns
  * `partition = hash(key) mod numPartitions` (same key -> same partition ->
  * per-key total order, the Kafka contract) and a per-partition monotonically
  * increasing `offset`. Consuming supports batch reads from per-partition
  * starting offsets (the committed-offsets resume pattern) and a streaming
  * read via the file source — swap `spark.readStream.format("kafka")` in
  * production; every downstream transform is schema-compatible and unchanged.
  *
  * Scale: one topic-partition maps to one task (exactly the handler's split
  * model); offset assignment shuffles only the producing batch, keyed by
  * partition; offset-bounded consumption is a pushed-down filter on the
  * (partition, offset) columns.
  */
object KafkaShaped {

  /** Spark's format("kafka") record schema, byte-for-byte. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Hidden sidecar holding the per-partition high-water marks ("p:off"
    * lines), maintained transactionally by [[produce]] — the broker's
    * offset index analog. Keeps high-water lookup O(partitions) instead of
    * a full topic scan per produce; a missing sidecar (external writer,
    * pre-sidecar topic) falls back to the scan. Underscore-prefixed, so
    * parquet readers ignore it. Single-writer, like the rest of the module.
    */
  private def offsetsPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_offsets")

  /** Current high-water offset per partition (next offset to assign is +1).
    * Driver-side, bounded by partition count — metadata scale.
    */
  def latestOffsets(spark: SparkSession, dir: String): Map[Int, Long] = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) Map.empty
    else if (fs.exists(offsetsPath(dir))) {
      val in = fs.open(offsetsPath(dir))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(p, o) = l.split(":"); p.toInt -> o.toLong
      }.toMap
    } else scanOffsets(spark, dir)
  }

  /** High-water marks from the data itself (sidecar-free fallback). */
  def scanOffsets(spark: SparkSession, dir: String): Map[Int, Long] =
    spark.read.schema(schema).parquet(dir)
      .groupBy(col("partition")).agg(max(col("offset")).as("hw"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private def writeOffsets(spark: SparkSession, dir: String,
      hw: Map[Int, Long]): Unit = {
    val fs = fsOf(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, "._graft_offsets_tmp")
    val out = fs.create(tmp, true)
    try out.write(hw.toSeq.sorted.map { case (p, o) => s"$p:$o" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(offsetsPath(dir), false)
    if (!fs.rename(tmp, offsetsPath(dir)))
      throw new IllegalStateException(s"cannot commit offset sidecar under $dir")
  }

  /** Append records to a topic dir. `records` must carry `key` and `value`
    * (binary or string — strings are encoded utf8) and a `ts` timestamp
    * column (Kafka CreateTime). Partition = pmod(xxhash64(key), n); NULL
    * keys round-robin over partitions by input order. Offsets continue from
    * the partition's current high-water mark; within one produce call,
    * records are ordered by `ts` then input order (a producer's send order).
    */
  def produce(records: DataFrame, dir: String, topic: String,
      numPartitions: Int, keyCol: String = "key", valueCol: String = "value",
      tsCol: String = "ts"): Unit = {
    val spark = records.sparkSession
    val base = latestOffsets(spark, dir)
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until numPartitions).map(p =>
          org.apache.spark.sql.Row(p, base.getOrElse(p, -1L))), 1),
      StructType(Seq(StructField("partition", IntegerType, nullable = false),
        StructField("__base", LongType, nullable = false))))
    val seq = records
      .withColumn("__in", monotonically_increasing_id())
      .withColumn("partition",
        when(col(keyCol).isNotNull,
          pmod(xxhash64(col(keyCol).cast("binary")), lit(numPartitions.toLong)))
          .otherwise(pmod(col("__in"), lit(numPartitions.toLong)))
          .cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("partition")).orderBy(col(tsCol), col("__in"))
    val out = seq
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(broadcast(baseDf), Seq("partition"))
      .select(
        col(keyCol).cast("binary").as("key"),
        col(valueCol).cast("binary").as("value"),
        lit(topic).as("topic"),
        col("partition"),
        (col("__base") + col("__rn")).as("offset"),
        col(tsCol).cast("timestamp").as("timestamp"),
        lit(0).as("timestampType")) // 0 = CreateTime
      .localCheckpoint() // materialize once: appended AND max-offset'd below
    out.write.mode("append").parquet(dir)
    val batchHw = out.groupBy(col("partition")).agg(max(col("offset")).as("hw"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    writeOffsets(spark, dir, base ++ batchHw)
    // both consumers are done — free the batch's checkpoint blocks
    graft.Engine.releaseCheckpoint(out)
  }

  /** Batch read from per-partition starting offsets (exclusive-of-consumed:
    * pass the last committed offset + 1, or use [[latestOffsets]] + 1 as the
    * checkpoint). Partitions absent from the map read from the beginning —
    * `startingOffsets = Map.empty` is "earliest".
    */
  def readBatch(spark: SparkSession, dir: String,
      startingOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    val df = spark.read.schema(schema).parquet(dir)
    if (startingOffsets.isEmpty) df
    else {
      val cond = startingOffsets.map { case (p, from) =>
        col("partition") === p && col("offset") < from
      }.reduce(_ || _)
      df.filter(!coalesce(cond, lit(false)))
    }
  }

  /** Streaming read of a topic dir — new files appended by [[produce]] are
    * discovered per micro-batch, the file-source twin of
    * `readStream.format("kafka")` (identical schema, so downstream
    * transforms port unchanged).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
