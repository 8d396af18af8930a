package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.plans.{NamedTables, Snapshots}

/** Structured Streaming SOURCE over a snapshot table's manifest log — the
  * table-format streaming read (Delta's streaming source design; the
  * reference instead streams via metastore-txn ingest, ref streaming/src/
  * java/org/apache/hive/streaming/HiveStreamingConnection.java:63 — its
  * tables are stream TARGETS, consumers poll ACID deltas):
  *
  * {{{
  *   spark.readStream.format("snapshot-stream").load(rootOrName)
  * }}}
  *
  * Offsets are manifest VERSIONS (checkpointable longs). The first batch of
  * a fresh query is the full current snapshot; each later batch is exactly
  * the files ADDED by the commits in the offset range, so a committed
  * version is emitted exactly once — end-to-end exactly-once when paired
  * with [[Streams.snapshotAppendSink]]'s idempotent batch commit. Options:
  *
  *   - `ignoreDeletes` (false): skip data-removing commits
  *     (DELETE/TRUNCATE) instead of failing the stream.
  *   - `ignoreChanges` (false): re-emit files rewritten by UPDATE/MERGE/
  *     OVERWRITE commits instead of failing (downstream must tolerate
  *     duplicates — the standard table-format streaming contract).
  *
  * Compaction/clustering (data-identical) and schema-evolution commits
  * emit nothing. Columns bind by physical identity at stream start, so a
  * mid-stream RENAME COLUMN keeps the stream flowing under its original
  * names.
  */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "snapshot-stream"

  private def rootOf(parameters: Map[String, String]): String = {
    val p = parameters.getOrElse("path", parameters.getOrElse("table",
      throw new IllegalArgumentException(
        "snapshot-stream needs .load(<root-or-registered-name>) or option 'table'")))
    NamedTables.get(p) match {
      case Some(r: NamedTables.SnapshotRef) => r.root
      case Some(other) => throw new IllegalArgumentException(
        s"'$p' is registered but not a snapshot table: $other")
      case None => p // treat as a filesystem root
    }
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val t = Snapshots.table(spark, rootOf(parameters))
    (shortName(), t.read().schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotStreamSource(sqlContext.sparkSession, rootOf(parameters),
      ignoreDeletes = parameters.get("ignoreDeletes").exists(_.toBoolean),
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean))
}

/** See [[SnapshotSourceProvider]]. Offset N = "versions up to and including
  * manifest version N have been emitted".
  */
class SnapshotStreamSource(spark: SparkSession, root: String,
    ignoreDeletes: Boolean, ignoreChanges: Boolean) extends Source {

  private val table = Snapshots.table(spark, root)
  // the stream's column identity, fixed at query start: logical names plus
  // their physical bindings (rename-proof; see Snapshots.streamBatch)
  private val startManifest = table.latest()
  private val streamMapping = startManifest.colMapping
  override val schema: StructType = table.read().schema

  override def getOffset: Option[V1Offset] = {
    val v = table.latest().version
    if (v < 0) None else Some(LongOffset(v))
  }

  private def versionOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame =
    table.streamBatch(start.map(versionOf), versionOf(end), schema,
      streamMapping, ignoreDeletes, ignoreChanges)

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$root]"
}
