package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, regexp_extract, when}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.AcidOrc

/** Structured Streaming SOURCE over a live ACID warehouse directory — tail
  * the reference's transactional ingest (streaming/HiveStreamingConnection
  * .java commits whole `delta_w_w` dirs; consumers poll for new write ids,
  * which is exactly this source's offset model):
  *
  * {{{
  *   spark.readStream.format("acid-stream").load("/warehouse/db/t")
  * }}}
  *
  * Offsets are WRITE IDS (checkpointable longs). The first batch of a
  * fresh query is the full current snapshot (reconstructed as of the
  * offset's write id — deletes applied); each later batch is exactly the
  * rows added by delta dirs committed in the offset range, so a write id
  * is emitted once. Writers commit delta dirs atomically (staged + rename,
  * both in the reference and [[AcidOrc.appendDelta]]), which is what makes
  * the listing-based offset safe. Options:
  *
  *   - `ignoreDeletes` (false): skip delete_delta commits instead of
  *     failing the stream (downstream then misses retractions — the
  *     standard table-format streaming opt-in).
  *   - `withChangeType` (false): CDC shape mirroring the snapshot CDC
  *     surface — every row carries `_change_type` (`insert` | `delete`)
  *     and `_commit_writeid`; delete commits arrive as full pre-image
  *     retraction rows instead of failing the stream. The first batch is
  *     the snapshot, all `insert`, with each row's inserting write id.
  *
  * Compaction spans straddling consumed ids emit nothing (data-identical).
  * The schema is fixed at query start; columns added to the table
  * mid-stream are dropped, columns the stream expects but a batch lacks
  * read NULL. The migration story composes: tail the live warehouse here
  * while batch queries move to the CONVERTed snapshot table.
  */
class AcidSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "acid-stream"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", parameters.getOrElse("table",
      throw new IllegalArgumentException(
        "acid-stream needs .load(<acid table dir>) or option 'table'")))

  private def cdcOf(parameters: Map[String, String]): Boolean =
    parameters.get("withChangeType").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val s = sqlContext.sparkSession
    val root = rootOf(parameters)
    val base =
      if (graft.sources.AcidMm.detectKind(s, root) == "insert_only")
        graft.sources.AcidMm.read(s, root).schema
      else AcidOrc.read(s, root).schema
    (shortName(),
      if (!cdcOf(parameters)) base
      else StructType(base.fields.toSeq ++ Seq(
        StructField("_change_type", StringType, nullable = false),
        StructField("_commit_writeid", LongType, nullable = false))))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new AcidStreamSource(sqlContext.sparkSession, rootOf(parameters),
      ignoreDeletes = parameters.get("ignoreDeletes").exists(_.toBoolean),
      withChangeType = cdcOf(parameters))
}

/** Process-global registry of live `acid-stream` consumers' COMMITTED
  * offsets per table root — what minor compaction's `consumerFloor`
  * safety needs (a fold spanning a lagging consumer's offset would hide
  * its unconsumed write ids). Sources report on `commit` and deregister
  * on `stop`; `COMPACT HIVE ACID ... 'minor'` wires [[lowestFloor]] in
  * automatically. In-memory and session-process-scoped, like the V1
  * source itself — consumers in other processes still need an explicit
  * floor.
  */
object AcidStreamRegistry {
  // keyed by the SOURCE OBJECT (weakly): a query that dies without
  // calling stop() must not pin a stale floor forever, and object
  // identity cannot collide the way identityHashCode can
  private val floors = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, (String, Set[Long])]())

  private[streaming] def qualify(spark: SparkSession, root: String): String = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** Record a source's CURRENT protection points. A fold span may never
    * straddle any of them: the consumed floor (ids ≤ it are done) AND an
    * in-flight batch's latched end (the engine will re-request exactly
    * (start, end], so a span crossing `end` would hide the range on
    * retry — the reason getBatch registers BOTH bounds).
    */
  private[streaming] def protect(spark: SparkSession, source: AnyRef,
      root: String, writeIds: Set[Long]): Unit =
    floors.put(source, (qualify(spark, root), writeIds))

  private[streaming] def remove(source: AnyRef): Unit =
    floors.remove(source)

  /** Every live consumer's protection points for `root` (fold-split
    * boundaries), empty when none are registered (fold everything — the
    * reference compactor's default). A never-started source needs no
    * point: its first batch is a snapshot read, which compaction cannot
    * perturb.
    */
  def splitPoints(spark: SparkSession, root: String): Seq[Long] = {
    val q = qualify(spark, root)
    import scala.jdk.CollectionConverters._
    floors.synchronized {
      floors.values.asScala.toSeq.collect {
        case (r, ws) if r == q => ws
      }.flatten.distinct.sorted
    }
  }

  /** Back-compat single-floor view: the lowest protection point, -1 when
    * none.
    */
  def lowestFloor(spark: SparkSession, root: String): Long =
    splitPoints(spark, root).headOption.getOrElse(-1L)
}

/** See [[AcidSourceProvider]]. Offset N = "write ids up to and including N
  * have been emitted".
  */
class AcidStreamSource(spark: SparkSession, root: String,
    ignoreDeletes: Boolean, withChangeType: Boolean = false) extends Source {

  // insert-only (MM) trees share the write-id directory contract but
  // hold plain files — route their reads through AcidMm (kind pinned at
  // source creation; a table does not change flavor mid-stream)
  private val mm =
    graft.sources.AcidMm.detectKind(spark, root) == "insert_only"

  override val schema: StructType = {
    val base =
      if (mm) graft.sources.AcidMm.read(spark, root).schema
      else AcidOrc.read(spark, root).schema
    if (!withChangeType) base
    else StructType(base.fields.toSeq ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_writeid", LongType, nullable = false)))
  }

  override def getOffset: Option[V1Offset] = {
    val w = AcidOrc.maxWriteId(spark, root)
    if (w < 0) None else Some(LongOffset(w))
  }

  private def widOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  /** Batches bind to the stream's start-time schema by NAME: mid-stream
    * add-columns evolution widens the batch frame, which must not widen
    * the stream.
    */
  private def align(df: DataFrame): DataFrame =
    df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    // report protection points NOW — the engine calls commit() lazily (at
    // the next batch's construction), which can be never for an idle
    // stream. A snapshot batch (start=None) registers `end`: snapshot
    // reconstruction tolerates folds at any boundary, and retries re-read
    // the same snapshot. An incremental batch registers BOTH bounds:
    // `start` is the durably-consumed floor, and the latched `end` must
    // also stay fold-split-safe — the engine re-requests exactly
    // (start, end] on retry, and a fold span crossing `end` (new commits
    // folded together with the in-flight range) would hide it.
    AcidStreamRegistry.protect(spark, this, root,
      start.map(s => Set(widOf(s), widOf(end))).getOrElse(Set(widOf(end))))
    // MM rows carry no per-row transaction column: the committing dir's
    // write id (base_N folds read as N, pre-conversion files as 0) is
    // the honest CDC commit id
    def mmCommitId = {
      def num(re: String) = {
        val m = regexp_extract(input_file_name(), re, 1)
        when(m =!= "", m.cast("long")) // "" would be an ANSI cast error
      }
      coalesce(num("/delta_\\d+_(\\d+)(?:_\\d+)?/"),
        num("/base_(\\d+)(?:_v\\d+)?/"), lit(0L))
    }
    val batch = (start, mm) match {
      case (None, true) if withChangeType =>
        align(graft.sources.AcidMm.read(spark, root, maxWriteId = widOf(end))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_writeid", mmCommitId))
      case (None, true) =>
        align(graft.sources.AcidMm.read(spark, root, maxWriteId = widOf(end)))
      case (Some(s), true) =>
        val inc = graft.sources.AcidMm.readChanges(spark, root,
          widOf(s), widOf(end), withCommitId = withChangeType)
        align(if (!withChangeType) inc
          else inc.withColumn("_change_type", lit("insert")))
      case (None, _) if withChangeType =>
        // CDC first batch: the snapshot, all inserts, each row carrying
        // the write id that inserted it (originals: the reserved id 0)
        val ids = AcidOrc.readWithIds(spark, root,
          maxWriteId = widOf(end))
        align(ids
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_writeid", col("_acid_otid"))
          .drop("_acid_otid", "_acid_bucket", "_acid_rowid", "_acid_part"))
      case (None, _) =>
        align(AcidOrc.read(spark, root, maxWriteId = widOf(end)))
      case (Some(s), _) =>
        align(AcidOrc.readChanges(spark, root, widOf(s), widOf(end),
          ignoreDeletes, withChangeType))
    }
    // V1 Source contract: the returned frame must be streaming-tagged
    org.apache.spark.sql.GraftShims.asStreamingFrame(spark, batch)
  }

  override def commit(end: V1Offset): Unit =
    AcidStreamRegistry.protect(spark, this, root, Set(widOf(end)))

  override def stop(): Unit = AcidStreamRegistry.remove(this)

  override def toString: String = s"AcidStreamSource[$root]"
}
