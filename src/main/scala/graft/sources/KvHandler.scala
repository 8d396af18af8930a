package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.OptionalLong
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Key-value storage handler — the engine's extension contract for the
  * reference's pluggable storage-handler class (HBaseStorageHandler /
  * Kudu / Accumulo, ref hbase-handler/src/java/org/apache/hadoop/hive/
  * hbase/HBaseStorageHandler.java), expressed the Spark-native way: a
  * DataSource V2 `TableProvider`. Where Hive's contract is
  * InputFormat/OutputFormat/SerDe + predicate-pushdown decomposition,
  * the DSv2 contract is Scan/Write builders + `SupportsPushDownFilters`
  * — this file is the worked example a real connector would follow.
  *
  * The backing store is log-structured over plain files (the same model an
  * external KV system exposes): hash-bucketed sorted base files plus
  * commit-ordered delta files of puts, last-put-wins on read, folded by
  * `KvStore.compact`. Semantics mirror an HBase-style table:
  *
  *   - schema is fixed `(key STRING, value STRING)`; append = put (upsert
  *     by key), exactly the handler write path
  *   - point/IN key predicates push down and prune to the owning buckets
  *     (the scan prints `buckets=k/n` — plan-visible pruning, like the
  *     reference's key-range decomposition)
  *   - each read task merges one bucket's base + deltas — parallelism is
  *     the bucket count, shuffles never happen on the source side
  *   - task writers land `_tmp` files; job commit renames them visible —
  *     the standard two-phase DSv2 commit, no torn reads
  *
  * At 100 TB this maps 1:1 onto a real remote KV system: buckets become
  * region/tablet assignments, deltas become the memstore flush log, and
  * compact is the minor compaction — the contract shape is what matters.
  */
class KvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KvSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-kv requires a 'path' option"))
    val buckets = Option(properties.get("buckets")).map(_.toInt).getOrElse(8)
    new KvTable(path, buckets)
  }
}

object KvSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))
}

final class KvTable(path: String, buckets: Int) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-kv:$path"
  override def schema(): StructType = KvSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path, buckets)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(path, buckets, info)
}

// ------------------------------------------------------------------- read
final class KvScanBuilder(path: String, buckets: Int)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushedKeys: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("key", _: String) => true
      case In("key", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    val keys = accepted.flatMap {
      case EqualTo("key", v: String) => Seq(v)
      case In("key", vs) => vs.toSeq.map(_.asInstanceOf[String])
      case _ => Seq.empty[String]
    }.toSet
    if (accepted.nonEmpty) pushedKeys = Some(keys)
    pushed = accepted
    // Spark still evaluates the residual — returning `rest` only would also
    // be correct, but re-checking pushed filters costs nothing and keeps the
    // source honest if a bucket file was edited out-of-band
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new KvScan(path, buckets, pushedKeys)
}

final class KvScan(path: String, buckets: Int, pushedKeys: Option[Set[String]])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = KvSource.Schema
  override def toBatch: Batch = this

  private val selected: Seq[Int] = pushedKeys match {
    case Some(keys) => keys.map(k => KvStore.bucketOf(k, buckets)).toSeq.sorted
    case None => 0 until buckets
  }

  override def description(): String =
    s"graft-kv $path buckets=${selected.length}/$buckets" +
      pushedKeys.map(k => s" keys=${k.size}").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] =
    selected.map(b => KvInputPartition(path, b, buckets,
      pushedKeys.map(_.toArray.sorted)): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory

  override def estimateStatistics(): Statistics = new Statistics {
    // bytes from the file layout only — no data read at plan time. Delta
    // bytes count in full even for pruned scans: a delta-only table must
    // never report 0 bytes (that invites a wrong broadcast decision).
    override def sizeInBytes(): OptionalLong = OptionalLong.of(
      selected.map(b => KvStore.bucketBytes(path, b)).sum +
        KvStore.deltaBytes(path))
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

final case class KvInputPartition(path: String, bucket: Int, buckets: Int,
    keys: Option[Array[String]]) extends InputPartition

final class KvReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KvInputPartition]
    val state = KvStore.readBucket(kp.path, kp.bucket, kp.buckets)
    val wanted = kp.keys.map(_.toSet)
    val it = state.iterator.filter(kv => wanted.forall(_.contains(kv._1)))
    new PartitionReader[InternalRow] {
      private var cur: (String, String) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(cur._1),
        if (cur._2 == null) null else UTF8String.fromString(cur._2))
      override def close(): Unit = ()
    }
  }
}

// ------------------------------------------------------------------ write
final class KvWriteBuilder(path: String, buckets: Int, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new KvBatchWrite(path, buckets, doTruncate)
  }
}

final class KvBatchWrite(path: String, buckets: Int, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path, buckets)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate) KvStore.truncate(path)
    // two-phase: every task staged a _tmp file; commit renames them into the
    // deltas dir in task order — a failed job leaves only _tmp litter,
    // readers never see a partial batch's files as mixed visible/invisible
    var seq = KvStore.nextCommitSeq(path)
    messages.toSeq.collect { case m: KvCommitMessage if m.tmpPath != null =>
      m.tmpPath
    }.sorted.zipWithIndex.foreach { case (tmp, i) =>
      // carry the last successfully-used seq forward so one batch's files
      // stay commit-ordered even when racing another committer
      seq = KvStore.publishDelta(path, Paths.get(tmp), seq, i)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: KvCommitMessage if m.tmpPath != null =>
      Files.deleteIfExists(Paths.get(m.tmpPath))
    }
}

final case class KvCommitMessage(tmpPath: String) extends WriterCommitMessage

final class KvWriterFactory(path: String, buckets: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val puts = mutable.LinkedHashMap.empty[String, String]
      override def write(row: InternalRow): Unit = {
        val k = row.getUTF8String(0).toString
        val v = if (row.isNullAt(1)) null else row.getUTF8String(1).toString
        puts.put(k, v) // last write in a task wins, KV put semantics
      }
      override def commit(): WriterCommitMessage = {
        if (puts.isEmpty) return KvCommitMessage(null)
        val tmp = KvStore.stageDelta(path, puts.toSeq, partitionId, taskId)
        KvCommitMessage(tmp.toString)
      }
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

// ------------------------------------------------------------------ store
/** The file layout + merge logic shared by reader tasks, the commit
  * coordinator, and the maintenance entry points.
  */
object KvStore {

  def bucketOf(key: String, buckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c), buckets)

  // Bases are GENERATIONAL: `base-<bucket>-g<gen>.tsv`, published
  // create-exclusive like deltas. A compactor's base write is thereby a
  // CAS against the generation it read — the classic lost update (compactor
  // A reads gen N, compactor B folds delta D into gen N+1 and deletes D,
  // A overwrites with its stale N-based view, D's puts gone) cannot
  // happen: A's publish of N+1 LOSES and A retries against fresh state.
  private val BaseRx = """base-(\d{5})-g(\d+)\.tsv""".r
  private val LegacyBaseRx = """base-(\d{5})\.tsv""".r
  private def basePath(root: String, bucket: Int, gen: Long): Path =
    if (gen < 0) Paths.get(root, f"base-$bucket%05d.tsv") // pre-generation name
    else Paths.get(root, f"base-$bucket%05d-g$gen%08d.tsv")

  /** Files.list streams hold an OS directory fd until closed — this runs
    * per bucket per read, so close deterministically.
    */
  private def listNames(dir: Path): Seq[String] = {
    if (!Files.exists(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  /** Base generations for a bucket, oldest first; a pre-generation
    * `base-<bucket>.tsv` (written by an earlier release) reads as
    * generation -1 so upgraded stores keep their folded history — the
    * first post-upgrade compact publishes g0 and retires it.
    */
  private def baseGens(root: String, bucket: Int): Seq[Long] =
    listNames(Paths.get(root)).collect {
      case BaseRx(b, g) if b.toInt == bucket => g.toLong
      case LegacyBaseRx(b) if b.toInt == bucket => -1L
    }.sorted
  private def deltasDir(root: String): Path = Paths.get(root, "deltas")

  // injective escape: backslash first, then separators and NUL — so the
  // single-char NUL null marker can never collide with real data (a value
  // CONTAINING \u0000 escapes to "\\0", never a bare marker)
  private def enc(s: String): String =
    if (s == null) "\u0000"
    else s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
      .replace("\u0000", "\\0")
  private def dec(s: String): String =
    if (s == "\u0000") null
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => sb.append('\\'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case '0' => sb.append('\u0000'); i += 2
            case other => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  private def readKvFile(p: Path): Seq[(String, String)] =
    readKvFileOpt(p).getOrElse(Nil)

  /** None when the file does not exist — a MEANINGFUL signal: a delta (or
    * a listed base generation) deleted by a racing compact between the
    * listing and the open means this reader's view is torn — its puts were
    * folded into a NEWER base this reader did not pick up. Readers must
    * detect the vanish and retry the whole bucket read against fresh state
    * (see [[TornRead]]); only a bucket with NO base generations at all
    * legitimately reads as empty.
    */
  private def readKvFileOpt(p: Path): Option[Seq[(String, String)]] =
    try Some(Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map { line =>
        val t = line.indexOf('\t')
        (dec(line.substring(0, t)), dec(line.substring(t + 1)))
      })
    catch {
      case _: java.nio.file.NoSuchFileException => None
      case _: java.io.FileNotFoundException => None
    }

  /** A snapshotted delta or listed base generation vanished mid-read
    * (racing compact folded/retired it): the reader's view is torn — retry.
    */
  private final case class TornRead(p: Path)
    extends Exception(s"file vanished mid-read: $p", null, false, false)

  /** A compactor's base publish lost the generation CAS to a concurrent
    * compactor — restart the fold against fresh state.
    */
  private final case class LostBaseRace(p: Path)
    extends Exception(s"base generation already published: $p",
      null, false, false)

  /** Create-exclusive publish of one base generation (same discipline as
    * [[publishDelta]]); false = a concurrent compactor won this gen.
    */
  private def publishBase(root: String, bucket: Int, gen: Long,
      kvs: Seq[(String, String)]): Boolean = {
    val dst = basePath(root, bucket, gen)
    Files.createDirectories(dst.getParent)
    val tmp = dst.resolveSibling(
      dst.getFileName.toString + s"._tmp-${System.nanoTime()}")
    Files.write(tmp, kvs.map { case (k, v) => enc(k) + "\t" + enc(v) }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val won =
      try { Files.createLink(dst, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // FS without hard links: no single primitive gives BOTH
          // create-exclusive (the CAS) and atomic content visibility
          // (rename(2) silently replaces; O_EXCL writes are torn-visible).
          // Split them: the CAS is decided on a tiny exclusive CLAIM file,
          // then the winner publishes content with an atomic rename — a
          // reader can never adopt a half-written base, and two movers can
          // never both win a generation.
          val claim = dst.resolveSibling(dst.getFileName.toString + ".claim")
          // a compactor that crashed between claiming and moving would
          // wedge this generation forever — a claim older than the
          // takeover window with NO published content is orphaned and
          // up for grabs (a healthy winner moves content within ms)
          try {
            if (!Files.exists(dst) && Files.exists(claim) &&
                System.currentTimeMillis() -
                  Files.getLastModifiedTime(claim).toMillis > 60000L)
              Files.deleteIfExists(claim)
          } catch { case _: Exception => () }
          val token = java.util.UUID.randomUUID().toString
            .getBytes(StandardCharsets.UTF_8)
          val claimed =
            try { Files.createFile(claim); true }
            catch { case _: java.nio.file.FileAlreadyExistsException => false }
          // the takeover delete above is check-then-act: a slow contender
          // could delete OUR fresh claim after its stale check. Writing a
          // unique token and re-reading it makes ownership verifiable —
          // whoever does NOT see their own token abandons, so two movers
          // can never both publish this generation
          val owned = claimed && {
            try {
              Files.write(claim, token,
                java.nio.file.StandardOpenOption.WRITE,
                java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
              java.util.Arrays.equals(Files.readAllBytes(claim), token)
            } catch { case _: Exception => false }
          }
          // a mover stalled longer than the takeover window between the
          // verify above and the move below could have its claim taken
          // over (the orphan sweep sees no dst yet) — and rename(2) would
          // silently replace the usurper's published base, losing its
          // folded deltas. Re-verify ownership at the last instant and
          // never move onto an existing dst: the loser abandons instead
          // of replacing.
          val ownedNow = owned && !Files.exists(dst) && {
            try java.util.Arrays.equals(Files.readAllBytes(claim), token)
            catch { case _: Exception => false }
          }
          if (ownedNow) {
            try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
            catch {
              case _: java.nio.file.AtomicMoveNotSupportedException =>
                // last-resort provider: plain move (same-directory rename
                // in practice); the verified claim still picks one winner
                Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING)
            }
          }
          ownedNow
      }
    Files.deleteIfExists(tmp)
    won
  }

  private def claimOf(base: Path): Path =
    base.resolveSibling(base.getFileName.toString + ".claim")

  /** Delta files in commit order (seq, then intra-commit index). */
  private def deltaFiles(root: String): Seq[Path] = {
    val d = deltasDir(root)
    listNames(d)
      .filter(_.matches("delta-\\d+-\\d+\\.tsv"))
      .map(d.resolve)
      .sortBy { p =>
        val parts = p.getFileName.toString.stripPrefix("delta-")
          .stripSuffix(".tsv").split("-")
        (parts(0).toLong, parts(1).toLong)
      }
  }

  /** Bucket state: base merged with deltas, last put wins, sorted by key.
    * A delta or listed base deleted by a racing compact between the
    * listing and the open tears the view — detected via [[TornRead]] and
    * retried against a fresh listing, where the newer base generation
    * carries the vanished delta's puts. IMPORTANT: the delta list is
    * snapshotted BEFORE the base generation is chosen — with that order a
    * concurrent fold either leaves the old delta readable (consistent old
    * view), or deletes it (torn → retry), or the newer base double-applies
    * a still-listed delta (idempotent under last-put-wins). Listing bases
    * first would open a window where a fresh fold's base is missed AND its
    * folded delta is already gone.
    */
  def readBucket(root: String, bucket: Int, buckets: Int): Seq[(String, String)] = {
    var tries = 0
    while (true) {
      try return readBucketFrom(root, bucket, buckets, deltaFiles(root))
      catch {
        case TornRead(_) if tries < 50 => tries += 1
      }
    }
    Nil // unreachable
  }

  private def readBucketFrom(root: String, bucket: Int, buckets: Int,
      deltas: Seq[Path]): Seq[(String, String)] = {
    val m = mutable.LinkedHashMap.empty[String, String]
    // latest base generation FIRST, deltas in commit order on top (last
    // put wins); a bucket with no base generations is empty, a LISTED
    // base/delta that vanished is a torn view
    baseGens(root, bucket).lastOption.foreach { g =>
      readKvFileOpt(basePath(root, bucket, g))
        .getOrElse(throw TornRead(basePath(root, bucket, g)))
        .foreach { case (k, v) => m.put(k, v) }
    }
    deltas.foreach { p =>
      readKvFileOpt(p).getOrElse(throw TornRead(p)).foreach { case (k, v) =>
        if (bucketOf(k, buckets) == bucket) m.put(k, v)
      }
    }
    m.toSeq.sortBy(_._1)
  }

  def bucketBytes(root: String, bucket: Int): Long =
    baseGens(root, bucket).lastOption.map { g =>
      try Files.size(basePath(root, bucket, g)) catch { case _: Exception => 0L }
    }.getOrElse(0L)

  def deltaBytes(root: String): Long =
    deltaFiles(root).map(p => try Files.size(p) catch { case _: Exception => 0L }).sum

  def stageDelta(root: String, kvs: Seq[(String, String)],
      partitionId: Int, taskId: Long): Path = {
    val d = deltasDir(root)
    Files.createDirectories(d)
    val tmp = d.resolve(s"_tmp-$partitionId-$taskId-${System.nanoTime()}")
    Files.write(tmp, kvs.map { case (k, v) => enc(k) + "\t" + enc(v) }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    tmp
  }

  def nextCommitSeq(root: String): Long =
    deltaFiles(root).lastOption.map { p =>
      p.getFileName.toString.stripPrefix("delta-").stripSuffix(".tsv")
        .split("-")(0).toLong + 1
    }.getOrElse(0L)

  /** Publish one staged delta. Concurrent committers race on the sequence
    * number; the winner is decided by an atomic create-exclusive hard link
    * (same pattern as the snapshot-table manifest log), and the loser
    * retries under the next free sequence. A plain ATOMIC_MOVE is NOT a
    * CAS here: POSIX rename(2) silently replaces an existing target, so a
    * racing committer would overwrite — not detect — the winner's file.
    * Returns the seq used.
    */
  def publishDelta(root: String, tmp: Path, seq: Long, idx: Int): Long = {
    var s = seq
    while (true) {
      val target = deltasDir(root).resolve(s"delta-$s-$idx.tsv")
      val won =
        try { Files.createLink(target, tmp); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException =>
            // FS without hard links: create-exclusive copy is still atomic
            // on visibility of the NAME (CREATE_NEW fails if present);
            // readers tolerate a mid-copy file only because deltas are
            // line-framed and a torn tail parses as fewer puts — acceptable
            // for the degraded-FS path, exact for the primary one
            try {
              Files.copy(tmp, target)
              true
            } catch { case _: java.nio.file.FileAlreadyExistsException => false }
        }
      if (won) { Files.deleteIfExists(tmp); return s }
      s = math.max(s + 1, nextCommitSeq(root))
    }
    s
  }

  def truncate(root: String): Unit = {
    val r = Paths.get(root)
    if (!Files.exists(r)) return
    val walk = Files.walk(r)
    val targets =
      try walk.iterator().asScala.toList.reverse
      finally walk.close()
    targets
      .filter(p => p != r && (p.getFileName.toString.startsWith("base-") ||
        p.getFileName.toString.startsWith("delta") ||
        p.getFileName.toString == "deltas"))
      .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
  }

  /** Fold deltas into the per-bucket base files (the minor compaction of
    * the handler's storage model) — per-bucket work, parallelizable, and
    * atomic per file. The delta list is SNAPSHOTTED first and only those
    * files fold and delete: a delta published while compaction runs stays
    * in the log (re-listing at delete time would drop puts the fold never
    * saw). Readers racing the delete see either (old base + delta) or
    * (folded base [+ already-applied delta]) — identical by last-put-wins
    * idempotence.
    */
  def compact(root: String, buckets: Int): Unit = {
    var tries = 0
    var done = false
    while (!done) {
      val snapshot = deltaFiles(root)
      if (snapshot.isEmpty) return // nothing to fold — and crucially, no
                                   // stale base rewrite from an empty view
      try {
        // every base publish is a generation CAS: losing means a
        // concurrent compactor already folded a fresher view — restart
        val published = (0 until buckets).flatMap { b =>
          val prevGens = baseGens(root, b)
          val merged = readBucketFrom(root, b, buckets, snapshot)
          if (merged.isEmpty) Nil
          else {
            val next = prevGens.lastOption.getOrElse(-1L) + 1
            if (!publishBase(root, b, next, merged))
              throw LostBaseRace(basePath(root, b, next))
            Seq((b, prevGens))
          }
        }
        // only after EVERY bucket's fold is durable do the folded deltas
        // retire; readers racing these deletes hit the torn-read retry
        snapshot.foreach(Files.deleteIfExists)
        published.foreach { case (b, prevGens) =>
          prevGens.foreach { g =>
            Files.deleteIfExists(basePath(root, b, g))
            Files.deleteIfExists(claimOf(basePath(root, b, g)))
          }
        }
        done = true
      } catch {
        // a CONCURRENT compactor folded+deleted part of this snapshot, or
        // won a base generation: our view is stale — restart fresh (brief
        // backoff: on the claim-file path the winner may still be
        // publishing its generation's content)
        case TornRead(_) if tries < 50 => tries += 1; Thread.sleep(5L * tries)
        case LostBaseRace(_) if tries < 50 =>
          tries += 1; Thread.sleep(5L * tries)
      }
    }
  }
}
