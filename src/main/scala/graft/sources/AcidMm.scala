package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reader + compactor for the reference's INSERT-ONLY ("micro-managed",
  * MM) transactional table layout — the second transactional flavor
  * (`transactional_properties='insert_only'`, ref ql/io/AcidUtils.java:704
  * `INSERT_ONLY_STRING`) and the default conversion target for non-ORC
  * managed tables during warehouse upgrades. MM trees use the SAME
  * `base_N` / `delta_m_n` write-id directory contract as full ACID, but:
  *
  *   - data files are PLAIN files of any format (text / parquet / ORC /
  *     …), carrying no ROW__ID wrapper struct and keeping their original
  *     task-writer names (`000000_0`, `part-*`, …);
  *   - there are no `delete_delta` dirs and no row-level delete events —
  *     the only operations are INSERT (a new delta), INSERT OVERWRITE (a
  *     new base) and compaction;
  *   - pre-conversion files sit directly in the partition directory and
  *     read as write id 0 until the first base folds them in.
  *
  * Snapshot reconstruction is therefore pure directory selection: highest
  * base wins, widest-range-wins de-overlap above it (shared with
  * [[AcidOrc]]), then ONE ordinary `spark.read` over the selected files —
  * so MM reads keep the full pruned/vectorized columnar path (the acid
  * wrapper struct that forces [[AcidOrc]]'s orc-core bridge does not
  * exist here).
  *
  * Aborted transactions: the reference hides aborted write ids via the
  * metastore's ValidWriteIdList and its MM compactors delete the dirs
  * outright (ref ql/txn/compactor/MmMajorQueryCompactor.java:38
  * `removeFilesForMmTable`). There is no metastore here, so aborted ids
  * are an explicit parameter: reads exclude single-txn `delta_w_w` dirs
  * whose id is in the set (multi-id spans are compactor-produced and
  * aborted-free by construction), and [[removeAborted]] is the cleaner.
  *
  * Text-format files are read as the reference's LazySimpleSerDe default:
  * Ctrl-A (`\u0001`) separated, no header; pass `schema` for typed
  * columns, else everything surfaces as strings (cast downstream, same
  * convention as partition values).
  */
object AcidMm {

  import AcidOrc.{DeltaRe, Range, hidden}

  /** All non-hidden data files under a base_/delta_ dir (MM files keep
    * their task-writer names — no `bucket_*` contract).
    */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !hidden(s.getPath.getName))
      .map(_.getPath)

  /** Layout probe: `full_acid` when any delete_delta dir exists or the
    * row dirs hold `bucket_*` files (the full-ACID writer contract);
    * `insert_only` when row dirs hold plainly-named files; `originals`
    * when only pre-transactional files exist (readable by both paths);
    * `empty` otherwise. One listing pass — the same metadata cost the
    * read pays.
    */
  def detectKind(spark: SparkSession, table: String): String = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return "empty"
    val states = AcidOrc.walk(fs, root, "")
    if (states.isEmpty) return "empty"
    if (states.exists(_.deleteDirs.nonEmpty)) return "full_acid"
    // the FIRST non-empty row dir decides (layouts are uniform by
    // contract): one extra file listing, not one per dir — the probe
    // runs before every hive_acid()/COMPACT and metadata calls are the
    // cost that matters on object stores
    states.iterator.flatMap(_.rowDirs).foreach { d =>
      val files = dataFiles(fs, d)
      if (files.nonEmpty)
        return if (files.forall(f =>
          AcidOrc.BucketFileRe.pattern.matcher(f.getName).matches()))
          "full_acid"
        else "insert_only"
    }
    if (states.exists(_.originals.nonEmpty)) "originals" else "empty"
  }

  /** Format sniff by magic bytes: ORC files start `ORC`, parquet `PAR1`;
    * anything else reads as Ctrl-A-delimited text (the LazySimpleSerDe
    * default). One 4-byte read of one file.
    */
  private def sniffFormat(fs: FileSystem, file: Path): String = {
    val in = fs.open(file)
    try {
      val buf = new Array[Byte](4)
      val n = in.read(buf, 0, 4)
      val head = new String(buf, 0, math.max(n, 0), "ISO-8859-1")
      if (head.startsWith("ORC")) "orc"
      else if (head == "PAR1") "parquet"
      else "text"
    } finally in.close()
  }

  /** Selected (file, partition-subpath) pairs of the current snapshot:
    * highest base wins, widest-wins deltas above it, aborted single-txn
    * deltas excluded, pre-conversion originals included only when no base
    * covers them (the walk already enforces that).
    */
  private def selectedFiles(spark: SparkSession, table: String,
      maxWriteId: Long, aborted: Set[Long]): Seq[(Path, String)] = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"MM table directory not found: $table")
    val states = AcidOrc.walk(fs, root, "", maxWriteId)
    require(states.nonEmpty, s"no base_/delta_ directories under $table")
    require(states.forall(_.deleteDirs.isEmpty),
      s"$table has delete_delta dirs — a full-ACID tree, not insert-only; " +
        "read it with hive_acid()/AcidOrc")
    states.flatMap { s =>
      val live = s.rowDirs.filterNot { d =>
        d.getName match {
          case DeltaRe(m, n) => m == n && aborted.contains(m.toLong)
          case _ => false
        }
      }
      live.flatMap(dataFiles(fs, _)).map(_ -> s.partSub) ++
        s.originals.map(_ -> s.partSub)
    }
  }


  /** One `spark.read` over an explicit MM file list. Text follows the
    * LazySimpleSerDe defaults (Ctrl-A separator, `\\N` nulls). Partition
    * columns attach from each file's DRIVER-KNOWN subpath via a broadcast
    * join on Spark's own url-encoded file identity — parsing
    * `input_file_name()` directly would surface percent-encoded values
    * (`New%20York`), diverging from [[AcidOrc.read]]'s raw-subpath
    * convention.
    */
  private def readFiles(spark: SparkSession, fs: FileSystem,
      files: Seq[(Path, String)], schema: Option[StructType],
      format: Option[String], table: String): DataFrame = {
    val fmt = format.getOrElse(sniffFormat(fs, files.head._1))
    val paths = files.map(_._1.toString)
    val base = fmt match {
      // mergeSchema: add-columns evolution across deltas reads like the
      // full-ACID bridge's widest-schema contract — older files' missing
      // fields are NULL (first-file schema would silently DROP new cols)
      case "orc" => spark.read.option("mergeSchema", "true").orc(paths: _*)
      case "parquet" =>
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
      case "text" =>
        val r = spark.read.option("sep", "\u0001").option("header", "false")
          .option("nullValue", "\\N")
        schema match {
          case Some(s) if s.exists(_.dataType
              .isInstanceOf[org.apache.spark.sql.types.DecimalType]) =>
            // decimal columns parse LazySimpleSerDe-leniently (a trailing
            // '.' is a valid Hive decimal where BigDecimal throws): read
            // as strings, cast per column via hiveTextCast
            val asStrings = StructType(s.map(_.copy(dataType =
              org.apache.spark.sql.types.StringType)))
            r.schema(asStrings).csv(paths: _*).select(s.map(f =>
              TextFormats.hiveTextCast(col(f.name), f.dataType)
                .as(f.name)): _*)
          case Some(s) => r.schema(s).csv(paths: _*)
          case None => r.csv(paths: _*)
        }
      case other => schema.fold(spark.read)(spark.read.schema(_))
        .format(other).load(paths: _*)
    }
    val partCols = files.map(_._2).filter(_.nonEmpty)
      .map(_.split("/").toSeq.map(_.split("=", 2)(0)))
      .distinct
    require(partCols.size <= 1,
      s"inconsistent partition layouts under $table: " +
        partCols.map(_.mkString("/")).mkString(", "))
    val keys = partCols.headOption.getOrElse(Nil)
    if (keys.isEmpty) base
    else {
      import spark.implicits._
      val mapDf = files.map { case (f, sub) =>
        (org.apache.spark.paths.SparkPath.fromPath(f).urlEncoded, sub)
      }.toDF("_graft_uri", "_graft_sub")
      // input_file_name() is non-deterministic: project it to a column
      // first (legal), never into the join condition (refused)
      val keyed = base.withColumn("_graft_file", input_file_name())
      val joined = keyed.join(broadcast(mapDf),
        col("_graft_file") === col("_graft_uri"), "left")
      keys.foldLeft(joined) { (df, k) =>
        df.withColumn(k, regexp_extract(col("_graft_sub"),
          "(?:^|/)" + java.util.regex.Pattern.quote(k) + "=([^/]+)", 1))
      }.drop("_graft_file", "_graft_uri", "_graft_sub")
    }
  }

  /** Current-snapshot read of an insert-only transactional directory.
    * `format` overrides the magic-byte sniff; `schema` applies to
    * text/CSV reads (else all-string `_c*` columns). Partition columns
    * parse from `k=v` path segments as strings (one scan for the whole
    * table — never a per-partition read).
    */
  def read(spark: SparkSession, table: String,
      maxWriteId: Long = Long.MaxValue,
      abortedWriteIds: Set[Long] = Set.empty,
      schema: Option[StructType] = None,
      format: Option[String] = None): DataFrame = {
    val files = selectedFiles(spark, table, maxWriteId, abortedWriteIds)
    require(files.nonEmpty, s"MM table $table has no live data files")
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readFiles(spark, fs, files, schema, format, table)
  }

  /** Rows ADDED by delta commits with write ids in (fromWriteId,
    * toWriteId] — the incremental-consumption read behind the
    * `acid-stream` source on insert-only trees. Compaction spans
    * straddling fromWriteId emit nothing (data-identical), exactly as
    * [[AcidOrc.readChanges]]. MM tables have no delete events, so the
    * read needs no retraction contract; `withCommitId` adds
    * `_commit_writeid` (the committing dir's max write id — MM files
    * carry no per-row transaction column) for the CDC shape.
    */
  def readChanges(spark: SparkSession, table: String, fromWriteId: Long,
      toWriteId: Long, schema: Option[StructType] = None,
      format: Option[String] = None,
      withCommitId: Boolean = false,
      abortedWriteIds: Set[Long] = Set.empty): DataFrame = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"MM table directory not found: $table")
    val changed = AcidOrc.changedDirs(fs, root, "", fromWriteId, toWriteId)
    require(changed.forall(_._3.isEmpty),
      s"$table has delete_delta dirs — a full-ACID tree, not insert-only")
    // aborted single-txn deltas are excluded here exactly as the
    // snapshot path excludes them (the dirs may not be cleaned yet)
    val files = changed.flatMap { case (sub, dirs, _) =>
      dirs.filterNot { d =>
        d.getName match {
          case DeltaRe(m, n) => m == n && abortedWriteIds.contains(m.toLong)
          case _ => false
        }
      }.flatMap(dataFiles(fs, _)).map(_ -> sub)
    }
    def withCid(df: DataFrame): DataFrame =
      if (!withCommitId) df
      else df.withColumn("_commit_writeid",
        regexp_extract(input_file_name(),
          "/delta_\\d+_(\\d+)(?:_\\d+)?/", 1).cast("long"))
    if (files.isEmpty) {
      // empty range: a schema-correct empty frame off the current layout
      return withCid(read(spark, table, maxWriteId = toWriteId,
        schema = schema, format = format).limit(0))
    }
    withCid(readFiles(spark, fs, files, schema, format, table))
  }

  /** The reference compactors' first step (`removeFilesForMmTable`):
    * physically delete single-txn delta dirs of aborted write ids.
    */
  def removeAborted(spark: SparkSession, table: String,
      abortedWriteIds: Set[Long]): Unit = {
    if (abortedWriteIds.isEmpty) return
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    AcidOrc.walk(fs, root, "").foreach { s =>
      s.rowDirs.foreach { d =>
        d.getName match {
          case DeltaRe(m, n) if m == n && abortedWriteIds.contains(m.toLong) =>
            fs.delete(d, true)
          case _ => ()
        }
      }
    }
  }

  /** Stage a frame through one `spark.write` and move its part files into
    * `dirName` with task-style names (`000000_0` …) — the MM file-naming
    * contract, shared by the delta writer and both compactors.
    */
  private def writeMmDir(spark: SparkSession, table: String, dirName: String,
      df: DataFrame, format: String): Unit = {
    val target = new Path(table, dirName)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(target), s"write id collision: $target exists")
    val staging = new Path(table, s".graft_staging_mm_$dirName")
    val w = df.write.mode("overwrite")
    format match {
      case "orc" => w.orc(staging.toString)
      case "parquet" => w.parquet(staging.toString)
      case "text" => w.option("sep", "\u0001").option("header", "false")
        .option("nullValue", "\\N").csv(staging.toString)
      case other => w.format(other).save(staging.toString)
    }
    val parts = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    require(parts.nonEmpty, s"no part files under $staging")
    fs.mkdirs(target)
    parts.zipWithIndex.foreach { case (p, i) =>
      fs.rename(p, new Path(target, f"$i%06d_0"))
    }
    fs.delete(staging, true)
  }

  /** Append rows as a committed insert delta (`delta_w_w/000000_0…`) —
    * what the reference's MM insert writes.
    */
  def appendDelta(spark: SparkSession, table: String, writeId: Long,
      df: DataFrame, format: String = "parquet"): Unit = {
    require(writeId >= 1L, "write id 0 is reserved for pre-conversion files")
    writeMmDir(spark, table, s"delta_${writeId}_$writeId", df, format)
  }

  /** Major compaction: per partition, fold the live snapshot into
    * `base_<maxWriteId>` in the table's own format, then (by default)
    * drop the covered dirs — query-based compaction exactly as the
    * reference's MmMajorQueryCompactor (INSERT OVERWRITE the snapshot
    * into a base-located table; no ROW__IDs exist to preserve). Offsets
    * never move (no new write id).
    */
  def compactMajor(spark: SparkSession, table: String,
      clean: Boolean = true,
      abortedWriteIds: Set[Long] = Set.empty): Unit = {
    removeAborted(spark, table, abortedWriteIds)
    val w = AcidOrc.maxWriteId(spark, table)
    if (w < 0) return
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bounded-parallel wave over partitions (disjoint directories, one
    // Spark job each) — a wide table must not compact one partition at
    // a time, the shape the reference's per-partition compactor queries
    // also avoid only by queue concurrency
    AcidOrc.parallelMap(AcidOrc.walk(fs, root, "")) { s =>
      val already = s.originals.isEmpty &&
        s.rowDirs.map(_.getName).toList == List(s"base_$w")
      if (!already) {
        val files = s.rowDirs.flatMap(dataFiles(fs, _)) ++ s.originals
        if (files.nonEmpty) {
          val fmt = sniffFormat(fs, files.head)
          val df = fmt match {
            case "orc" => spark.read.option("mergeSchema", "true")
              .orc(files.map(_.toString): _*)
            case "parquet" => spark.read.option("mergeSchema", "true")
              .parquet(files.map(_.toString): _*)
            case _ => spark.read.option("sep", "\u0001")
              .option("header", "false").option("nullValue", "\\N")
              .csv(files.map(_.toString): _*)
          }
          val pdir = AcidOrc.partDir(table, s.partSub)
          writeMmDir(spark, pdir, s"base_$w", df, fmt)
          if (clean) {
            s.rowDirs.foreach(fs.delete(_, true))
            s.originals.foreach(fs.delete(_, false))
          }
        }
      }
    }
  }

  /** Minor compaction: per partition, fold the raw insert deltas above
    * the head base into ONE `delta_min_max` without touching the base —
    * the reference's MmMinorQueryCompactor. Same incremental-consumer
    * straddle hazard as [[AcidOrc.compactMinor]]: pass `consumerFloor` =
    * the lowest live consumer offset and the fold splits there.
    */
  def compactMinor(spark: SparkSession, table: String,
      clean: Boolean = true, consumerFloor: Long = -1L,
      abortedWriteIds: Set[Long] = Set.empty,
      consumerFloors: Seq[Long] = Nil): Unit = {
    removeAborted(spark, table, abortedWriteIds)
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val floors = (consumerFloors ++
      (if (consumerFloor >= 0) Seq(consumerFloor) else Nil))
      .distinct.sorted
    def foldGroup(partSub: String, ranged: Seq[Range]): Unit = {
      if (ranged.size < 2) return
      val files = ranged.flatMap(r => dataFiles(fs, r.dir))
      if (files.isEmpty) return
      val (mn, mx) = (ranged.map(_.min).min, ranged.map(_.max).max)
      val fmt = sniffFormat(fs, files.head)
      val df = fmt match {
        case "orc" => spark.read.option("mergeSchema", "true")
          .orc(files.map(_.toString): _*)
        case "parquet" => spark.read.option("mergeSchema", "true")
          .parquet(files.map(_.toString): _*)
        case _ => spark.read.option("sep", "\u0001")
          .option("header", "false").option("nullValue", "\\N")
          .csv(files.map(_.toString): _*)
      }
      writeMmDir(spark, AcidOrc.partDir(table, partSub),
        s"delta_${mn}_$mx", df, fmt)
      if (clean) ranged.foreach(r => fs.delete(r.dir, true))
    }
    // flatten to (partition, band) fold units, then run them as one
    // bounded-parallel wave — disjoint target dirs, one Spark job each
    val units = AcidOrc.walk(fs, root, "").flatMap { s =>
      val raw = s.rowDirs.flatMap(p => p.getName match {
        case DeltaRe(m, n) => Some(Range(m.toLong, n.toLong, p))
        case _ => None
      })
      AcidOrc.floorBands(raw, floors).map(s.partSub -> _)
    }
    AcidOrc.parallelMap(units) { case (sub, g) => foldGroup(sub, g) }
  }

  /** INSERT OVERWRITE: land `df` as a new `base_<writeId>` — the third MM
    * operation (scaladoc above; the reference's MM insert-overwrite
    * writes a base directory under the same write-id allocation as
    * inserts). The read path supersedes everything at or below the base
    * by directory selection alone, so covered deltas/bases/originals stay
    * on disk for the cleaner (pass `clean = true` to drop them here,
    * matching the compactors' default). `readChanges` ranges covering
    * `writeId` emit nothing for the base — bases are snapshots, not
    * insert events. For a partitioned table pass `partSub` ("k=v" or
    * "k=v/k2=v2") to overwrite ONE partition — the reference's
    * static-partition INSERT OVERWRITE; the whole-table form refuses a
    * partitioned layout rather than silently nuking sibling partitions.
    */
  def overwrite(spark: SparkSession, table: String, writeId: Long,
      df: DataFrame, format: String = "parquet", partSub: String = "",
      clean: Boolean = false): Unit = {
    require(writeId >= 1L, "write id 0 is reserved for pre-conversion files")
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      require(writeId > AcidOrc.maxWriteId(spark, table),
        s"overwrite write id $writeId must exceed the table's current " +
          s"maximum ${AcidOrc.maxWriteId(spark, table)}")
      val states = AcidOrc.walk(fs, root, "")
      require(states.forall(_.deleteDirs.isEmpty),
        s"$table has delete_delta dirs — a full-ACID tree, not insert-only")
      if (partSub.isEmpty)
        require(states.forall(_.partSub.isEmpty),
          s"$table is partitioned; pass partSub to overwrite one partition")
      else
        // the converse guard: a partition-scoped overwrite against an
        // UNpartitioned tree would write table/k=v/base_n next to
        // top-level base/delta dirs — a mixed layout walk/read treats
        // inconsistently
        require(states.forall(_.partSub.nonEmpty),
          s"$table is unpartitioned; partition-scoped overwrite " +
            s"'$partSub' would create a mixed layout")
    }
    val dir = AcidOrc.partDir(table, partSub)
    writeMmDir(spark, dir, s"base_$writeId", df, format)
    if (clean) {
      val pd = new Path(dir)
      fs.listStatus(pd).filter(_.isDirectory).map(_.getPath).foreach { d =>
        d.getName match {
          case AcidOrc.BaseRe(n) if n.toLong < writeId => fs.delete(d, true)
          case DeltaRe(_, n) if n.toLong < writeId => fs.delete(d, true)
          case _ => ()
        }
      }
      fs.listStatus(pd).filter(s => s.isFile && !hidden(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false)) // pre-conversion originals
    }
  }
}
