package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.plans.Snapshots.BloomConfig

/** Per-file bloom-filter index for [[Snapshots.SnapshotTable]] point-lookup
  * file skipping. Split out of Snapshots.scala purely for file size; every
  * member runs as part of the table class (self-typed mixin).
  */
private[plans] trait SnapshotBloomIndexOps { self: Snapshots.SnapshotTable =>

  // ---------------------------------------------------------- bloom index

  /** Configures per-file BLOOM FILTERS for point-lookup file skipping
    * (the Delta/Iceberg bloom-index design; the reference's ORC row-group
    * bloom filters, ref ql/.../orc OrcFile.bloomFilterColumns, play the
    * same role inside files). Min/max stats cannot skip a point predicate
    * on a HIGH-CARDINALITY UNSORTED key — every file's range spans the
    * probe — but a per-file bloom answers "definitely not here" in O(1):
    * at 100 TB that turns `WHERE user_id = X` from a full scan into a
    * handful of files.
    *
    * Every commit AFTER this call writes a `_blooms` parquet sidecar
    * inside its own `data/<uuid>/` dir (underscore-prefixed: invisible
    * to data reads, vacuumed with its dir) holding one serialized filter
    * per (file, column). Pruning loads sidecars lazily — only when an
    * equality/IN conjunct names an indexed column — and only skips;
    * unindexed files (pre-config commits) always survive, so correctness
    * never depends on the index. Run [[compact]] or [[zOrderBy]] after
    * configuring to index existing data. Columns are recorded by
    * PHYSICAL name, so RENAME COLUMN keeps the index live.
    */
  def setBloomColumns(cols: Seq[String], numBits: Long = 1L << 20): Unit = {
    val head = latest()
    val schema = schemaOf(head.schemaJson)
    val missing = cols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"unknown bloom columns: ${missing.mkString(", ")}")
    val part = cols.filter(head.partitionCols.contains)
    require(part.isEmpty,
      s"partition columns prune by path, not blooms: ${part.mkString(", ")}")
    require(numBits >= 64, "numBits too small to be a filter")
    // generation bump invalidates every earlier sidecar (their filters
    // may cover different columns, sizes, or — after a type widening —
    // differently-hashed values); sidecars are generation-named, so old
    // ones simply stop being read
    val gen = bloomConfig().map(_.gen + 1).getOrElse(0L)
    writeBloomConfig(BloomConfig(cols.map(head.physical), numBits, gen))
  }

  private[plans] def writeBloomConfig(cfg: BloomConfig): Unit =
    SidecarJson.write(fs, new Path(rootPath, "_bloom_config.json"), cfg)

  private[plans] def bloomConfig(): Option[BloomConfig] =
    SidecarJson.read[BloomConfig](fs, new Path(rootPath, "_bloom_config.json"))

  /** One bloom aggregation job over the just-staged dir, written as the
    * dir's `_blooms` sidecar. Same page-cache-warm read as the stats job.
    */
  private[plans] def writeBloomSidecar(dir: Path,
      dataSchema: org.apache.spark.sql.types.StructType): Unit = {
    val cfg = bloomConfig().getOrElse(return)
    val cols = cfg.cols.filter(dataSchema.fieldNames.contains)
    if (cols.isEmpty) return
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val staged = spark.read.schema(dataSchema).parquet(dir.toString)
    val items = math.max(cfg.bits / 16, 64L)
    val aggs = cols.map { cn =>
      org.apache.spark.sql.GraftShims.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            new XxHash64(Seq(
              org.apache.spark.sql.GraftShims.expression(col(cn)))),
            Literal(items), Literal(cfg.bits))
          .toAggregateExpression()).as(s"__bloom_$cn")
    }
    val rootQ = fs.makeQualified(rootPath).toUri.getPath + "/"
    val rows = staged.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    if (rows.isEmpty) return
    val out = rows.toSeq.flatMap { r =>
      val rel = new Path(r.getString(0)).toUri.getPath.stripPrefix(rootQ)
      cols.map(cn => (rel, cn, r.getAs[Array[Byte]](s"__bloom_$cn")))
    }.filter(_._3 != null)
    import spark.implicits._
    out.toDF("file", "col", "bloom").coalesce(1)
      .write.mode("overwrite")
      .parquet(new Path(dir, s"_blooms_g${cfg.gen}").toString)
  }

  // sidecars are immutable once their commit publishes — cache per
  // commit dir, deserialized, shared by every plan through this handle
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[(String, String), org.apache.spark.util.sketch.BloomFilter]]()

  private[plans] def bloomsOf(commitDir: String, gen: Long)
      : Map[(String, String), org.apache.spark.util.sketch.BloomFilter] =
    bloomCache.computeIfAbsent(s"$commitDir#g$gen", { _ =>
      val p = new Path(rootPath, s"$commitDir/_blooms_g$gen")
      if (!fs.exists(p)) Map.empty
      else spark.read.parquet(p.toString).collect().map { r =>
        (r.getString(0), r.getString(1)) ->
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      }.toMap
    })

  /** Drops `files` whose bloom PROVES an equality/IN conjunct cannot
    * match (attribute names arrive PHYSICAL, matching sidecar keys).
    * Absent sidecar/filter → keep; blooms only skip, never decide.
    */
  private[plans] def bloomPrune(files: Seq[String],
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[String] = {
    if (files.isEmpty || conds.isEmpty) return files
    val cfg = bloomConfig().getOrElse(return files)
    if (cfg.cols.isEmpty) return files
    val bcols = cfg.cols.toSet
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal, XxHash64}
    def hashOf(l: Literal): Long =
      new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    val probes: Seq[(String, Seq[Long])] = conds.flatMap(split).flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if bcols(a.name) && l.value != null && l.dataType == a.dataType =>
        Some(a.name -> Seq(hashOf(l)))
      case EqualTo(l: Literal, a: AttributeReference)
          if bcols(a.name) && l.value != null && l.dataType == a.dataType =>
        Some(a.name -> Seq(hashOf(l)))
      case In(a: AttributeReference, ls)
          if bcols(a.name) && ls.nonEmpty && ls.forall {
            case l: Literal => l.value != null && l.dataType == a.dataType
            case _ => false
          } =>
        Some(a.name -> ls.map { case l: Literal => hashOf(l) })
      case _ => None
    }
    if (probes.isEmpty) return files
    files.filter { f =>
      val segs = f.split('/')
      if (segs.length < 2) true
      else {
        val blooms = bloomsOf(segs.take(2).mkString("/"), cfg.gen)
        probes.forall { case (c, hashes) =>
          blooms.get((f, c)) match {
            case None => true // unindexed: cannot skip
            case Some(bf) => hashes.exists(bf.mightContainLong)
          }
        }
      }
    }
  }
}
