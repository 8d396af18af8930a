package graft.plans

import org.apache.spark.sql.types.DataType

import graft.plans.Snapshots.{FileStat, Manifest}

/** Manifest-backed [[org.apache.spark.sql.execution.datasources.FileIndex]]:
  * the scan's file listing comes from the manifest (no directory walk),
  * and the partition/data filters Catalyst pushes into `listFiles` prune
  * it driver-side with [[Pruning]] over the per-file min/max/null stats —
  * so ANY read of the table (plain SQL, TVFs, `read()`) plans only the
  * files whose range can match, at metadata cost. This is the log-backed
  * index design published by Delta Lake / Iceberg; the reference reaches
  * the same effect through metastore partition pruning + ORC footers.
  */
private[plans] class SnapshotFileIndex(qualifiedRoot: org.apache.hadoop.fs.Path,
    fs: org.apache.hadoop.fs.FileSystem, m: Manifest,
    schema: org.apache.spark.sql.types.StructType,
    bloomPrune: (Seq[String],
      Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => Seq[String]
      = (fls, _) => fls)
  extends org.apache.spark.sql.execution.datasources.FileIndex {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
  import org.apache.spark.sql.execution.datasources.PartitionDirectory

  // file statuses synthesized from manifest-recorded sizes — the plan
  // path makes NO filesystem calls; only files whose manifest entry
  // predates size recording (bytes == 0) fall back to a status probe
  private val statuses: Map[String, org.apache.hadoop.fs.FileStatus] =
    m.files.map { f =>
      val p = new org.apache.hadoop.fs.Path(qualifiedRoot, f)
      f -> (m.stats.get(f).map(_.bytes).filter(_ > 0L) match {
        case Some(len) => new org.apache.hadoop.fs.FileStatus(
          len, false, 1, 128L * 1024 * 1024, m.timestampMs, p)
        case None => fs.getFileStatus(p)
      })
    }.toMap

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = Seq(qualifiedRoot)

  // identity partition columns only: transform fields (day(ts) → ts_day)
  // are not table columns — their dirs prune through Pruning's transform
  // mapping on the SOURCE column, not via partition-row binding
  private val idPartCols: Seq[String] =
    m.partitionCols.filter(c => schema.fields.exists(_.name == c))

  override val partitionSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      idPartCols.flatMap(c => schema.fields.find(_.name == c)))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // dataFilters are BEST-EFFORT (Spark re-applies them per row), so the
    // conservative stats pruning may keep extra files; partitionFilters
    // are EXACT — Spark never re-evaluates them after partition pruning —
    // so they must be bound and evaluated against the partition values,
    // not approximated (the standard PartitioningAwareFileIndex binding)
    val kept = bloomPrune(m.files.filter(f => dataFilters.forall(c =>
      Pruning.mayMatch(f, m.stats.get(f), m.partitionCols, schema, c))),
      dataFilters)
    if (idPartCols.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, kept.map(statuses).toArray))
    else {
      val groups = kept.groupBy(partTuple).toSeq
        .map { case (vals, fls) => (partRow(vals), fls) }
      val pruned =
        if (partitionFilters.isEmpty) groups
        else {
          val bound = org.apache.spark.sql.catalyst.expressions.Predicate
            .createInterpreted(partitionFilters
              .reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
              .transform {
                case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                  val i = partitionSchema.fieldIndex(a.name)
                  org.apache.spark.sql.catalyst.expressions.BoundReference(
                    i, partitionSchema(i).dataType, nullable = true)
              })
          groups.filter { case (row, _) => bound.eval(row) }
        }
      pruned.map { case (row, fls) =>
        PartitionDirectory(row, fls.map(statuses).toArray)
      }
    }
  }

  /** The file's partition values as path-segment strings (null = default
    * partition), in partitionSchema order.
    */
  private def partTuple(file: String): Seq[String] =
    idPartCols.map { c =>
      file.split('/').find(_.startsWith(c + "=")).map(seg =>
        Pruning.unescape(seg.substring(c.length + 1))) match {
        case Some("__HIVE_DEFAULT_PARTITION__") | None => null
        case Some(v) => v
      }
    }

  private def partRow(vals: Seq[String]): InternalRow =
    InternalRow.fromSeq(vals.zip(partitionSchema.fields).map {
      case (null, _) => null
      case (v, f) => Cast(Literal(v), f.dataType, Some("UTC")).eval(null)
    })

  override def inputFiles: Array[String] =
    m.files.map(f => new org.apache.hadoop.fs.Path(qualifiedRoot, f).toString)
      .toArray

  override def refresh(): Unit = () // manifests are immutable

  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum
}

/** Driver-side file pruning against manifest stats + partition paths.
  * Conservative by construction: any conjunct it cannot reason about
  * keeps the file. Supported shapes: col op literal for =, <, <=, >, >=,
  * IN (literals...), IS [NOT] NULL — over numeric/string/date/timestamp/
  * boolean columns. Absent min/max bounds prove a column all-NULL (and thus
  * unmatchable by comparison predicates) only when the null count
  * confirms it (nulls >= rows); a stats writer may also omit bounds it
  * cannot order, so a file with non-null rows and no bounds is kept.
  */
private[plans] object Pruning {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  def mayMatch(file: String, stat: Option[FileStat], partitionCols: Seq[String],
      schema: StructType, cond: Expression): Boolean = {
    // transform dir segments parse ONCE per file, lazily (zero work for
    // paths without k=v segments, and at most one split + regex pass per
    // FILE, not per conjunct — on a 100k-file manifest with several
    // predicates that difference is real plan-time work)
    lazy val transformSegs: Seq[(PartitionTransforms.Spec, String)] =
      if (file.indexOf('=') < 0) Nil
      else file.split('/').toSeq.filter(_.indexOf('=') > 0).flatMap { seg =>
        val k = seg.substring(0, seg.indexOf('='))
        val raw = unescape(seg.substring(seg.indexOf('=') + 1))
        if (raw == "__HIVE_DEFAULT_PARTITION__") None
        else PartitionTransforms.fromDirName(k,
          c => schema.fields.exists(_.name == c)).map(_ -> raw)
      }
    conjuncts(cond).forall(c =>
      conjunctMayMatch(file, stat, partitionCols, schema, c,
        () => transformSegs))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    // the engine pins the session to UTC (Engine.configure), where
    // TIMESTAMP <-> TIMESTAMP_NTZ casts are value-identity on the shared
    // epoch-micros representation — the analyzer wraps the ATTRIBUTE in
    // such a cast when a TIMESTAMP literal meets an NTZ column, and
    // pruning may safely see through it
    case c: Cast if tsPair(c.dataType, c.child.dataType) =>
      attrName(c.child)
    case _ => None
  }

  private def tsPair(a: DataType, b: DataType): Boolean =
    (a == TimestampType || a == TimestampNTZType) &&
      (b == TimestampType || b == TimestampNTZType)

  /** Literal, possibly behind the analyzer's inserted (foldable) cast —
    * folded driver-side so `price > 200000` prunes even though the int
    * literal arrives as CAST(200000 AS DOUBLE).
    */
  private object Lit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case c: Cast if c.foldable =>
        try Some(Literal.create(c.eval(null), c.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  /** (min, max, nulls, rows) for `name` in this file — from the file's own
    * `name=v` path segment when present (value is both min and max), from
    * manifest stats otherwise. None = cannot reason, keep the file.
    *
    * The path probe runs for EVERY column, not just the manifest's declared
    * partition columns: after `SET PARTITION SPEC` a table holds files born
    * under different specs, and each file's path records the spec it was
    * written with — so a predicate on a FORMER partition column still
    * prunes the old-spec files exactly, and a predicate on a NEW partition
    * column falls back to stats for them. The only reserved `k=v` segment
    * not naming a real column is the bucket-staging dir, whose key
    * (`graftbucket`) is refused as a column name at CREATE.
    */
  private def rangeOf(file: String, stat: Option[FileStat],
      partitionCols: Seq[String], name: String)
      : Option[(Option[String], Option[String], Long, Long)] =
    file.split('/').find(_.startsWith(name + "=")).map { seg =>
      val raw = unescape(seg.substring(name.length + 1))
      val rows = stat.map(_.rows).getOrElse(Long.MaxValue)
      if (raw == "__HIVE_DEFAULT_PARTITION__")
        (None: Option[String], None: Option[String], rows, rows)
      else (Some(raw), Some(raw), 0L, rows)
    }.orElse(stat.flatMap { s =>
      s.cols.get(name).map(cs => (cs.min, cs.max, cs.nulls, s.rows))
    })

  private def conjunctMayMatch(file: String, stat: Option[FileStat],
      partitionCols: Seq[String], schema: StructType, e: Expression,
      transformSegs: () => Seq[(PartitionTransforms.Spec, String)])
      : Boolean = {
    def dtOf(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)

    // evaluate "some row may satisfy (name op lit)" against the range
    def check(name: String, op: String, l: Literal): Boolean = {
      val r = for {
        dt <- dtOf(name)
        v <- litKey(l, dt)
        (minS, maxS, nulls, rows) <- rangeOf(file, stat, partitionCols, name)
      } yield (minS.flatMap(key(dt, _)), maxS.flatMap(key(dt, _))) match {
        case (Some(mn), Some(mx)) => op match {
          case "="  => cmp(v, mn) >= 0 && cmp(v, mx) <= 0
          case "<"  => cmp(mn, v) < 0
          case "<=" => cmp(mn, v) <= 0
          case ">"  => cmp(mx, v) > 0
          case ">=" => cmp(mx, v) >= 0
        }
        // min/max STRINGS present but unparseable (e.g. a float column
        // whose bound rendered as NaN/Infinity) — cannot reason, keep.
        // Absent min/max proves all-NULL only when the null count says
        // so; a stats writer may also omit bounds it cannot order.
        case _ =>
          if (minS.isDefined || maxS.isDefined) true else nulls < rows
      }
      r.getOrElse(true)
    }
    def flip(op: String): String = op match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case o => o
    }

    // transform-partitioned dirs (day(ts) → ts_day=...): a predicate on
    // the SOURCE column additionally prunes through the dir value's
    // implied source range (time/trunc) or a replayed hash (bucket =).
    // Composes with the direct/stats check above — per-dir bounds AND
    // per-file stats must both admit the file.
    def transformCheck(name: String, op: String, l: Literal): Boolean = {
      val segs = transformSegs()
      if (segs.isEmpty) true
      else dtOf(name) match {
        case None => true
        case Some(dt) =>
          segs.forall {
            case (sp, raw) if sp.src == name && sp.kind == "bucket" =>
              op != "=" || PartitionTransforms.bucketMayMatch(sp, raw, l, dt)
            case (sp, raw) if sp.src == name =>
              PartitionTransforms.sourceRange(sp, raw, dt) match {
                case Some((mnS, mxS)) =>
                  (for {
                    v <- litKey(l, dt)
                    mn <- key(dt, mnS)
                    mx <- key(dt, mxS)
                  } yield op match {
                    case "="  => cmp(v, mn) >= 0 && cmp(v, mx) <= 0
                    case "<"  => cmp(mn, v) < 0
                    case "<=" => cmp(mn, v) <= 0
                    case ">"  => cmp(mx, v) > 0
                    case ">=" => cmp(mx, v) >= 0
                  }).getOrElse(true)
                case None => true
              }
            case _ => true
          }
      }
    }
    def checkAll(name: String, op: String, l: Literal): Boolean =
      check(name, op, l) && transformCheck(name, op, l)

    e match {
      case EqualTo(a, Lit(l)) if attrName(a).isDefined =>
        checkAll(attrName(a).get, "=", l)
      case EqualTo(Lit(l), a) if attrName(a).isDefined =>
        checkAll(attrName(a).get, "=", l)
      case LessThan(a, Lit(l)) if attrName(a).isDefined =>
        checkAll(attrName(a).get, "<", l)
      case LessThan(Lit(l), a) if attrName(a).isDefined =>
        checkAll(attrName(a).get, flip("<"), l)
      case LessThanOrEqual(a, Lit(l)) if attrName(a).isDefined =>
        checkAll(attrName(a).get, "<=", l)
      case LessThanOrEqual(Lit(l), a) if attrName(a).isDefined =>
        checkAll(attrName(a).get, flip("<="), l)
      case GreaterThan(a, Lit(l)) if attrName(a).isDefined =>
        checkAll(attrName(a).get, ">", l)
      case GreaterThan(Lit(l), a) if attrName(a).isDefined =>
        checkAll(attrName(a).get, flip(">"), l)
      case GreaterThanOrEqual(a, Lit(l)) if attrName(a).isDefined =>
        checkAll(attrName(a).get, ">=", l)
      case GreaterThanOrEqual(Lit(l), a) if attrName(a).isDefined =>
        checkAll(attrName(a).get, flip(">="), l)
      case In(a, vs) if attrName(a).isDefined &&
          vs.forall(Lit.unapply(_).isDefined) =>
        vs.exists(v => checkAll(attrName(a).get, "=", Lit.unapply(v).get))
      case IsNull(a) if attrName(a).isDefined =>
        rangeOf(file, stat, partitionCols, attrName(a).get)
          .forall { case (_, _, nulls, _) => nulls > 0 }
      case IsNotNull(a) if attrName(a).isDefined =>
        rangeOf(file, stat, partitionCols, attrName(a).get)
          .forall { case (_, _, nulls, rows) => nulls < rows }
      case _ => true // unsupported shape — never prune on it
    }
  }

  /** Comparable key for a stats string under the column's type. */
  private def key(dt: DataType, s: String): Option[Any] = dt match {
    case _: NumericType =>
      try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
    case BooleanType => Some(BigDecimal(if (s == "true") 1 else 0))
    case DateType =>
      try Some(BigDecimal(java.time.LocalDate.parse(s).toEpochDay))
      catch { case _: java.time.format.DateTimeParseException => None }
    // stats render timestamps in the session time zone (the engine pins
    // UTC, Engine.configure) — parse the wall-clock rendering back to
    // epoch micros, the same scale the Catalyst literal carries
    case TimestampType | TimestampNTZType =>
      try {
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        Some(BigDecimal(ldt.toEpochSecond(java.time.ZoneOffset.UTC)) *
          1000000L + ldt.getNano / 1000L)
      } catch { case _: java.time.format.DateTimeParseException => None }
    case StringType => Some(s)
    case _ => None
  }

  /** Comparable key for a Catalyst literal (internal representation). */
  private def litKey(l: Literal, dt: DataType): Option[Any] =
    if (l.value == null) None
    else (l.dataType, dt) match {
      case (_: NumericType, _: NumericType) =>
        try Some(BigDecimal(l.value.toString))
        catch { case _: NumberFormatException => None }
      case (BooleanType, BooleanType) =>
        Some(BigDecimal(if (l.value == true) 1 else 0))
      case (DateType, DateType) =>
        Some(BigDecimal(l.value.asInstanceOf[Int].toLong))
      // epoch micros; the mixed TZ/NTZ pairs are value-identity under the
      // engine's pinned-UTC session (see attrName's cast unwrapping)
      case (a, b) if tsPair(a, b) =>
        Some(BigDecimal(l.value.asInstanceOf[Long]))
      case (StringType, StringType) => Some(l.value.toString)
      case _ => None // type mismatch (would need a cast) — don't prune
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    // Spark orders strings by UTF-8 bytes (code points); String.compareTo
    // is UTF-16 and misorders supplementary-plane characters against
    // U+E000..U+FFFF — which would prune files whose true range contains
    // the literal
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    case _ => 0
  }

  /** Hive-style %xx path unescape (URLDecoder would corrupt '+'). */
  private[plans] def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(ch); i += 1 }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}
