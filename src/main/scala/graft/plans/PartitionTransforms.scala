package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-style partition TRANSFORMS for snapshot-table spec evolution
  * (ref ql/src/java/org/apache/hadoop/hive/ql/parse/PartitionTransform
  * .java:33-38; iceberg-handler GenericUDFIcebergDay/Month/Year/Bucket/
  * Truncate): a partition field may be a FUNCTION of a data column —
  * `day(ts)`, `month(ts)`, `year(ts)`, `hour(ts)`, `bucket(N, c)`,
  * `truncate(W, c)` — so a day→hour re-grain is one metadata commit.
  *
  * A transform field is encoded ENTIRELY in its directory-key name
  * (`ts_day`, `id_bucket16`, `s_trunc10` — Iceberg's default field
  * naming plus the width, making the name self-describing): manifests
  * carry it in the ordinary `partitionCols`, every file's path remains
  * the durable record of its birth spec, and the manifest format does
  * not change. A name that IS a schema column is always identity (schema
  * wins); [[Snapshots.SnapshotTable.setPartitionSpec]] refuses creating
  * a transform whose derived name collides with a real column.
  *
  * The SOURCE column stays a data column: files store it, per-file stats
  * cover it, the table schema never changes. Reads therefore work
  * unchanged; pruning gains two transform-aware paths in [[Pruning]]:
  * a range predicate on the source maps each dir value back to the
  * source range it covers (a `ts` range prunes `ts_day=...` dirs even
  * where stats are absent), and an equality predicate on a bucket source
  * replays the hash on the literal to prune bucket dirs — file skipping
  * min/max stats can never express.
  */
private[graft] object PartitionTransforms {

  /** One transform field; kind ∈ year|month|day|hour|bucket|trunc. */
  final case class Spec(kind: String, src: String, arg: Int = 0) {
    def dirName: String = kind match {
      case "bucket" | "trunc" => s"${src}_$kind$arg"
      case k => s"${src}_$k"
    }
    def render: String = kind match {
      case "bucket" => s"bucket($arg, $src)"
      case "trunc" => s"truncate($arg, $src)"
      case k => s"$k($src)"
    }
  }

  private val FnRe =
    """(?i)(year|month|day|hour)\s*\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)""".r
  private val ArgFnRe =
    """(?i)(bucket|truncate|trunc)\s*\(\s*(\d+)\s*,\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)""".r

  /** Parse one SET PARTITION SPEC entry: Right(transform) or
    * Left(identity column name, passed through untouched).
    */
  def parseEntry(e: String): Either[String, Spec] = e.trim match {
    case FnRe(k, c) => Right(Spec(k.toLowerCase, c))
    case ArgFnRe(k, n, c) =>
      Right(Spec(if (k.toLowerCase.startsWith("trunc")) "trunc" else "bucket",
        c, n.toInt))
    case plain => Left(plain)
  }

  private val DirArgRe = """(.+)_(bucket|trunc)(\d+)""".r
  private val DirFnRe = """(.+)_(year|month|day|hour)""".r

  /** Recover the transform from a dir-key name, or None for identity.
    * `isColumn` gates both directions: a name that is itself a column is
    * identity, and the recovered source must be a column.
    */
  def fromDirName(name: String, isColumn: String => Boolean): Option[Spec] =
    if (isColumn(name)) None
    else name match {
      case DirArgRe(src, k, n) if isColumn(src) => Some(Spec(k, src, n.toInt))
      case DirFnRe(src, k) if isColumn(src) => Some(Spec(k, src))
      case _ => None
    }

  /** Validate the transform against its source column's type. */
  def validate(s: Spec, dt: DataType): Unit = s.kind match {
    case "year" | "month" | "day" | "hour" =>
      require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
        s"${s.render}: time transform needs a date/timestamp column, got $dt")
      require(!(s.kind == "hour" && dt == DateType),
        s"${s.render}: hour() of a DATE has no hour component")
    case "bucket" =>
      require(s.arg > 0, s"${s.render}: bucket count must be positive")
    case "trunc" =>
      require(s.arg > 0, s"${s.render}: truncate width must be positive")
      require(Seq(StringType, ByteType, ShortType, IntegerType, LongType)
        .contains(dt),
        s"${s.render}: truncate needs a string or integral column, got $dt")
  }

  /** The dir-value expression staged writes partition by. Time transforms
    * render human-readable path values (Iceberg's own rendering); bucket
    * is Spark's murmur3 pmod — the same hash the engine's bucketed
    * layouts use, so the pruning side can replay it on a literal.
    */
  /** Spark's Murmur3 hash built DIRECTLY as a Catalyst expression. The
    * engine re-binds the SQL name `hash` to Hive's Java-style hashCode
    * (HiveFunctions, pinned by the auto_join conformance transcripts),
    * and Spark 4's `functions.hash` resolves through that registry — so
    * every bucket-placement site (which MUST stay aligned with
    * HashPartitioning's Murmur3) builds the expression here instead.
    */
  def murmur3(cols: Column*): Column =
    org.apache.spark.sql.GraftShims.column(
      new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        cols.map(org.apache.spark.sql.GraftShims.expression)))

  def valueColumn(s: Spec, dt: DataType): Column = {
    val c = col(s.src)
    s.kind match {
      case "year" => year(c)
      case "month" => date_format(c.cast(TimestampType), "yyyy-MM")
      case "day" => date_format(c.cast(TimestampType), "yyyy-MM-dd")
      case "hour" => date_format(c.cast(TimestampType), "yyyy-MM-dd-HH")
      case "bucket" => pmod(murmur3(c), lit(s.arg))
      case "trunc" => dt match {
        case StringType => substring(c, 1, s.arg)
        case _ => c - pmod(c, lit(s.arg))
      }
    }
  }

  /** The SOURCE-column range a dir value covers, rendered in the same
    * string forms per-file stats use (so [[Pruning]] parses them with the
    * one `key` routine). Half-open upper ends render as an inclusive max
    * — conservative by one boundary instant. None = cannot reason (keep
    * the file). Bucket has no range; see [[bucketMayMatch]].
    */
  def sourceRange(s: Spec, raw: String, dt: DataType)
      : Option[(String, String)] = {
    import java.time.{LocalDate, LocalDateTime, YearMonth}
    def render(start: LocalDateTime, end: LocalDateTime) = dt match {
      case DateType =>
        Some((start.toLocalDate.toString, end.toLocalDate.toString))
      case TimestampType | TimestampNTZType =>
        val f = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss")
        Some((start.format(f), end.format(f)))
      case _ => None
    }
    try s.kind match {
      case "year" =>
        val y = raw.toInt
        render(LocalDateTime.of(y, 1, 1, 0, 0),
          LocalDateTime.of(y + 1, 1, 1, 0, 0))
      case "month" =>
        val ym = YearMonth.parse(raw)
        render(ym.atDay(1).atStartOfDay(),
          ym.plusMonths(1).atDay(1).atStartOfDay())
      case "day" =>
        val d = LocalDate.parse(raw)
        render(d.atStartOfDay(), d.plusDays(1).atStartOfDay())
      case "hour" =>
        // path value yyyy-MM-dd-HH
        val d = LocalDateTime.parse(raw.take(10) + "T" + raw.drop(11) + ":00")
        render(d, d.plusHours(1))
      case "trunc" => dt match {
        case StringType => nextPrefix(raw).map(up => (raw, up))
        case ByteType | ShortType | IntegerType | LongType =>
          val t = BigInt(raw)
          Some((t.toString, (t + s.arg).toString))
        case _ => None
      }
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Smallest string greater than every string with prefix `p`: bump the
    * last bumpable code unit and drop the tail. None when no such unit
    * exists below the surrogate range (then no safe upper bound — keep).
    */
  private def nextPrefix(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) >= '\uD7FF') i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** Can `src = literal` hold in a dir whose bucket value is `raw`?
    * Replays the write-side murmur3 pmod on the literal — exact, not a
    * range. Conservative (true) on any type mismatch or parse failure.
    */
  def bucketMayMatch(s: Spec, raw: String,
      l: org.apache.spark.sql.catalyst.expressions.Literal,
      dt: DataType): Boolean =
    if (l.dataType != dt || l.value == null) true
    else try {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        Seq(l), 42).eval(null).asInstanceOf[Int]
      (((h % s.arg) + s.arg) % s.arg) == raw.toInt
    } catch { case _: Exception => true }
}
