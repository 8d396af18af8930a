package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType}

/** Text-format readers covering the reference's SerDe variants that plain
  * `DataFrameReader` options don't reach:
  *
  *   - regex-parsed text (ref serde2/RegexSerDe.java): one capture group
  *     per column;
  *   - multi-character delimiters (ref serde2/MultiDelimitSerDe.java):
  *     LazySimpleSerDe only splits on single chars, the multi-delim SerDe
  *     exists precisely for `||`-style separators;
  *   - per-file header/footer skipping (ref io/SkippingTextInputFormat
  *     .java + skip.header.line.count/skip.footer.line.count table
  *     properties).
  *
  * All three are projections over the built-in text source — regex/split
  * parse at scan speed under whole-stage codegen, exactly the
  * LazySimpleSerDe-replacement stance of SURVEY §2.2. Rows that do not
  * match a regex yield NULL columns (RegexSerDe's contract).
  */
object TextFormats {

  /** RegexSerDe: `pattern` must have one capture group per entry in
    * `columns`; non-matching lines produce all-NULL rows (kept, as the
    * reference does — filter them explicitly if unwanted).
    */
  def readRegex(spark: SparkSession, path: String, pattern: String,
      columns: Seq[String]): DataFrame = {
    val lines = spark.read.text(path)
    lines.select(columns.zipWithIndex.map { case (c, i) =>
      // regexp_extract returns "" for non-matches; RegexSerDe yields NULL
      val v = regexp_extract(col("value"), pattern, i + 1)
      when(col("value").rlike(pattern), v).otherwise(lit(null)).as(c)
    }: _*)
  }

  /** MultiDelimitSerDe: split on a LITERAL multi-character delimiter.
    * Missing trailing fields read as NULL, extra fields are ignored —
    * the lazy-SerDe column contract.
    */
  def readMultiDelim(spark: SparkSession, path: String, delimiter: String,
      columns: Seq[String]): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(delimiter)
    val parts = split(col("value"), quoted, -1)
    spark.read.text(path).select(columns.zipWithIndex.map { case (c, i) =>
      when(size(parts) > i, element_at(parts, i + 1)).otherwise(lit(null)).as(c)
    }: _*)
  }

  /** LazySimpleSerDe-parity cast of a text field to its declared type.
    * Hive's decimal text parse (ref serde2/lazy/LazyHiveDecimal.java via
    * common HiveDecimal.create) tolerates surrounding blanks and a bare
    * trailing decimal point — `"00000."` reads as 0 — where
    * java.math.BigDecimal (the parser behind Spark's CSV reader and
    * string→decimal cast) throws, surfacing NULL. Everything else is the
    * ordinary cast.
    */
  def hiveTextCast(c: Column, dt: DataType): Column = dt match {
    case d: DecimalType => regexp_replace(trim(c), "\\.$", "").cast(d)
    case other => c.cast(other)
  }

  /** Per-FILE header/footer skipping (skip.header.line.count /
    * skip.footer.line.count): each file's first `skipHeader` and last
    * `skipFooter` lines drop — per file, not per split, which is why the
    * reference needed a dedicated InputFormat. Implemented over wholetext
    * (one record per file keeps the line index exact regardless of
    * partitioning); files are the unit of parallelism, matching the
    * reference's non-splittable skipping reader (SkippingTextInputFormat
    * marks skipped files non-splittable for the same reason).
    */
  def readSkipping(spark: SparkSession, path: String, skipHeader: Int,
      skipFooter: Int, column: String = "value"): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
    val lines = split(regexp_replace(col("value"), "\r\n|\r", "\n"), "\n")
    // a trailing newline yields one empty phantom line — drop it before
    // footer accounting so the footer count applies to real lines
    val trimmed = when(element_at(lines, size(lines)) === "",
      slice(lines, lit(1), size(lines) - 1)).otherwise(lines)
    files.select(explode(
      slice(trimmed, lit(skipHeader + 1),
        greatest(size(trimmed) - skipHeader - skipFooter, lit(0))))
      .as(column))
  }
}
