package graft.sources

import graft.SparkSpec

/** Legacy-calendar file reads (ref orc_legacy_mixed_date.q /
  * orc_legacy_mixed_timestamp.q, data/files/orc_legacy_mixed_*.orc —
  * ORC files written by OLD Hive under the hybrid Julian+Gregorian
  * calendar, no proleptic marker): the reader must answer the WRITER'S
  * field values — 1012-02-21 stays 1012-02-21 — not the shifted dates a
  * naive proleptic read of the raw day counts would show. Spark's ORC
  * reader performs the rebase natively; this spec pins the exact
  * .q.out rows so a reader or conf regression (datetimeRebaseMode)
  * cannot silently shift seventh-to-eleventh-century data. The parquet
  * twins (parquet_legacy_mixed_*.parq) pin the same contract on the
  * primary format.
  */
class LegacyCalendarSpec extends SparkSpec {

  private val refFiles = "/root/reference/data/files"
  private def have(f: String) = new java.io.File(s"$refFiles/$f").isFile

  private val expectedDates = Seq("2012-02-21", "2014-02-11",
    "1947-02-11", "8200-02-11", "1012-02-21", "1014-02-11",
    "0947-02-11", "0200-02-11")

  test("legacy ORC dates read with the writer's hybrid-calendar fields " +
      "(orc_legacy_mixed_date.q.out rows)") {
    assume(have("orc_legacy_mixed_dates.orc"))
    val got = spark.read.orc(s"$refFiles/orc_legacy_mixed_dates.orc")
      .collect().map(_.get(0).toString).toSeq
    assert(got === expectedDates)
  }

  test("legacy ORC timestamps keep fields and millis " +
      "(orc_legacy_mixed_timestamp.q.out rows)") {
    assume(have("orc_legacy_mixed_timestamps.orc"))
    val got = spark.read.orc(s"$refFiles/orc_legacy_mixed_timestamps.orc")
      .collect().map(_.get(0).toString).toSeq
    assert(got === expectedDates.map(d => s"$d 07:08:09.123"))
  }

  test("legacy parquet needs the explicit LEGACY rebase (sources." +
      "LegacyParquet) — parquet carries no writer-calendar metadata") {
    assume(have("parquet_legacy_mixed_dates.parq"))
    // the DEFAULT read is proleptic-raw (matches DuckDB; the file is
    // indistinguishable from any parquet-mr output) — ancient dates
    // arrive shifted
    val raw = spark.read
      .parquet(s"$refFiles/parquet_legacy_mixed_dates.parq")
      .collect().map(_.get(0).toString).toSeq
    assert(raw.contains("1012-02-27"), s"default-read drifted: $raw")
    // the engine's opt-in reader answers the reference's fields
    val rebased = LegacyParquet
      .read(spark, s"$refFiles/parquet_legacy_mixed_dates.parq")
      .collect().map(_.get(0).toString).toSeq
    assert(rebased === expectedDates)
  }
}
