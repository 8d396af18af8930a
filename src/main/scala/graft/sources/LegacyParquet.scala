package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-written LEGACY parquet (hybrid Julian+Gregorian calendar, no
  * Spark writer metadata — ref parquet_legacy_mixed_date/timestamp.q
  * and their data files): the writer's field values for pre-1582 dates
  * sit at hybrid day counts, so a proleptic read shifts them
  * (1012-02-21 arrives as 1012-02-27). ORC carries enough writer
  * metadata for Spark to rebase automatically; parquet does not — the
  * reader cannot distinguish a Hive-2 file from any other parquet-mr
  * file, so Spark (and DuckDB) default to the raw proleptic read.
  *
  * This reader is the engine's explicit opt-in for such files: the
  * per-read LEGACY rebase reproduces the reference's .q.out fields
  * exactly (LegacyCalendarSpec pins the rows). It is deliberately NOT
  * a global conf — the driver's own testdata (pyarrow, proleptic)
  * must keep the raw read, and only ancient dates differ.
  */
object LegacyParquet {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("datetimeRebaseMode", "LEGACY")
      .option("int96RebaseMode", "LEGACY")
      .parquet(path)
}
