package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** DDL surface (SURVEY §2.8): managed tables with Hive-style partitioning and
  * bucketing, CTAS, views, ANALYZE feeding Spark CBO, dynamic-partition
  * insert, INSERT OVERWRITE DIRECTORY and LOAD DATA equivalents.
  *
  * Partitioned writes produce key=value directory layouts (Catalyst prunes
  * partitions statically and dynamically); bucketed+sorted tables let
  * co-bucketed joins and aggregations skip the shuffle entirely — the Spark
  * analog of Hive's CLUSTERED BY ... SORTED BY (ref HiveParser.g:1880,
  * SMBMapJoinOperator.java:58).
  */
object Ddl {

  /** CREATE TABLE ... PARTITIONED BY ... AS SELECT (CTAS). */
  def createPartitionedTable(df: DataFrame, table: String,
      partitionCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .partitionBy(partitionCols: _*)
      .format("parquet")
      .saveAsTable(table)

  /** CREATE TABLE ... CLUSTERED BY (cols) SORTED BY (cols) INTO n BUCKETS. */
  def createBucketedTable(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Plain CTAS. */
  def ctas(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet").saveAsTable(table)

  /** CREATE [OR REPLACE] VIEW (session-scoped; Hive's viewOriginalText
    * becomes the captured plan).
    */
  def createView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] — feeds Spark CBO
    * (join reorder, broadcast decisions), the analog of Hive's
    * ProcessAnalyzeTable + StatsOptimizer.
    */
  def analyze(spark: SparkSession, table: String, columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** INSERT [OVERWRITE] INTO a partitioned table with dynamic partitions:
    * every distinct partition-column value in `rows` lands in its own
    * key=value directory (Spark handles the dynamic layout natively).
    */
  def insertDynamicPartitions(rows: DataFrame, table: String,
      overwrite: Boolean = false): Unit =
    rows.write.mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .insertInto(table)

  /** INSERT OVERWRITE [LOCAL] DIRECTORY equivalent. */
  def insertOverwriteDirectory(df: DataFrame, dir: String,
      format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite).format(format).save(dir)

  /** LOAD DATA INPATH equivalent: register external files as a table. */
  def loadData(spark: SparkSession, path: String, table: String,
      format: String = "parquet"): Unit =
    spark.catalog.createTable(table, path, format)

  /** TABLESAMPLE: deterministic Bernoulli sample with a seed. */
  def tablesample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)
}
