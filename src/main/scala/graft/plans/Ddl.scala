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

  /** ALTER TABLE ... CONCATENATE analog (ref exec/OrcFileMergeOperator /
    * RCFileMergeOperator): compacts a directory of small parquet files into
    * `targetFiles` — the small-files problem is the classic large-warehouse
    * scan killer (file-open overhead + tiny row groups defeat pushdown).
    * Atomic via the same staged-swap protocol as copy-on-write DML.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(path + "._compact_bak")
    fs.delete(tmp, true)
    spark.read.parquet(path).coalesce(targetFiles).write.parquet(tmp.toString)
    fs.delete(bak, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(path), bak))
      throw new IllegalStateException(s"cannot stage $path for compaction")
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(path))) {
      fs.rename(bak, new org.apache.hadoop.fs.Path(path))
      throw new IllegalStateException(s"cannot commit compacted $path")
    }
    fs.delete(bak, true)
    spark.catalog.refreshByPath(path)
  }

  /** MSCK REPAIR TABLE — discover partitions written outside the catalog. */
  def msckRepair(spark: SparkSession, table: String): Unit =
    spark.catalog.recoverPartitions(table)

  /** EXPORT TABLE t TO 'dir' (ref ql/src/java/org/apache/hadoop/hive/ql/parse/
    * ExportSemanticAnalyzer.java): dumps the table's data plus a metadata
    * descriptor so [[importTable]] can reconstruct it — schema, partition
    * columns, and layout survive the round trip.
    */
  def exportTable(spark: SparkSession, table: String, dir: String): Unit = {
    val df = spark.table(table)
    val partCols: Seq[String] =
      spark.catalog.listColumns(table).collect().filter(_.isPartition).map(_.name).toSeq
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).save(s"$dir/data")
    val meta = s"""{"table": ${ujsonStr(table)}, "schema": ${df.schema.json},""" +
      s""" "partitionColumns": [${partCols.map(ujsonStr).mkString(",")}]}"""
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_metadata.json"), true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }

  /** IMPORT TABLE t FROM 'dir' (ref parse/ImportSemanticAnalyzer.java):
    * recreates a table from an [[exportTable]] dump, preserving schema and
    * partition layout. `table` defaults to the exported name.
    */
  def importTable(spark: SparkSession, dir: String, table: String = ""): String = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$dir/_metadata.json"))
    val meta = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // minimal field extraction (metadata is engine-written, shape is fixed)
    def strField(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      m.findFirstMatchIn(meta).map(_.group(1)).getOrElse("")
    }
    val name = if (table.nonEmpty) table else strField("table")
    val schemaJson = {
      val i = meta.indexOf("\"schema\":") + "\"schema\":".length
      val j = meta.lastIndexOf(" \"partitionColumns\"")
      meta.substring(i, j).trim.stripSuffix(",")
    }
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val partCols = {
      val i = meta.indexOf("\"partitionColumns\": [") + "\"partitionColumns\": [".length
      val j = meta.indexOf("]", i)
      meta.substring(i, j).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
    }
    val df = spark.read.schema(schema).parquet(s"$dir/data")
      .select(schema.fieldNames.map(col): _*) // restore declared column order
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).saveAsTable(name)
    name
  }

  private def ujsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
