package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write DML over parquet table directories: UPDATE / DELETE / MERGE.
  *
  * Hive implements these on ACID tables via delta files + compaction
  * (ref ql/src/java/org/apache/hadoop/hive/ql/io/AcidUtils.java:148,
  * parse/UpdateSemanticAnalyzer.java, parse/MergeSemanticAnalyzer.java:46 —
  * MERGE rewrites to a multi-insert). Without a table format, the Spark-native
  * equivalent is copy-on-write: plan the post-image declaratively (Catalyst
  * optimizes the anti-join/union), write it out, atomically swap directories.
  * Semantics: last-writer-wins, single-writer; no concurrent-writer
  * guarantees (Hive needed a metastore txn manager for that — out of scope,
  * SURVEY §7).
  *
  * Scale note: the post-image write is a full-table rewrite here; on a
  * partitioned table the same plan applies per affected partition only
  * (partition-pruned COW), which is how this scales to 100 TB — rewrite cost
  * is proportional to touched partitions, not table size.
  */
object Dml {

  private def swapIn(spark: SparkSession, table: String, post: DataFrame): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(table + "._cow_tmp")
    val bak = new Path(table + "._cow_bak")
    fs.delete(tmp, true)
    post.write.parquet(tmp.toString)
    fs.delete(bak, true)
    if (!fs.rename(new Path(table), bak))
      throw new IllegalStateException(s"cannot stage current table $table")
    if (!fs.rename(tmp, new Path(table))) {
      fs.rename(bak, new Path(table)) // roll back
      throw new IllegalStateException(s"cannot commit new table $table")
    }
    fs.delete(bak, true)
    // drop any cached file listing for the swapped path
    spark.catalog.refreshByPath(table)
    // drop materialized views built over this path — they are now stale
    MaterializedViews.invalidateSource(spark, table)
  }

  /** DELETE FROM table WHERE cond. */
  def deleteWhere(spark: SparkSession, table: String, cond: Column): Unit = {
    val t = spark.read.parquet(table)
    // keep rows where cond is false OR null (SQL DELETE semantics)
    swapIn(spark, table, t.filter(!coalesce(cond, lit(false))))
  }

  /** UPDATE table SET col = expr, ... WHERE cond. */
  def updateWhere(spark: SparkSession, table: String, cond: Column,
      set: Map[String, Column]): Unit = {
    val t = spark.read.parquet(table)
    val hit = coalesce(cond, lit(false))
    val post = set.foldLeft(t) { case (df, (c, e)) =>
      df.withColumn(c, when(hit, e).otherwise(col(c)))
    }
    swapIn(spark, table, post)
  }

  /** MERGE INTO target USING source ON key:
    * matched -> apply `whenMatchedSet` (or delete when `whenMatchedDelete`),
    * not matched -> insert source row.
    * Planned as one full-outer join + projection — the declarative equivalent
    * of Hive's rewrite-to-multi-insert.
    *
    * Standard MERGE (including Hive's) raises a cardinality violation when
    * multiple source rows MATCH the same target row — otherwise each matched
    * target row would silently be duplicated in the post-image. Enforced with
    * a pre-join check on duplicate source keys that exist in the target
    * (duplicate keys absent from the target are legal: both rows insert;
    * NULL keys never match anything).
    */
  def merge(spark: SparkSession, table: String, source: DataFrame,
      targetKey: String, sourceKey: String,
      whenMatchedSet: Map[String, Column] = Map.empty,
      whenMatchedDelete: Boolean = false): Unit = {
    val targetKeys = spark.read.parquet(table).select(col(targetKey).as(sourceKey))
    val dup = source.join(targetKeys, Seq(sourceKey), "left_semi")
      .filter(col(sourceKey).isNotNull)
      .groupBy(col(sourceKey)).count().filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalStateException(
        s"MERGE cardinality violation: multiple source rows match target $sourceKey=${dup.head.get(0)}")
    val t = spark.read.parquet(table).as("t")
    val s = source.as("s")
    val cols = spark.read.parquet(table).columns
    val joined = t.join(s, col(s"t.$targetKey") === col(s"s.$sourceKey"), "full_outer")
    val matched = col(s"t.$targetKey").isNotNull && col(s"s.$sourceKey").isNotNull
    val post =
      if (whenMatchedDelete) {
        // keep unmatched target rows; insert unmatched source rows
        joined.filter(!matched)
          .select(cols.map { c =>
            coalesce(col(s"t.$c"), col(s"s.$c")).as(c)
          }: _*)
      } else {
        joined.select(cols.map { c =>
          val updated = whenMatchedSet.getOrElse(c, col(s"t.$c"))
          when(matched, updated)
            .otherwise(coalesce(col(s"t.$c"), col(s"s.$c"))).as(c)
        }: _*)
      }
    swapIn(spark, table, post)
  }

  /** INSERT INTO (append). */
  def insertInto(spark: SparkSession, table: String, rows: DataFrame): Unit = {
    rows.write.mode("append").parquet(table)
    spark.catalog.refreshByPath(table)
    MaterializedViews.invalidateSource(spark, table)
  }

  /** Multi-insert: FROM src INSERT INTO a SELECT ... INSERT INTO b SELECT ...
    * (ref SemanticAnalyzer multi-insert). The source is analyzed once and
    * cached so N sinks share one scan — the Spark analog of Hive's shared
    * FROM clause / SharedWorkOptimizer.
    */
  def multiInsert(spark: SparkSession, source: DataFrame,
      sinks: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = source.cache()
    try sinks.foreach { case (f, path) =>
      f(cached).write.mode("append").parquet(path)
      spark.catalog.refreshByPath(path)
      MaterializedViews.invalidateSource(spark, path)
    } finally cached.unpersist()
  }
}
