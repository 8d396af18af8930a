package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC federation (SURVEY §2.2 row 33) — the Spark-native analog of the
  * reference's JDBC storage handler (ref jdbc-handler/src/main/java/org/
  * apache/hive/storage/jdbc/JdbcStorageHandler.java and
  * JdbcInputFormat.java — external RDBMS tables surfaced as scannable
  * tables with predicate/projection pushdown and split generation).
  *
  * Spark's built-in `format("jdbc")` already provides the storage-handler
  * capabilities declaratively:
  *  - filter + column pushdown into the remote query (Catalyst pushes
  *    predicates; the scan shows `PushedFilters`),
  *  - split generation via (partitionColumn, lowerBound, upperBound,
  *    numPartitions) — N executors each issue a range-bounded query, the
  *    analog of the handler's `numSplits` (JdbcInputFormat.getSplits),
  *  - arbitrary pushdown-of-everything via a `query` instead of a table.
  *
  * Scale: an unpartitioned JDBC read is ONE executor holding one connection
  * — at 100 TB-side joins always use [[readPartitioned]] for the big side,
  * or read the small side unpartitioned and broadcast it into the join.
  * Tested in-container against embedded Derby (SourcesSpec); any
  * DriverManager-visible driver works the same.
  */
object Jdbc {

  /** Read one table (or subquery aliased as a table) over JDBC. Single
    * connection — use for dimension-sized relations, then `broadcast()` into
    * joins.
    */
  def read(spark: SparkSession, url: String, table: String,
      driver: String, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .options(options)
      .load()

  /** Parallel partitioned read: `numPartitions` range-bounded queries on
    * `partitionColumn` run concurrently (split generation). The column must
    * be numeric/date/timestamp; bounds only steer split sizing, they do NOT
    * filter rows.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      driver: String, partitionColumn: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()

  /** Write a DataFrame to a JDBC table (executor-parallel batched inserts —
    * one connection per partition; coalesce first if the remote can't take
    * that many writers).
    */
  def write(df: DataFrame, url: String, table: String, driver: String,
      mode: String = "error", options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .options(options)
      .mode(mode)
      .save()
}
