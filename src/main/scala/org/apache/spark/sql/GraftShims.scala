package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column<->Expression converters so custom
  * Catalyst expressions can be exposed as Columns (Spark 4 moved Column onto
  * ColumnNode; classic.ExpressionUtils holds the conversion).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a logical plan (classic.Dataset.ofRows — analyzes
    * eagerly, resolving views/TVFs in the session).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Fork the session with a COPY of its state (conf, temp views, function
    * registry) — Spark 4 keeps cloneSession private[sql]. Used to isolate
    * the scheduled-query tick's identity swaps from the caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-tag a finished batch plan as a STREAMING frame (one streaming
    * LogicalRDD over the plan's own execution) — what a V1 `Source`'s
    * getBatch must return; internalCreateDataFrame is private[sql].
    */
  def asStreamingFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution
    classic.internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = true)
  }
}
