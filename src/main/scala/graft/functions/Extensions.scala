package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** User extension points — the engine's analog of Hive's pluggable function
  * contracts (SURVEY §2.3/§2.5/§2.6):
  *
  *  - GenericUDF        -> `registerScalar` (Scala function; for hot paths
  *    prefer a native `Expression` like graft.functions.MinHashSignature)
  *  - GenericUDAFEvaluator (iterate/terminatePartial/merge/terminate)
  *    -> `registerAggregator` with `Aggregator[IN,BUF,OUT]`
  *    (zero/reduce/merge/finish maps 1:1 onto the Hive evaluator modes)
  *  - GenericUDTF (process/forward) -> a catalyst `Generator` registered via
  *    `registerGenerator` (see graft.functions.ParseUrlTuple for a worked
  *    example)
  */
object Extensions {

  /** Register a scalar UDF under `name` (SQL + DataFrame visible). */
  def registerScalar[I: reflect.runtime.universe.TypeTag,
      O: reflect.runtime.universe.TypeTag](
      spark: SparkSession, name: String, f: I => O): Unit =
    spark.udf.register(name, org.apache.spark.sql.functions.udf(f))

  /** Register a typed Aggregator as a SQL-visible UDAF. */
  def registerAggregator[I, B, O](spark: SparkSession, name: String,
      agg: Aggregator[I, B, O])(implicit enc: Encoder[I]): Unit =
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(agg, enc))

  /** Register a Generator (UDTF) builder under `name` for use with
    * LATERAL VIEW / generator positions in SQL.
    */
  def registerGenerator(spark: SparkSession, name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Generator): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder(_), "built-in")
}
