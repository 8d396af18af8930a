package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (ref optimizer/SkewJoinOptimizer.java,
  * exec/SkewJoinHandler.java). On Spark, AQE's skew-join splitting covers the
  * sort-merge case at runtime; explicit salting remains the tool when one
  * build-side key dominates a broadcast-infeasible join or an aggregation.
  */
object Skew {

  /** Salted equi-join: the skewed (large, hot-keyed) side gets a random salt
    * in [0, salts); the small side is replicated once per salt value. The
    * shuffle key becomes (key, salt) — a hot key spreads over `salts`
    * partitions instead of one straggler task.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // replication of `other` is only sound when unmatched `other` rows are
    // not emitted (each of its `salts` copies would surface separately)
    require(Set("inner", "left", "leftouter", "leftsemi", "cross").contains(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left-side joins, got $joinType")
    val salted = skewed.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial -> final) aggregation with salting: count/sum-style
    * aggregates over a hot key first aggregate on (key, salt), then merge.
    * Catalyst already does map-side partial aggregation; explicit salting
    * additionally spreads the *reduce* side of a single hot key.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))

  /** Diagnostic: per-key row counts with share of total — used to decide
    * whether a key needs salting/broadcast.
    */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc)
      .limit(topK)
  }
}
