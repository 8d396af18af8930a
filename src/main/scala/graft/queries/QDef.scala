package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark-first implementation plus (when the operation
  * is SQL-expressible) an equivalent DuckDB oracle SQL over the same parquet
  * tables. `oracle == None` downgrades the driver check to rows-only — used
  * for algorithm-specific operators (MinHash, SimHash, LSH, approx sketches)
  * whose exact output no other engine reproduces; those are instead covered by
  * ScalaTest specs.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  /** Query whose correctness is checked cell-by-cell against DuckDB. */
  def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))

  /** Rows-only check (non-SQL-expressible operator; ScalaTest covers it). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}

/** Cross-engine-exact aggregation helpers. The testdata's monetary doubles
  * are 2-decimal quantized, so summing them as DECIMAL is exact and identical
  * in Spark and DuckDB — float-rounding flakiness in verification is
  * structurally impossible (double-sum ordering differences otherwise shift
  * the last bits and can flip a round()).
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import graft.functions.MoneyDecimal

  // All double→decimal conversions below go through MoneyDecimal — the
  // allocation-free half-up conversion that equals CAST(x AS DECIMAL(p,2))
  // exactly on 2-decimal-quantized doubles (the testdata money contract;
  // equality pinned per column by OracleTypeParitySpec). The stock cast
  // costs a BigDecimal.valueOf(double) — i.e. Double.toString — per row:
  // 3.4× the aggregate's arithmetic on TPC-H Q1 (measured r17).

  /** 2-decimal money value as exact decimal. */
  def dec(c: Column): Column = MoneyDecimal(c, 18, 2)

  /** Small 2-decimal factor (discount/tax style) — keeps product precision
    * within DECIMAL(38) in both engines.
    */
  def dec8(c: Column): Column = MoneyDecimal(c, 8, 2)

  /** Exact DECIMAL(27,4) product of two 2-decimal-quantized doubles —
    * same value and type as `dec(a) * dec8(b)` (the double product of
    * 2dp-exact factors is within 1e-11 of the true 4dp product, so one
    * half-up at scale 4 reproduces the decimal multiply), without the
    * per-row BigDecimal multiply.
    *
    * Magnitude bound (ADVICE r17 — tighter than MoneyDecimal's own
    * domain): the double product is only guaranteed s=4-quantized-exact
    * while |a·b|·10^4 stays well under 2^53, i.e. |a·b| ≲ 4·10^11 —
    * beyond that the product's ulp exceeds the 1e-4 rounding margin and
    * half-up at scale 4 can disagree with the decimal multiply. TPC-H
    * money magnitudes (≤ ~10^7 per row) sit 4+ orders inside the bound;
    * MoneyDecimalSpec pins the equality on the testdata columns.
    */
  def dmul2(a: Column, b: Column): Column = MoneyDecimal(a * b, 27, 4)

  /** Exact DECIMAL(36,6) triple product — same value and type as
    * `dec(a) * dec8(b) * dec8(c)` on 2dp-quantized factors.
    */
  def dmul3(a: Column, b: Column, c: Column): Column =
    MoneyDecimal(a * b * c, 36, 6)

  /** Exact sum of a 2-decimal double column, emitted as double. */
  def dsum(c: Column): Column = sum(MoneyDecimal(c, 25, 2)).cast("double")

  /** Exact sum of a decimal product expression, emitted as double. */
  def dsumExpr(c: Column): Column = sum(c).cast("double")

  /** Exact average, HALF_UP at 4dp, as double. Implemented as the integer
    * formula floor((S*10^4*2 + n) DIV (2n)) / 10^4 with true integral
    * division — Spark's decimal division caps precision and re-rounds at an
    * intermediate scale, which disagrees with a single HALF_UP rounding
    * exactly at scale boundaries (observed at sf0.1). The oracle SQL uses the
    * same formula, so both engines round identically by construction.
    */
  def davg(c: Column): Column = {
    val m = (sum(MoneyDecimal(c, 25, 2)) * lit(10000)).cast("long")
    val n = count(lit(1))
    val q = org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftShims.expression(m * 2 + n),
        org.apache.spark.sql.GraftShims.expression(n * 2)))
    q.cast("double") / 10000.0
  }
}
