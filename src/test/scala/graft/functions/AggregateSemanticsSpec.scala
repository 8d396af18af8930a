package graft.functions

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

/** The regr_* builtin family (Hive FunctionRegistry.java:536-579) computed by
  * Spark vs the closed-form exact-decimal formulas used by the oracled
  * f10_agg_regr query. The builtins accumulate central moments in doubles
  * (order-dependent last bits), so the driver-facing query uses the exact
  * formulas; this spec proves the builtins agree with them to relative 1e-9,
  * keeping regr_slope/intercept/r2/sxx/syy/sxy/avgx/avgy/count covered.
  */
class AggregateSemanticsSpec extends SparkSpec {

  test("regr_* builtins match exact-decimal closed forms") {
    import spark.implicits._
    val li = Engine.table(spark, sfDir, "lineitem")
    val built = li.agg(
      regr_slope($"l_extendedprice", $"l_quantity").as("slope"),
      regr_intercept($"l_extendedprice", $"l_quantity").as("icept"),
      regr_r2($"l_extendedprice", $"l_quantity").as("r2"),
      regr_count($"l_extendedprice", $"l_quantity").as("n"),
      regr_avgx($"l_extendedprice", $"l_quantity").as("avgx"),
      regr_avgy($"l_extendedprice", $"l_quantity").as("avgy"),
      regr_sxx($"l_extendedprice", $"l_quantity").as("sxx"),
      regr_syy($"l_extendedprice", $"l_quantity").as("syy"),
      regr_sxy($"l_extendedprice", $"l_quantity").as("sxy")).head()

    import org.apache.spark.sql.types.DecimalType
    val x = $"l_quantity".cast(DecimalType(12, 2))
    val y = $"l_extendedprice".cast(DecimalType(12, 2))
    val s = li.agg(
      count(lit(1)).as("n"),
      sum(x).cast(DecimalType(15, 2)).as("sx"),
      sum(y).cast(DecimalType(15, 2)).as("sy"),
      sum(x * x).cast(DecimalType(25, 4)).as("sxx2"),
      sum(y * y).cast(DecimalType(25, 4)).as("syy2"),
      sum(x * y).cast(DecimalType(25, 4)).as("sxy2")).head()
    val n = s.getAs[Long]("n").toDouble
    val sx = s.getAs[java.math.BigDecimal]("sx").doubleValue()
    val sy = s.getAs[java.math.BigDecimal]("sy").doubleValue()
    val sxx2 = s.getAs[java.math.BigDecimal]("sxx2").doubleValue()
    val syy2 = s.getAs[java.math.BigDecimal]("syy2").doubleValue()
    val sxy2 = s.getAs[java.math.BigDecimal]("sxy2").doubleValue()
    val nsxx = n * sxx2 - sx * sx
    val nsyy = n * syy2 - sy * sy
    val nsxy = n * sxy2 - sx * sy

    def close(a: Double, b: Double): Unit =
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b))),
        s"$a vs $b")
    close(built.getAs[Double]("slope"), nsxy / nsxx)
    close(built.getAs[Double]("icept"), (sy - (nsxy / nsxx) * sx) / n)
    close(built.getAs[Double]("r2"), (nsxy * nsxy) / (nsxx * nsyy))
    assert(built.getAs[Long]("n").toDouble === n)
    close(built.getAs[Double]("avgx"), sx / n)
    close(built.getAs[Double]("avgy"), sy / n)
    close(built.getAs[Double]("sxx"), nsxx / n)
    close(built.getAs[Double]("syy"), nsyy / n)
    close(built.getAs[Double]("sxy"), nsxy / n)
  }
}
