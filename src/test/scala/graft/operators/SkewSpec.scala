package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin returns the same rows as a plain join") {
    import spark.implicits._
    val li = Engine.table(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
    val o = Engine.table(spark, sfDir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 8).count()
    assert(salted === plain)
  }

  test("saltedCountSum equals the direct aggregation") {
    import spark.implicits._
    val li = Engine.table(spark, sfDir, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("total"))
      .orderBy($"l_returnflag").collect()
    val salted = Skew.saltedCountSum(li, "l_returnflag", "l_quantity", salts = 8)
      .orderBy($"l_returnflag").collect()
    assert(direct.map(_.getLong(1)).toSeq === salted.map(_.getLong(1)).toSeq)
    assert(direct.map(r => math.round(r.getDouble(2))).toSeq ===
      salted.map(r => math.round(r.getDouble(2))).toSeq)
  }

  test("keySkewProfile surfaces dominant keys") {
    import spark.implicits._
    val p = Skew.keySkewProfile(Engine.table(spark, sfDir, "lineitem"), "l_returnflag", 5)
    val rows = p.collect()
    assert(rows.length === 3)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
  }
}
