package graft

class EngineSpec extends SparkSpec {

  test("all testdata tables load with expected row presence") {
    Engine.tableNames.foreach { n =>
      assert(Engine.table(spark, sfDir, n).count() > 0, s"table $n empty")
    }
  }

  test("events ts converts to microsecond timestamps") {
    val df = Engine.table(spark, sfDir, "events")
    assert(df.schema("ts").dataType.typeName === "timestamp")
    assert(df.selectExpr("max(year(ts))").head().getInt(0) === 2024)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query in the catalog has a unique name and runs at sf0.001") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("oracleSql only references declared queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("Engine.sql front door: registrations + tables in one call") {
    val df = Engine.sql(spark, sfDir,
      "SELECT field(r_name, 'AMERICA', 'ASIA') AS f FROM region WHERE r_regionkey = 2")
    assert(df.head().getInt(0) === 2) // engine-registered function over a testdata view
  }
}
