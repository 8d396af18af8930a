package graft.functions

import graft.SparkSpec

class HiveFunctionsSpec extends SparkSpec {

  private def one[T](sql: String): T = {
    HiveFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql AS v").head().getAs[T]("v")
  }

  test("aliases lcase/ucase/mid") {
    assert(one[String]("lcase('AbC')") === "abc")
    assert(one[String]("ucase('AbC')") === "ABC")
    assert(one[String]("mid('abcdef', 2, 3)") === "bcd")
  }

  test("field returns 1-based position, 0 when absent") {
    assert(one[Int]("field('b', 'a', 'b', 'c')") === 2)
    assert(one[Int]("field('z', 'a', 'b', 'c')") === 0)
  }

  test("quote escapes single quotes") {
    assert(one[String]("quote(\"don't\")") === "'don\\'t'")
  }

  test("istrue family is null-safe") {
    assert(one[Boolean]("istrue(1 = 1)"))
    assert(!one[Boolean]("istrue(CAST(NULL AS BOOLEAN))"))
    assert(one[Boolean]("isnottrue(CAST(NULL AS BOOLEAN))"))
    assert(one[Boolean]("isfalse(1 = 2)"))
    assert(one[Boolean]("isnotfalse(CAST(NULL AS BOOLEAN))"))
  }

  test("likeany / likeall") {
    assert(one[Boolean]("likeany('foobar', '%foo%', '%zzz%')"))
    assert(!one[Boolean]("likeall('foobar', '%foo%', '%zzz%')"))
    assert(one[Boolean]("likeall('foobar', '%foo%', '%bar%')"))
  }

  test("to_epoch_milli") {
    assert(one[Long]("to_epoch_milli(TIMESTAMP '1970-01-01 00:00:01')") === 1000L)
  }

  test("floor_ date truncations") {
    assert(one[java.sql.Timestamp]("floor_year(TIMESTAMP '1999-07-03 12:34:56')")
      .toString === "1999-01-01 00:00:00.0")
    assert(one[java.sql.Timestamp]("floor_hour(TIMESTAMP '1999-07-03 12:34:56')")
      .toString === "1999-07-03 12:00:00.0")
  }

  test("tumbling_window returns the window start") {
    assert(one[java.sql.Timestamp](
      "tumbling_window(TIMESTAMP '2024-01-01 10:47:00', INTERVAL 30 MINUTES)")
      .toString === "2024-01-01 10:30:00.0")
  }

  test("nvl2") {
    assert(one[String]("nvl2('x', 'notnull', 'null')") === "notnull")
    assert(one[String]("nvl2(CAST(NULL AS STRING), 'notnull', 'null')") === "null")
  }
}
