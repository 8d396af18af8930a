package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §1.2 type-system mapping: every Hive type's Spark equivalent
  * round-trips through parquet with values intact (the alltypes fixture shape
  * from FIXTURES.md §B.2, including the uniontype struct encoding).
  */
class TypeSystemSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ctinyint", ByteType),
    StructField("csmallint", ShortType),
    StructField("cint", IntegerType),
    StructField("cbigint", LongType),
    StructField("cfloat", FloatType),
    StructField("cdouble", DoubleType),
    StructField("cstring", StringType),
    StructField("cbool", BooleanType),
    StructField("cdecimal", DecimalType(38, 18)),
    StructField("cdate", DateType),
    StructField("cts", TimestampType),
    StructField("cbinary", BinaryType),
    StructField("carray", ArrayType(IntegerType)),
    StructField("cmap", MapType(StringType, IntegerType)),
    StructField("cstruct", StructType(Seq(
      StructField("f1", IntegerType), StructField("f2", StringType)))),
    // uniontype<int,string> encoding per SURVEY §1.2
    StructField("cunion", StructType(Seq(
      StructField("tag", ByteType), StructField("field0", IntegerType),
      StructField("field1", StringType))))))

  private def mkRows = Seq(
    Row(1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, "s", true,
      BigDecimal("1.123456789012345678"), java.sql.Date.valueOf("2020-02-29"),
      java.sql.Timestamp.valueOf("2020-02-29 23:59:59.123456"),
      Array[Byte](1, 2, 3), Seq(1, 2, 3), Map("a" -> 1, "b" -> 2),
      Row(7, "x"), Row(0.toByte, 42, null)),
    Row(null, null, null, null, null, null, null, null, null, null, null,
      null, null, null, null, Row(1.toByte, null, "u")))

  test("alltypes round-trips through parquet") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(mkRows), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_types_").toString + "/t"
    df.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val rows = back.orderBy(col("ctinyint").asc_nulls_last).collect()
    assert(rows.length === 2)
    val r = rows(0)
    assert(r.getByte(0) === 1.toByte)
    assert(r.getDecimal(8).toPlainString === "1.123456789012345678")
    assert(r.getDate(9).toString === "2020-02-29")
    assert(r.getTimestamp(10).getNanos === 123456000)
    assert(r.getSeq[Int](12) === Seq(1, 2, 3))
    assert(r.getMap[String, Int](13)("b") === 2)
    assert(r.getStruct(14).getString(1) === "x")
    assert(r.getStruct(15).getByte(0) === 0.toByte)
    assert(rows(1).getStruct(15).getString(2) === "u")
  }

  test("char/varchar semantics: pad on write, compare unpadded") {
    Engine.configure(spark)
    spark.sql("DROP TABLE IF EXISTS char_t")
    spark.sql("CREATE TABLE char_t (c CHAR(5), v VARCHAR(3)) USING parquet")
    spark.sql("INSERT INTO char_t VALUES ('ab', 'xyz')")
    val r = spark.sql("SELECT c, length(c) AS lc, v FROM char_t").head()
    assert(r.getString(0) === "ab   ") // CHAR pads to declared length
    assert(r.getInt(1) === 5)
    assert(r.getString(2) === "xyz")
    assert(spark.sql("SELECT count(*) FROM char_t WHERE c = 'ab'").head().getLong(0) === 1)
  }

  test("interval types survive arithmetic") {
    val r = spark.sql(
      """SELECT TIMESTAMP '2020-01-31 00:00:00' + INTERVAL '1' MONTH AS m,
        |  TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '1 02:03:04' DAY TO SECOND AS dts
        |""".stripMargin).head()
    assert(r.getTimestamp(0).toString.startsWith("2020-02-29"))
    assert(r.getTimestamp(1).toString.startsWith("2020-01-02 02:03:04"))
  }

  test("variant-style dynamic JSON access (schema_of_json + from_json)") {
    val r = spark.sql(
      """SELECT from_json('{"a": 1, "b": [1,2]}',
        |  schema_of_json('{"a": 1, "b": [1,2]}')) AS v""".stripMargin).head()
    assert(r.getStruct(0).getLong(0) === 1L)
    assert(r.getStruct(0).getSeq[Long](1) === Seq(1L, 2L))
  }
}
