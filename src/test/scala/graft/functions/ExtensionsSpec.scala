package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

class ExtensionsSpec extends SparkSpec {

  test("scalar UDF extension point") {
    Extensions.registerScalar[String, Int](spark, "my_len2", s => s.length * 2)
    assert(spark.sql("SELECT my_len2('abc') AS v").head().getInt(0) === 6)
  }

  test("Aggregator extension point (Hive UDAF evaluator contract)") {
    // geometric-mean-ish: product via sum of logs — zero/reduce/merge/finish
    val agg = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), x: Double) = (b._1 + math.log(x), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)) = (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)) = math.exp(b._1 / math.max(1, b._2))
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
        Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    Extensions.registerAggregator(spark, "geo_mean", agg)(Encoders.scalaDouble)
    graft.Engine.register(spark, sfDir)
    val gm = spark.sql("SELECT geo_mean(l_quantity) AS v FROM lineitem")
      .head().getDouble(0)
    assert(gm > 1.0 && gm < 50.0)
  }

  test("Generator extension point (Hive UDTF contract)") {
    Extensions.registerGenerator(spark, "my_replicate", args => ReplicateRows(args))
    val n = spark.sql(
      """SELECT t.* FROM (SELECT 2L AS n, 'v' AS s)
        |LATERAL VIEW my_replicate(n, s) t AS s2""".stripMargin).count()
    assert(n === 2)
  }

  test("misc crypto/encoding builtins behave") {
    def one[T](q: String): T = spark.sql(s"SELECT $q AS v").head().getAs[T]("v")
    assert(one[Long]("crc32(CAST('abc' AS BINARY))") === 891568578L)
    assert(one[String]("sha1('abc')") === "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one[String]("CAST(aes_decrypt(aes_encrypt('secret', '1234567890123456'), " +
      "'1234567890123456') AS STRING)") === "secret")
    assert(one[String]("hex(unhex('4A'))") === "4A")
    assert(one[String]("decode(encode('abc', 'utf-8'), 'utf-8')") === "abc")
    assert(one[Long]("factorial(5)") === 120L)
  }
}
