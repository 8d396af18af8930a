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

  test("mask family") {
    assert(one[String]("mask_first_n('Abcd1234', 4)") === "Xxxx1234")
    assert(one[String]("mask_last_n('Abcd1234', 4)") === "Abcdnnnn")
    assert(one[String]("mask_show_first_n('Abcd1234', 4)") === "Abcdnnnn")
    assert(one[String]("mask_show_last_n('Abcd1234', 4)") === "Xxxx1234")
    assert(one[String]("mask_first_n('Abcd1234')") === "Xxxx1234") // default n=4
    // explicit negative count clamps to 0 (GenericUDFMaskFirstN), it does NOT
    // fall back to the missing-argument default of 4
    assert(one[String]("mask_first_n('Abcd1234', -1)") === "Abcd1234")
    assert(one[String]("mask_last_n('Abcd1234', -5)") === "Abcd1234")
    // mask_hash = sha256 hex (GenericUDFMaskHash / DigestUtils.sha256Hex)
    assert(one[String]("mask_hash('panther')") ===
      one[String]("sha2(CAST('panther' AS BINARY), 256)"))
    // non-literal count is rejected, matching Hive's constant requirement
    intercept[Exception] {
      spark.sql("SELECT mask_first_n('Abcd', CAST(rand()*2 AS INT))").collect()
    }
  }

  test("create_union / extract_union round-trip") {
    HiveFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT create_union(1, CAST(7 AS INT), 'hello') AS u").head().getStruct(0)
    assert(r.getAs[Byte]("tag") === 1.toByte)
    assert(r.isNullAt(r.fieldIndex("field0")))
    assert(r.getAs[String]("field1") === "hello")
    assert(one[String](
      "extract_union(create_union(1, CAST(7 AS INT), 'hello'), 1)") === "hello")
    assert(one[Int](
      "extract_union(create_union(0, CAST(7 AS INT), 'hello'), 0)") === 7)
  }

  test("sort_array_by sorts array<struct> by field") {
    HiveFunctions.registerAll(spark)
    val got = spark.sql(
      """SELECT sort_array_by(array(named_struct('a', 3, 'b', 'z'),
        |  named_struct('a', 1, 'b', 'y'), named_struct('a', 2, 'b', 'x')), 'a')
        |  AS s""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0))
    assert(got === Seq(1, 2, 3))
    val desc = spark.sql(
      """SELECT sort_array_by(array(named_struct('a', 3), named_struct('a', 1),
        |  named_struct('a', 2)), 'a', 'DESC') AS s""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0))
    assert(desc === Seq(3, 2, 1))
  }

  test("parse_url_tuple extracts multiple parts in one pass") {
    HiveFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT t.* FROM (SELECT 'https://user@example.com:8080/a/b?x=1&y=2#frag' AS url)
        |LATERAL VIEW parse_url_tuple(url, 'HOST', 'PATH', 'QUERY', 'PROTOCOL',
        |  'REF', 'QUERY:y') t AS host, path, query, proto, ref, qy""".stripMargin).head()
    assert(r.getString(0) === "example.com")
    assert(r.getString(1) === "/a/b")
    assert(r.getString(2) === "x=1&y=2")
    assert(r.getString(3) === "https")
    assert(r.getString(4) === "frag")
    assert(r.getString(5) === "2")
  }

  test("replicate_rows emits n copies") {
    HiveFunctions.registerAll(spark)
    val n = spark.sql(
      """SELECT t.* FROM (SELECT 3L AS n, 'a' AS v)
        |LATERAL VIEW replicate_rows(n, v) t AS v2""".stripMargin).count()
    assert(n === 3)
  }

  test("bloom_filter / in_bloom_filter") {
    HiveFunctions.registerAll(spark)
    graft.Engine.register(spark, sfDir)
    // the filter side must be a constant or scalar subquery (same contract as
    // Spark's native runtime-filter might_contain)
    val hits = spark.sql(
      """SELECT count(*) AS n FROM orders WHERE in_bloom_filter(o_custkey,
        |  (SELECT bloom_filter(c_custkey, 2000, 65536) FROM customer))
        |""".stripMargin).head().getLong(0)
    val total = spark.sql("SELECT count(*) FROM orders").head().getLong(0)
    // every o_custkey is a real customer key -> all rows pass (no false negatives)
    assert(hits === total)
    val misses = spark.sql(
      """SELECT count(*) AS n FROM orders WHERE in_bloom_filter(o_custkey + 10000000,
        |  (SELECT bloom_filter(c_custkey, 2000, 65536) FROM customer))
        |""".stripMargin).head().getLong(0)
    assert(misses < total / 10) // false-positive rate is small
  }

  test("ngrams finds frequent word n-grams") {
    HiveFunctions.registerAll(spark)
    graft.Engine.register(spark, sfDir)
    val top = spark.sql(
      """SELECT ngrams(array(split(text, ' ')), 2, 5, 10) AS g FROM documents""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.length === 5)
    val freqs = top.map(_.getAs[Double]("estfrequency"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    assert(top.head.getAs[Seq[String]]("ngram").length === 2)
  }

  test("context_ngrams fills wildcard slots") {
    HiveFunctions.registerAll(spark)
    val top = spark.sql(
      """SELECT context_ngrams(array(split('the cat sat on the mat the cat ran', ' ')),
        |  array('the', CAST(NULL AS STRING)), 2, 10) AS g""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getAs[Seq[String]]("ngram").head).toSet === Set("cat", "mat"))
    assert(top.find(_.getAs[Seq[String]]("ngram").head == "cat")
      .get.getAs[Double]("estfrequency") === 2.0)
  }

  test("surrogate_key and version") {
    HiveFunctions.registerAll(spark)
    assert(spark.sql("SELECT surrogate_key() AS k, version() AS v").count() === 1)
  }

  test("vector and text-hash kernels are SQL-visible") {
    HiveFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c_same,
        |  vec_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c_orth,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  vec_l2(array(3.0D, 4.0D)) AS n,
        |  int8_cosine(int8_quantize(array(1.0D, 2.0D, 3.0D)),
        |              int8_quantize(array(2.0D, 4.0D, 6.0D))) AS q,
        |  hamming_distance(11L, 8L) AS h,
        |  simhash64(split('a b c a b', ' ')) =
        |    simhash64(split('a b c a b', ' ')) AS sh_stable,
        |  size(minhash_signature(split('one two three four', ' '), 2, 16)) AS mh_len
        |""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("c_same") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("c_orth")) < 1e-12)
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Double]("n") === 5.0)
    assert(math.abs(r.getAs[Double]("q") - 1.0) < 0.01)
    assert(r.getAs[Int]("h") === 2) // 1011 vs 1000
    assert(r.getAs[Boolean]("sh_stable"))
    assert(r.getAs[Int]("mh_len") === 16)
  }
}
