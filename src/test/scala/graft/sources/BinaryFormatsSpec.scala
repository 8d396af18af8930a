package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** From-scratch binary SerDe decoders: Teradata "binary indicators" layout
  * and protobuf wire format — byte-level round trips, null/padding
  * semantics, forward-compat skipping, and the distributed read path.
  */
class BinaryFormatsSpec extends SparkSpec with Matchers {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val tdFields = Seq(
    "b" -> "byteint", "s" -> "smallint", "i" -> "int", "l" -> "bigint",
    "d" -> "double", "dt" -> "date", "ts" -> "timestamp(6)",
    "v" -> "varchar", "c" -> "char(4)", "dec" -> "decimal(12,2)")

  private val tdRows = Seq(
    Row(1.toByte, 2.toShort, 3, 4L, 5.5,
      java.sql.Date.valueOf("1911-11-11"),
      java.sql.Timestamp.valueOf("1911-11-11 19:20:21.433200"),
      "hello", "ab  ", new java.math.BigDecimal("12345.67")),
    Row(null, null, null, null, null, null, null, null, null, null),
    Row((-7).toByte, (-2).toShort, -3, -4L, -5.5,
      java.sql.Date.valueOf("2024-02-29"),
      java.sql.Timestamp.valueOf("2024-02-29 00:00:00"),
      "tab\tand|pipe", "x   ", new java.math.BigDecimal("-99.01")))

  test("teradata binary: byte-level round trip with nulls and negatives") {
    val bytes = BinaryFormats.encodeTeradata(tdRows.iterator, tdFields)
    // framing: every record ends with 0x0a and a 2-byte LE length leads
    assert(bytes.last === 0x0a)
    val got = BinaryFormats.decodeTeradata(bytes, tdFields).toSeq
    got should have size 3
    got.zip(tdRows).foreach { case (g, e) =>
      g.toSeq.zip(e.toSeq).zipWithIndex.foreach { case ((gv, ev), i) =>
        assert(gv === ev, s"col ${tdFields(i)._1}")
      }
    }
  }

  test("teradata binary: null fields still occupy their width (bitmap-driven)") {
    val f = Seq("a" -> "int", "v" -> "varchar", "z" -> "int")
    val bytes = BinaryFormats.encodeTeradata(
      Iterator(Row(null, null, 9)), f)
    val got = BinaryFormats.decodeTeradata(bytes, f).toSeq.head
    assert(got.get(0) === null && got.get(1) === null && got.getInt(2) === 9)
  }

  test("teradata binary: an overflowing timestamp cannot shift later fields") {
    // Timestamp.toString emits a 5-digit year past 9999 — the field is a
    // FIXED width on the wire, so the writer must clamp to tsWidth or
    // every later field in the record (and the records after it) shifts
    val f = Seq("ts" -> "timestamp", "tail" -> "int")
    val far = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(10000, 1, 2, 3, 4, 5))
    val ok = java.sql.Timestamp.valueOf("2024-05-06 07:08:09")
    val bytes = BinaryFormats.encodeTeradata(
      Iterator(Row(far, 11), Row(ok, 22)), f)
    val got = BinaryFormats.decodeTeradata(bytes, f).toSeq
    got should have size 2
    // framing survived: the trailing int of BOTH records reads intact,
    // and the well-formed second record round-trips exactly
    assert(got(0).getInt(1) === 11)
    assert(got(1).get(0) === ok && got(1).getInt(1) === 22)
  }

  test("teradata binary: distributed write + read through Spark") {
    import spark.implicits._
    val dir = tmp("td_rt_")
    val df = spark.range(0, 1000, 1, 4).select(
      $"id".as("l"),
      ($"id" % 127).cast("int").as("i"),
      concat(lit("name"), $"id").as("v"))
    val f = Seq("l" -> "bigint", "i" -> "int", "v" -> "varchar")
    BinaryFormats.writeTeradataBinary(df, f, dir)
    val back = BinaryFormats.readTeradataBinary(spark, dir, f)
    assert(back.count() === 1000)
    assert(back.agg(sum_distinct($"l")).head.getLong(0) === (0L until 1000L).sum)
    assert(back.filter($"v" === "name7").count() === 1)
    // schema carries real types, not strings
    assert(back.schema.map(_.dataType.typeName) ===
      Seq("long", "integer", "string"))
  }

  private val pbFields = Seq(
    BinaryFormats.ProtoField(1, "id", "int64"),
    BinaryFormats.ProtoField(2, "name", "string"),
    BinaryFormats.ProtoField(3, "score", "double"),
    BinaryFormats.ProtoField(4, "flag", "bool"),
    BinaryFormats.ProtoField(5, "delta", "sint64"),
    BinaryFormats.ProtoField(6, "votes", "array<int32>"),
    BinaryFormats.ProtoField(7, "tags", "array<string>"))

  private val pbRows = Seq(
    Row(42L, "alpha", 1.5, true, -3L, Seq(1, 2, 300), Seq("x", "y")),
    Row(7L, "", 0.0, false, 0L, Seq.empty[Int], null),
    Row(Long.MaxValue, "utf8 ✓", -2.25, true, Long.MinValue / 2, null, Seq("solo")))

  test("protobuf: byte-level round trip incl. zigzag, packed + unpacked repeated") {
    val bytes = BinaryFormats.encodeProtoDelimited(pbRows.iterator, pbFields)
    val got = BinaryFormats.decodeProtoDelimited(bytes, pbFields).toSeq
    got should have size 3
    assert(got(0).getLong(0) === 42L)
    assert(got(0).getString(1) === "alpha")
    assert(got(0).getDouble(2) === 1.5)
    assert(got(0).getBoolean(3) === true)
    assert(got(0).getLong(4) === -3L)
    assert(got(0).getSeq[Int](5) === Seq(1, 2, 300))
    assert(got(0).getSeq[String](6) === Seq("x", "y"))
    assert(got(2).getLong(0) === Long.MaxValue)
    assert(got(2).getString(1) === "utf8 ✓")
    assert(got(2).getLong(4) === Long.MinValue / 2)
    assert(got(2).getSeq[String](6) === Seq("solo"))
  }

  test("protobuf: a truncated stream raises — never a zero-padded fabricated row") {
    val bytes = BinaryFormats.encodeProtoDelimited(pbRows.iterator, pbFields)
    // chop mid-final-message: decode must fail loud (same corruption stance
    // as the Teradata torn-record requires), not emit a partial row
    val torn = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 3)
    val e = intercept[IllegalArgumentException] {
      BinaryFormats.decodeProtoDelimited(torn, pbFields).toSeq
    }
    assert(e.getMessage.contains("torn"))
  }

  test("protobuf: absent fields read NULL; unknown fields skip by wire type") {
    // encode with the FULL spec, decode with a NARROWER one (unknown
    // numbers 3,4,5,6,7 must skip cleanly — forward compatibility), and a
    // WIDER one (number 9 never written -> NULL)
    val bytes = BinaryFormats.encodeProtoDelimited(pbRows.iterator, pbFields)
    val narrow = Seq(
      BinaryFormats.ProtoField(2, "name", "string"),
      BinaryFormats.ProtoField(1, "id", "int64"))
    val n = BinaryFormats.decodeProtoDelimited(bytes, narrow).toSeq
    assert(n.map(r => (r.getString(0), r.getLong(1))) ===
      Seq(("alpha", 42L), ("", 7L), ("utf8 ✓", Long.MaxValue)))
    val wide = pbFields :+ BinaryFormats.ProtoField(9, "missing", "string")
    val w = BinaryFormats.decodeProtoDelimited(bytes, wide).toSeq
    assert(w.forall(_.get(7) == null))
  }

  test("protobuf: nested messages decode as structs, repeated messages as arrays") {
    import BinaryFormats.ProtoField
    val addr = Seq(
      ProtoField(1, "city", "string"),
      ProtoField(2, "zip", "int32"))
    val spec = Seq(
      ProtoField(1, "id", "int64"),
      ProtoField(2, "home", "message", nested = addr),
      ProtoField(3, "offices", "array<message>", nested = addr))
    val rows = Seq(
      Row(1L, Row("berlin", 10115),
        Seq(Row("nyc", 10001), Row("sf", 94103))),
      Row(2L, null, null))
    val bytes = BinaryFormats.encodeProtoDelimited(rows.iterator, spec)
    val got = BinaryFormats.decodeProtoDelimited(bytes, spec).toSeq
    assert(got(0).getLong(0) === 1L)
    assert(got(0).getStruct(1).getString(0) === "berlin")
    assert(got(0).getStruct(1).getInt(1) === 10115)
    assert(got(0).getSeq[Row](2).map(r => (r.getString(0), r.getInt(1))) ===
      Seq(("nyc", 10001), ("sf", 94103)))
    assert(got(1).get(1) == null && got(1).get(2) == null)
    // and through the Spark read path with a real nested schema
    val dir = tmp("pb_nested_")
    val p = new java.io.FileOutputStream(dir + "/one.bin")
    try p.write(bytes) finally p.close()
    val df = BinaryFormats.readProtobuf(spark, dir, spec)
    assert(df.schema.fields(1).dataType.typeName === "struct")
    assert(df.schema.fields(2).dataType.typeName === "array")
    assert(df.selectExpr("home.city").collect().map(_.getString(0)).toSet ===
      Set("berlin", null))
    assert(df.selectExpr("size(offices)").where("id = 1")
      .head.getInt(0) === 2)
  }

  test("randomized codec net: seeded fuzz round trips for both wire formats") {
    val rnd = new scala.util.Random(20260814L)
    def randString(): String = {
      // whole codepoints only (indexing a String would split the emoji's
      // surrogate pair — a lone surrogate is not UTF-8-encodable)
      val pool = Seq("a", "b", "\t", "\n", "|", "\\", "\"", "'", " ",
        "\u0000", "é", "✓", "😀", "x", "0")
      (0 until rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    // --- Teradata: every type, adversarial values, random nulls ---------
    val tdF = Seq("b" -> "byteint", "s" -> "smallint", "i" -> "int",
      "l" -> "bigint", "d" -> "double", "dt" -> "date", "ts" -> "timestamp(3)",
      "v" -> "varchar", "c" -> "char(6)", "dec" -> "decimal(18,4)")
    val tdRows = (0 until 200).map { _ =>
      def n[T](v: => T): Any = if (rnd.nextInt(5) == 0) null else v
      Row(
        n(rnd.nextInt().toByte), n(rnd.nextInt().toShort), n(rnd.nextInt()),
        n(rnd.nextLong()),
        n(java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case x if x.isNaN || x.isInfinite => rnd.nextDouble() * 1e12
          case x => x
        }),
        n(java.sql.Date.valueOf(s"${1970 + rnd.nextInt(100)}-" +
          f"${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d")),
        n(java.sql.Timestamp.valueOf(
          f"${1970 + rnd.nextInt(80)}-${1 + rnd.nextInt(12)}%02d-" +
            f"${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:" +
            f"${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d.${rnd.nextInt(1000)}%03d")),
        n(randString()),
        // char(6) is a fixed BYTE width: ASCII values round-trip exactly
        // (multi-byte values truncate at the byte boundary by contract)
        n((0 until rnd.nextInt(7)).map(_ =>
          ('a' + rnd.nextInt(26)).toChar).mkString),
        n(new java.math.BigDecimal(BigInt(rnd.nextLong() % 1000000000L)
          .bigInteger, 4)))
    }
    val tdBytes = BinaryFormats.encodeTeradata(tdRows.iterator, tdF)
    val tdBack = BinaryFormats.decodeTeradata(tdBytes, tdF).toSeq
    tdBack.zip(tdRows).zipWithIndex.foreach { case ((g, e), r) =>
      tdF.indices.foreach { i =>
        val (gv, ev) = (g.get(i), e.get(i))
        val expected = (tdF(i)._2, ev) match {
          // char(N) round-trips space-padded to width (CHAR semantics)
          case ("char(6)", s: String) => s.padTo(6, ' ')
          case _ => ev
        }
        assert(gv === expected, s"row $r col ${tdF(i)._1}")
      }
    }
    // --- protobuf: scalars + repeated, adversarial strings, nulls -------
    import BinaryFormats.ProtoField
    val pbF = Seq(ProtoField(1, "a", "int64"), ProtoField(2, "b", "sint64"),
      ProtoField(3, "c", "string"), ProtoField(4, "d", "double"),
      ProtoField(5, "e", "bool"), ProtoField(6, "f", "array<sint32>"),
      ProtoField(7, "g", "array<string>"))
    val pbRows2 = (0 until 200).map { _ =>
      def n[T](v: => T): Any = if (rnd.nextInt(5) == 0) null else v
      Row(n(rnd.nextLong()), n(rnd.nextLong()), n(randString()),
        n(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)),
        n(rnd.nextBoolean()),
        n((0 until rnd.nextInt(5)).map(_ => rnd.nextInt())),
        n((0 until rnd.nextInt(4)).map(_ => randString())))
    }
    val pbBytes = BinaryFormats.encodeProtoDelimited(pbRows2.iterator, pbF)
    val pbBack = BinaryFormats.decodeProtoDelimited(pbBytes, pbF).toSeq
    pbBack.zip(pbRows2).zipWithIndex.foreach { case ((g, e), r) =>
      pbF.indices.foreach { i =>
        val ev = e.get(i) match {
          // proto3 semantics: an EMPTY repeated field is indistinguishable
          // from an absent one on the wire — decodes as null
          case s: scala.collection.Seq[_] if s.isEmpty => null
          case v => v
        }
        assert(g.get(i) === ev, s"row $r col ${pbF(i).name}")
      }
    }
  }

  test("protobuf: SequenceFile container round trip (the reference's framing)") {
    import spark.implicits._
    val dir = tmp("pb_seq_") + "/data"
    val f = Seq(
      BinaryFormats.ProtoField(1, "id", "int64"),
      BinaryFormats.ProtoField(2, "name", "string"))
    val df = spark.range(0, 300, 1, 3)
      .select($"id", concat(lit("m"), $"id").as("name"))
    BinaryFormats.writeProtobufSequenceFile(df, f, dir)
    val back = BinaryFormats.readProtobufSequenceFile(spark, dir, f)
    assert(back.count() === 300)
    assert(back.filter($"name" === "m42").head.getLong(0) === 42L)
    // it is a REAL SequenceFile (magic header), not a private framing
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.find(_.getFileName.toString.startsWith("part-")).get
    val head = java.nio.file.Files.readAllBytes(part).take(3)
    assert(new String(head, "US-ASCII") === "SEQ")
  }

  test("protobuf: distributed write + read through Spark") {
    import spark.implicits._
    val dir = tmp("pb_rt_")
    val df = spark.range(0, 500, 1, 4).select(
      $"id".as("id"), concat(lit("doc"), $"id").as("name"),
      ($"id" * 1.5).as("score"))
    val f = Seq(
      BinaryFormats.ProtoField(1, "id", "int64"),
      BinaryFormats.ProtoField(2, "name", "string"),
      BinaryFormats.ProtoField(3, "score", "double"))
    BinaryFormats.writeProtobuf(df, f, dir)
    val back = BinaryFormats.readProtobuf(spark, dir, f)
    assert(back.count() === 500)
    assert(back.filter($"name" === "doc9").select($"score").head.getDouble(0) === 13.5)
  }
}
