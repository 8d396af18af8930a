package graft

/** Conformance wave 16p: udf remainder with semantic teeth — ref
  * ql/src/test/queries/clientpositive/udf_mask_hash.q, udf_json_read.q,
  * udf_octet_length.q, udf_datediff_with_tz.q, udf_in_file.q (expected
  * cells from results/clientpositive/llap).
  */
class QtestUdfWave16pSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("udf_mask_hash.q", "y20",
      "select mask_hash('TestString-123') AS a, " +
        "mask_hash(cast('TestString-123' as varchar(24))) AS b, " +
        "mask_hash(cast(123 as tinyint)) AS c, " +
        "mask_hash(cast(12345 as int)) AS d, " +
        "mask_hash(cast(12345 as bigint)) AS e, " +
        "mask_hash(cast('2016-04-20' as date)) AS f",
      duck = Some(""),
      hive = Some(Seq(
        "8b44d559dc5d60e4453c9b4edf2a455fbce054bb8504cd3eb9b5f391bd239c90",
        "8b44d559dc5d60e4453c9b4edf2a455fbce054bb8504cd3eb9b5f391bd239c90",
        "NULL", "NULL", "NULL", "NULL")),
      note = "mask_hash is sha256 for the STRING family only — numeric " +
        "and date inputs answer NULL (GenericUDFMaskHash's type guard). " +
        "The char(24) leg of the .q hashes the PADDED literal in Hive; " +
        "this engine's cast-to-char keeps the unpadded string (the " +
        "documented char_1 divergence), so it is not pinned here"),
    QCase("udf_json_read.q", "y21",
      "select element_at(j, 1).name AS n1, element_at(j, 1).age AS " +
        "a1, element_at(j, 1).address.city AS c1, element_at(j, 2)" +
        ".name AS n2, element_at(j, 2).age AS a2, element_at(j, 2)" +
        ".alias AS al2, element_at(j, 2).address.city AS c2 from " +
        "(select json_read('[{\"name\":\"john\",\"alias\":\"j\"," +
        "\"address\":{\"city\":\"LA\"}},{\"name\":\"kinga\"," +
        "\"alias\":\"binga\",\"age\":2}]', 'array<struct<name:string," +
        "age:int,alias:string,address:struct<city:string," +
        "street:string>>>') AS j)",
      duck = Some(""),
      hive = Some(Seq("john", "NULL", "LA", "kinga", "2", "binga",
        "NULL")),
      note = "json_read parses a document into the declared Hive type; " +
        "absent fields are NULL, absent nested structs propagate NULL"),
    QCase("udf_octet_length.q", "y22",
      "select octet_length('abc') AS a, octet_length('') AS b, " +
        "octet_length('éé') AS c, " +
        "octet_length(cast(null as string)) AS d",
      duck = Some(""),
      hive = Some(Seq("3", "0", "4", "NULL")),
      note = "octet_length counts UTF-8 BYTES (two per accented char)"),
    QCase("udf_datediff_with_tz.q", "y23",
      "select datediff('2021-07-06', '2021-07-01') AS a, " +
        "datediff('2021-07-01', '2021-07-07') AS b, " +
        "datediff(cast('2021-07-06' as date), cast('2021-07-06' as " +
        "date)) AS c",
      duck = Some(""),
      hive = Some(Seq("5", "-6", "0"))),
    QCase("udf_in_file.q", "y24",
      "select in_file('303', '/root/reference/data/files/test2.dat') " +
        "AS a, in_file('999', '/root/reference/data/files/test2.dat') " +
        "AS b, in_file(cast(null as string), " +
        "'/root/reference/data/files/test2.dat') AS c",
      duck = Some(""),
      hive = Some(Seq("true", "false", "NULL")),
      note = "in_file membership among the file's lines; NULL probe " +
        "answers NULL"))

  test("qtest conformance: mask_hash type guard, json_read, " +
      "octet_length, datediff, in_file") {
    run("udf_mask_hash", "udf_json_read", "udf_octet_length",
      "udf_datediff_with_tz", "udf_in_file")
  }
}
