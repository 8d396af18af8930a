package graft

/** Conformance wave 16h: masks, xpath, LIKE ANY/ALL — ref ql/src/test/
  * queries/clientpositive/udf_mask.q, udf_mask_first_n.q,
  * udf_mask_last_n.q, udf_mask_show_first_n.q, udf_mask_show_last_n.q,
  * udf_xpath.q, udf_xpath_int.q, udf_likeany.q, udf_likeall.q
  * (expected cells from results/clientpositive/llap).
  *
  * Wave finding (fixed in HiveFunctions/MaskExpressions): the
  * mask_*_n family accepts CUSTOM mask characters at positions 2..5
  * (upper, lower, digit, other) — the registrations dropped them.
  */
class QtestUdfWave16cSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    // bare mask with custom chars (the Spark builtin carries Hive's
    // semantics: per-class replacement, 'other' char replaces '-')
    QCase("udf_mask.q", "m01",
      "select mask('TestString-123', 'X', 'x', '0', ':') AS a, " +
        "mask(cast('TestString-123' as varchar(24)), 'X', 'x', '0', ':') AS b",
      duck = Some(""),
      hive = Some(Seq("XxxxXxxxxx:000", "XxxxXxxxxx:000"))),

    QCase("udf_mask_first_n.q", "m02",
      "select mask_first_n('TestString-123', 4, 'X', 'x', '0', ':') AS a, " +
        "mask_first_n('Te5t-9', 4, 'X', 'x', '0', ':') AS b",
      duck = Some(""),
      hive = Some(Seq("XxxxString-123", "Xx0x-9")),
      note = "digit/other custom chars apply INSIDE the masked prefix"),

    QCase("udf_mask_last_n.q", "m03",
      "select mask_last_n('TestString-123', 4, 'X', 'x', '0', ':') AS a",
      duck = Some(""), hive = Some(Seq("TestString:000"))),

    QCase("udf_mask_show_first_n.q", "m04",
      "select mask_show_first_n('TestString-123', 4, 'X', 'x', '0', ':') AS a",
      duck = Some(""), hive = Some(Seq("TestXxxxxx:000"))),

    QCase("udf_mask_show_last_n.q", "m05",
      "select mask_show_last_n('TestString-123', 4, 'X', 'x', '0', ':') AS a",
      duck = Some(""), hive = Some(Seq("XxxxXxxxxx-123"))),

    // xpath list extraction (rendered through cast-to-string)
    QCase("udf_xpath.q", "m06",
      "select cast(xpath('<a><b>b1</b><b>b2</b><b>b3</b><c>c1</c><c>c2</c></a>', 'a/text()') as string) AS a, " +
        "cast(xpath('<a><b>b1</b><b>b2</b><b>b3</b><c>c1</c><c>c2</c></a>', 'a/*/text()') as string) AS b, " +
        "cast(xpath('<a><b>b1</b><b>b2</b><b>b3</b><c>c1</c><c>c2</c></a>', 'a/b/text()') as string) AS c",
      duck = Some(""),
      hive = Some(Seq("[]", """["b1","b2","b3","c1","c2"]""",
        """["b1","b2","b3"]"""))),

    QCase("udf_xpath.q", "m07",
      "select cast(xpath('<a><b class=\"bb\">b1</b><b>b2</b><b>b3</b>" +
        "<c class=\"bb\">c1</c><c>c2</c></a>', " +
        "'a/*[@class=\"bb\"]/text()') as string) AS a",
      duck = Some(""), hive = Some(Seq("""["b1","c1"]""")),
      note = "attribute predicates"),

    // xpath_int coercions: non-numeric -> 0, arithmetic over nodes,
    // int-overflow pins to MAX_INT, boolean result -> 0/1
    QCase("udf_xpath_int.q", "m08",
      "select xpath_int('<a>this is not a number</a>', 'a') AS a, " +
        "xpath_int('<a><b>2000000000</b><c>40000000000</c></a>', 'a/b * a/c') AS b, " +
        "xpath_int('<a>try a boolean</a>', 'a = 10') AS c, " +
        "xpath_int('<a><b class=\"odd\">1</b><b class=\"even\">2</b>" +
        "<b class=\"odd\">4</b><c>8</c></a>', 'a/b') AS d",
      duck = Some(""), hive = Some(Seq("0", "2147483647", "0", "1"))),

    // LIKE ANY / LIKE ALL (native operators + the likeany/likeall names)
    QCase("udf_likeany.q", "m09",
      "select ('abc' like any ('a%','%d','%cd%')) AS a, " +
        "('abc' LIKE ANY ('z%','%y','%dx%')) AS b, " +
        "('abc' like any ('abc')) AS c, " +
        "likeany('abc', 'a%', '%d') AS d",
      duck = Some(""), hive = Some(Seq("true", "false", "true", "true"))),

    QCase("udf_likeall.q", "m10",
      "select ('abc' like all ('a%','%bc%','%c')) AS a, " +
        "('abc' LIKE ALL ('z%','%y','%dx%')) AS b, " +
        "likeall('abc', 'a%', '%c') AS c",
      duck = Some(""), hive = Some(Seq("true", "false", "true"))))

  test("qtest conformance: masks with custom characters, xpath family, " +
      "LIKE ANY/ALL") {
    run("udf_")
  }
}
