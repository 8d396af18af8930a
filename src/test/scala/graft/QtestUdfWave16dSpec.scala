package graft

/** Conformance wave 16i: xpath typed siblings, sort_array_by,
  * current_database — ref ql/src/test/queries/clientpositive/
  * udf_xpath_boolean.q, udf_xpath_double.q, udf_xpath_string.q,
  * udf_xpath_int.q's long/short cousins, udf_sort_array_by.q,
  * udf_current_database.q (expected cells from
  * results/clientpositive/llap).
  */
class QtestUdfWave16dSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("udf_xpath_boolean.q", "y01",
      "select xpath_boolean('<a><b>b</b></a>', 'a/b') AS a, " +
        "xpath_boolean('<a><b>b</b></a>', 'a/c') AS b, " +
        "xpath_boolean('<a><b>b</b></a>', 'a/b = \"b\"') AS c, " +
        "xpath_boolean('<a><b>10</b></a>', 'a/b < 10') AS d, " +
        "xpath_boolean('<a><b>10</b></a>', 'a/b = 10') AS e",
      duck = Some(""),
      hive = Some(Seq("true", "false", "true", "false", "true"))),

    QCase("udf_xpath_double.q", "y02",
      "select xpath_double('<a>this is not a number</a>', 'a') AS a, " +
        "xpath_double('<a><b>2000000000</b><c>40000000000</c></a>', 'a/b * a/c') AS b, " +
        "xpath_double('<a>try a boolean</a>', 'a = 10') AS c, " +
        "xpath_double('<a><b class=\"odd\">1</b><b class=\"even\">2</b>" +
        "<b class=\"odd\">4</b><c>8</c></a>', 'sum(a/*)') AS d",
      duck = Some(""),
      hive = Some(Seq("NaN", "8.0E19", "0", "15")),
      note = "non-numeric text is NaN (not NULL); node-set arithmetic " +
        "multiplies past int range into double; sum() over children"),

    QCase("udf_xpath_string.q", "y03",
      "select xpath_string('<a><b>bb</b><c>cc</c></a>', 'a') AS a, " +
        "xpath_string('<a><b>bb</b><c>cc</c></a>', 'a/b') AS b, " +
        "xpath_string('<a><b>bb</b><c>cc</c></a>', 'a/d') AS c, " +
        "xpath_string('<a><b>b1</b><b>b2</b></a>', '//b') AS d, " +
        "xpath_string('<a><b>b1</b><b>b2</b></a>', 'a/b[2]') AS e",
      duck = Some(""),
      hive = Some(Seq("bbcc", "bb", "", "b1", "b2")),
      note = "first match wins; no match is the EMPTY string, not NULL"),

    QCase("udf_xpath_long.q", "y04",
      "select xpath_long('<a><b>2000000000</b><c>40000000000</c></a>', " +
        "'a/b * a/c') AS a, " +
        "xpath_short('<a><b>10000</b></a>', 'a/b') AS b, " +
        "xpath_float('<a><b>1.5</b></a>', 'a/b') AS c",
      duck = Some(""),
      hive = Some(Seq("9223372036854775807", "10000", "1.5")),
      note = "long overflow pins to MAX_LONG like the int sibling"),

    // sort_array_by over structs: field-name sort keys, ASC default,
    // case-insensitive direction, multi-key
    QCase("udf_sort_array_by.q", "y05",
      "select cast(sort_array_by(array(" +
        "named_struct('name', 'Ben', 'salary', 21000), " +
        "named_struct('name', 'Aron', 'salary', 50000), " +
        "named_struct('name', 'Keiko', 'salary', 8000)), 'salary') " +
        "as string) AS asc_sort, " +
        "cast(sort_array_by(array(" +
        "named_struct('name', 'Ben', 'salary', 21000), " +
        "named_struct('name', 'Aron', 'salary', 50000), " +
        "named_struct('name', 'Keiko', 'salary', 8000)), 'salary', 'desc') " +
        "as string) AS desc_sort, " +
        "cast(sort_array_by(array(" +
        "named_struct('name', 'Ben', 'salary', 21000), " +
        "named_struct('name', 'Aron', 'salary', 50000), " +
        "named_struct('name', 'Ben', 'salary', 8000)), 'name', 'salary') " +
        "as string) AS multi_sort",
      duck = Some(""),
      hive = Some(Seq(
        """[{"name":"Keiko","salary":8000},{"name":"Ben","salary":21000},{"name":"Aron","salary":50000}]""",
        """[{"name":"Aron","salary":50000},{"name":"Ben","salary":21000},{"name":"Keiko","salary":8000}]""",
        """[{"name":"Aron","salary":50000},{"name":"Ben","salary":8000},{"name":"Ben","salary":21000}]""")),
      note = "struct-array cast renders buildJSONString (matched " +
        "since r17 HiveCastRendering; the earlier pin recorded " +
        "Spark's {v, v} spelling as a known divergence)"),

    QCase("udf_current_database.q", "y06",
      "select current_database() AS db",
      duck = Some(""), hive = Some(Seq("default"))))

  test("qtest conformance: xpath typed siblings, sort_array_by, " +
      "current_database") {
    run("udf_")
  }
}
