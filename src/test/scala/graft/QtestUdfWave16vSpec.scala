package graft

/** Conformance wave 16v: the numbered udf1..udf9 corpus files — the
  * oldest Hive function-semantics transcripts, rich in domain-edge pins
  * (ref ql/src/test/queries/clientpositive/udf{1..9}.q, udf_like.q;
  * expected cells from results/clientpositive/llap). This wave surfaced
  * and pins three engine fixes: Hive sqrt(<0) answers NULL not NaN
  * (UDFSqrt.java:45), 2-arg log NULLs any base <= 1 (UDFLog.java:81),
  * and RLIKE/REGEXP with an EMPTY pattern answers FALSE not TRUE
  * (GenericUDFRegExp.java:126 — plans/HiveRegex + the registry
  * spellings).
  */
class QtestUdfWave16vSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("udf1.q", "v01",
      "SELECT 'a' LIKE '%a%' AS c1, 'b' LIKE '%a%' AS c2, " +
        "'ab' LIKE '%a%' AS c3, 'ab' LIKE '%a_' AS c4, " +
        "'%_' LIKE '\\%\\_' AS c5, 'ab' LIKE '\\%\\_' AS c6, " +
        "'ab' LIKE '_a%' AS c7, 'ab' LIKE 'a' AS c8, " +
        "'' RLIKE '.*' AS c9, 'a' RLIKE '[ab]' AS c10, " +
        "'' RLIKE '[ab]' AS c11, 'hadoop' RLIKE '[a-z]*' AS c12, " +
        "'hadoop' RLIKE 'o*' AS c13, " +
        "REGEXP_REPLACE('abc', 'b', 'c') AS c14, " +
        "REGEXP_REPLACE('abc', 'z', 'a') AS c15, " +
        "REGEXP_REPLACE('abbbb', 'bb', 'b') AS c16, " +
        "REGEXP_REPLACE('hadoop', '(.)[a-z]*', '$1ive') AS c17, " +
        "REGEXP_REPLACE('hadoopAAA', 'A.*', '') AS c18, " +
        "REGEXP_REPLACE('abc', '', 'A') AS c19, 'abc' RLIKE '' AS c20",
      duck = Some(""),
      hive = Some(Seq("true", "false", "true", "true", "true", "false",
        "false", "false", "true", "true", "false", "true", "true",
        "acc", "abc", "abb", "hive", "hadoop", "AaAbAcA", "false")),
      note = "LIKE backslash escapes, find()-style RLIKE, and the " +
        "empty-pattern pins: regexp_replace('', ...) interleaves, " +
        "RLIKE '' answers FALSE (GenericUDFRegExp.java:126)"),
    QCase("udf2.q", "v02",
      "SELECT '|' AS c1, trim('  abc  ') AS c2, '|' AS c3, " +
        "rtrim('  abc  ') AS c4, '|' AS c5, ltrim('  abc  ') AS c6, " +
        "'|' AS c7",
      duck = Some(""),
      hive = Some(Seq("|", "abc", "|", "  abc", "|", "abc  ", "|"))),
    QCase("udf3.q", "v03",
      "SELECT count(CAST('' AS INT)) AS c1, sum(CAST('' AS INT)) AS " +
        "c2, avg(CAST('' AS INT)) AS c3, min(CAST('' AS INT)) AS c4, " +
        "max(CAST('' AS INT)) AS c5 FROM qt_src",
      duck = Some(""),
      hive = Some(Seq("0", "NULL", "NULL", "NULL", "NULL")),
      note = "aggregates over an all-NULL expression: count answers 0, " +
        "the value aggregates answer NULL ('' casts to NULL int in " +
        "Hive's lenient mode = non-ANSI Spark)"),
    QCase("udf4.q", "v04",
      "SELECT round(1.0) AS c1, round(1.5) AS c2, round(-1.5) AS c3, " +
        "floor(1.0) AS c4, floor(1.5) AS c5, floor(-1.5) AS c6, " +
        "sqrt(1.0) AS c7, sqrt(-1.0) AS c8, sqrt(0.0) AS c9, " +
        "ceil(1.0) AS c10, ceil(1.5) AS c11, ceil(-1.5) AS c12, " +
        "ceiling(1.0) AS c13, 3 AS c14, -3 AS c15, 1++2 AS c16, " +
        "1+-2 AS c17, ~1 AS c18, ~CAST(1 AS TINYINT) AS c19, " +
        "~CAST(1 AS SMALLINT) AS c20, ~CAST(1 AS BIGINT) AS c21, " +
        "CAST(1 AS TINYINT) & CAST(2 AS TINYINT) AS c22, " +
        "1 & 2 AS c23, CAST(1 AS BIGINT) & CAST(2 AS BIGINT) AS c24, " +
        "CAST(1 AS TINYINT) | CAST(2 AS TINYINT) AS c25, " +
        "1 | 2 AS c26, CAST(1 AS BIGINT) | CAST(2 AS BIGINT) AS c27, " +
        "CAST(1 AS TINYINT) ^ CAST(3 AS TINYINT) AS c28, " +
        "1 ^ 3 AS c29, CAST(1 AS BIGINT) ^ CAST(3 AS BIGINT) AS c30",
      duck = Some(""),
      hive = Some(Seq("1", "2", "-2", "1", "1", "-2", "1", "NULL",
        "0", "1", "2", "-1", "1", "3", "-3", "3", "-1", "-2", "-2",
        "-2", "-2", "0", "0", "0", "3", "3", "3", "2", "2", "2")),
      note = "round half-away-from-zero, unary-sign chains (1++2), " +
        "bitwise ops across widths, and the sqrt(-1) NULL pin " +
        "(UDFSqrt.java:45 — Spark's Sqrt answers NaN; rand(3) is " +
        "skipped: Hive re-seeds java.util.Random per split)"),
    QCase("udf5.q", "v05",
      "SELECT from_unixtime(1226446340) AS c1, " +
        "to_date(from_unixtime(1226446340)) AS c2, " +
        "day('2008-11-01') AS c3, month('2008-11-01') AS c4, " +
        "year('2008-11-01') AS c5, day('2008-11-01 15:32:20') AS c6, " +
        "from_unixtime(unix_timestamp('2010-01-13 11:57:40', " +
        "'yyyy-MM-dd HH:mm:ss'), 'MM/dd/yy HH:mm:ss') AS c7, " +
        "from_unixtime(unix_timestamp('2010-01-13 11:57:40', " +
        "'yyyy-MM-dd HH:mm:ss'), 'MM/dd/uu HH:mm:ss') AS c8, " +
        "from_unixtime(unix_timestamp('2010-01-13 11:57:40'), 'EEEE') " +
        "AS c9, from_unixtime(to_unix_timestamp(cast('2021-01-01' as " +
        "date))) AS c10, from_unixtime(to_unix_timestamp(" +
        "cast('1400-01-01' as date))) AS c11, from_unixtime(" +
        "to_unix_timestamp(cast('1800-01-01' as date))) AS c12",
      duck = Some(""),
      hive = Some(Seq("2008-11-11 23:32:20", "2008-11-11", "1", "11",
        "2008", "1", "01/13/10 11:57:40", "01/13/10 11:57:40",
        "Wednesday", "2021-01-01 00:00:00", "1400-01-01 00:00:00",
        "1800-01-01 00:00:00")),
      note = "from_unixtime/unix_timestamp round trips; the reference " +
        "transcript runs US/Pacific (15:32:20) — c1/c2 adapted to this " +
        "engine's pinned UTC session (23:32:20 same instant); the " +
        "date round-trips incl. proleptic 1400/1800 are zone-invariant"),
    QCase("udf6.q", "v06",
      "SELECT IF(TRUE, 1, 2) AS c1, IF(FALSE, 1, 2) AS c2, " +
        "IF(NULL, 1, 2) AS c3, IF(TRUE, 'a', 'b') AS c4, " +
        "IF(TRUE, 0.1, 0.2) AS c5, " +
        "IF(FALSE, CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS c6, " +
        "IF(FALSE, CAST(127 AS TINYINT), CAST(126 AS TINYINT)) AS c7, " +
        "IF(FALSE, CAST(127 AS SMALLINT), CAST(128 AS SMALLINT)) AS " +
        "c8, CAST(128 AS INT) AS c9, CAST(1.0 AS DOUBLE) AS c10, " +
        "CAST('128' AS STRING) AS c11",
      duck = Some(""),
      hive = Some(Seq("1", "2", "2", "a", "0.1", "2", "126", "128",
        "128", "1", "128")),
      note = "IF branch-type coercions: NULL condition takes the else " +
        "branch; tinyint/smallint branches keep their width"),
    QCase("udf7.q", "v07",
      "SELECT ROUND(LN(3.0),12) AS c1, LN(0.0) AS c2, LN(-1) AS c3, " +
        "ROUND(LOG(3.0),12) AS c4, LOG(0.0) AS c5, LOG(-1) AS c6, " +
        "ROUND(LOG2(3.0),12) AS c7, LOG2(0.0) AS c8, LOG2(-1) AS c9, " +
        "ROUND(LOG10(3.0),12) AS c10, LOG10(0.0) AS c11, LOG10(-1) " +
        "AS c12, ROUND(LOG(2, 3.0),12) AS c13, LOG(2, 0.0) AS c14, " +
        "LOG(2, -1) AS c15, LOG(0.5, 2) AS c16, LOG(2, 0.5) AS c17, " +
        "ROUND(EXP(2.0),12) AS c18, POW(2,3) AS c19, POWER(2,3) AS " +
        "c20, POWER(2,-3) AS c21, POWER(0.5, -3) AS c22, " +
        "POWER(4, 0.5) AS c23, POWER(-1, 0.5) AS c24, " +
        "POWER(-1, 2) AS c25, " +
        "POWER(CAST(1 AS DECIMAL), CAST(0 AS INT)) AS c26, " +
        "POWER(CAST(2 AS DECIMAL), CAST(3 AS INT)) AS c27, " +
        "POW(CAST(2 AS DECIMAL), CAST(3 AS INT)) AS c28",
      duck = Some(""),
      hive = Some(Seq("1.098612288668", "NULL", "NULL",
        "1.098612288668", "NULL", "NULL", "1.584962500721", "NULL",
        "NULL", "0.47712125472", "NULL", "NULL", "1.584962500721",
        "NULL", "NULL", "NULL", "-1", "7.389056098931", "8", "8",
        "0.125", "8", "2", "NaN", "1", "1", "8", "8")),
      note = "log-family domain edges all answer NULL — including the " +
        "LOG(0.5, 2) base<=1 pin (UDFLog.java:81) that stock Spark " +
        "computes as -1.0; POWER(-1, 0.5) stays NaN (Java pow)"),
    QCase("udf8.q", "v08",
      "SELECT avg(c1) AS a, sum(c1) AS b, count(c1) AS c FROM " +
        "(SELECT '1' AS c1) t",
      duck = Some(""),
      hive = Some(Seq("1", "1", "1")),
      note = "string-typed numeric aggregation coerces to double"),
    QCase("udf9.q", "v09",
      "SELECT DATEDIFF('2008-12-31', '2009-01-01') AS c1, " +
        "DATEDIFF('2008-03-01', '2008-02-28') AS c2, " +
        "DATEDIFF('2007-03-01', '2007-01-28') AS c3, " +
        "DATEDIFF('2008-03-01 23:59:59', '2008-03-02 00:00:00') AS " +
        "c4, DATE_ADD('2008-12-31', 1) AS c5, " +
        "DATE_ADD('2008-12-31', 365) AS c6, " +
        "DATE_ADD('2008-02-28', 2) AS c7, " +
        "DATE_ADD('2009-02-28', 2) AS c8, " +
        "DATE_ADD('2007-02-28', 365) AS c9, " +
        "DATE_ADD('2007-02-28 23:59:59', 730) AS c10, " +
        "DATE_SUB('2009-01-01', 1) AS c11, " +
        "DATE_SUB('2009-01-01', 365) AS c12, " +
        "DATE_SUB('2008-03-01', 2) AS c13, " +
        "DATE_SUB('2009-03-01', 2) AS c14, " +
        "DATE_SUB('2007-02-28', 365) AS c15, " +
        "DATE_SUB('2007-02-28 01:12:34', 730) AS c16",
      duck = Some(""),
      hive = Some(Seq("-1", "2", "32", "-1", "2009-01-01",
        "2009-12-31", "2008-03-01", "2009-03-02", "2008-02-28",
        "2009-02-27", "2008-12-31", "2008-01-02", "2008-02-28",
        "2009-02-27", "2006-02-28", "2005-02-28")),
      note = "datediff truncates timestamps to dates (23:59:59 vs " +
        "next midnight = -1 day); date_add over leap boundaries"),
    QCase("udf_like.q", "v10",
      "SELECT '_%_' LIKE '%\\_\\%\\_%' AS c1, " +
        "'__' LIKE '%\\_\\%\\_%' AS c2, " +
        "'%%_%_' LIKE '%\\_\\%\\_%' AS c3, " +
        "'%_%_%' LIKE '%\\%\\_\\%' AS c4, " +
        "'_%_' LIKE '\\%\\_%' AS c5, '%__' LIKE '__\\%%' AS c6, " +
        "'_%' LIKE '\\_\\%\\_\\%%' AS c7, '_%' LIKE '\\_\\%_%' AS " +
        "c8, '%_' LIKE '\\%\\_' AS c9, 'ab' LIKE '\\%\\_' AS c10, " +
        "'ab' LIKE '_a%' AS c11, 'ab' LIKE 'a' AS c12, " +
        "'ab' LIKE '' AS c13, '' LIKE '' AS c14",
      duck = Some(""),
      hive = Some(Seq("true", "false", "true", "true", "false",
        "false", "false", "false", "true", "false", "false", "false",
        "false", "true")),
      note = "escaped-wildcard LIKE matrix; the empty pattern matches " +
        "only the empty string"),
    QCase("udf_like.q", "v11",
      "SELECT '1+2' LIKE '_+_' AS c1, '1+2' LIKE '1+_' AS c2, " +
        "'112' LIKE '1+_' AS c3, '|||' LIKE '|_|' AS c4, " +
        "'+++' LIKE '1+_' AS c5",
      duck = Some(""),
      hive = Some(Seq("true", "true", "false", "true", "false")),
      note = "regex metacharacters are LITERAL in LIKE patterns"))

  test("qtest conformance wave 16v: udf1-udf9 + udf_like (sqrt/log " +
      "domain NULLs, empty-pattern RLIKE, LIKE escapes, IF coercion, " +
      "datediff truncation)") {
    run("udf1", "udf2", "udf3", "udf4", "udf5", "udf6", "udf7",
      "udf8", "udf9", "udf_like")
  }
}
