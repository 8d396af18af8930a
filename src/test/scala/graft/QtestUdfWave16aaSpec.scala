package graft

/** Conformance wave 16aa: udf corpus remainder with semantic teeth —
  * every count() spelling, the per-type `hash` (= HiveHash) transcript
  * row, inline over a struct array, BINARY comparison predicates, and
  * constant folding through a join (ref ql/src/test/queries/
  * clientpositive/udf_count.q, udf_hash.q, udf_inline.q,
  * udf_in_binary.q, udf_folder_constants.q; expected cells from
  * results/clientpositive/llap).
  */
class QtestUdfWave16aaSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("udf_count.q", "aa01",
      "SELECT count(key) AS c1, count(DISTINCT key) AS c2, " +
        "count(DISTINCT key, value) AS c3, count(*) AS c4, " +
        "count(1) AS c5 FROM qt_src",
      duck = Some("SELECT count(key) AS c1, count(DISTINCT key) AS " +
        "c2, count(DISTINCT (key, value)) AS c3, count(*) AS c4, " +
        "count(1) AS c5 FROM qt_src"),
      note = "multi-argument DISTINCT count (DuckDB spells the pair " +
        "as a row value)"),
    QCase("udf_count.q", "aa02",
      "select count(1) AS c1, count(*) AS c2 from qt_src where false",
      duck = Some(""),
      hive = Some(Seq("0", "0")),
      note = "counts over an empty selection answer 0, not empty"),
    QCase("udf_hash.q", "aa03",
      "SELECT hash(CAST(1 AS TINYINT)) AS c1, hash(CAST(2 AS " +
        "SMALLINT)) AS c2, hash(3) AS c3, hash(CAST('123456789012' " +
        "AS BIGINT)) AS c4, hash(CAST(1.25 AS FLOAT)) AS c5, " +
        "hash(CAST(16.0 AS DOUBLE)) AS c6, hash('400') AS c7, " +
        "hash('abc') AS c8, hash(TRUE) AS c9, hash(FALSE) AS c10, " +
        "hash(1, 2, 3) AS c11",
      duck = Some(""),
      hive = Some(Seq("1", "2", "3", "-1097262584", "1067450368",
        "1076887552", "51508", "96354", "1", "0", "1026")),
      note = "SQL hash is ObjectInspectorUtils.hashCode per type " +
        "(integers identity, long ^-fold, float/double bit patterns, " +
        "string 31x polynomial, multi-arg 31-fold) — the HiveHash " +
        "registration pinned cell-by-cell"),
    QCase("udf_inline.q", "aa04",
      "SELECT inline(ARRAY(STRUCT(1, 'dude!'), STRUCT(2, 'Wheres'), " +
        "STRUCT(3, 'my car?'))) AS (id, text)",
      duck = Some("SELECT * FROM (VALUES (1, 'dude!'), (2, " +
        "'Wheres'), (3, 'my car?')) t(id, text)"),
      note = "inline explodes a struct array into typed columns with " +
        "the AS (cols) rename"),
    QCase("udf_in_binary.q", "aa05",
      "select count(*) AS eq, (select count(*) from (VALUES " +
        "(cast('a' as binary)), (cast('b' as binary)), (cast('c' as " +
        "binary)), (cast(null as binary))) t2(b) where b between " +
        "unhex('61') and unhex('62')) AS btw, (select count(*) from " +
        "(VALUES (cast('a' as binary)), (cast('b' as binary)), " +
        "(cast('c' as binary)), (cast(null as binary))) t3(b) where " +
        "b in (unhex('61'), unhex('62'))) AS inlist from (VALUES " +
        "(cast('a' as binary)), (cast('b' as binary)), (cast('c' as " +
        "binary)), (cast(null as binary))) t1(b) where b = " +
        "unhex('61')",
      duck = Some("select count(*) AS eq, (select count(*) from " +
        "(VALUES ('a'::blob), ('b'::blob), ('c'::blob), (NULL)) " +
        "t2(b) where b between unhex('61') and unhex('62')) AS btw, " +
        "(select count(*) from (VALUES ('a'::blob), ('b'::blob), " +
        "('c'::blob), (NULL)) t3(b) where b in (unhex('61'), " +
        "unhex('62'))) AS inlist from (VALUES ('a'::blob), " +
        "('b'::blob), ('c'::blob), (NULL)) t1(b) where b = " +
        "unhex('61')",
      ),
      note = "BINARY equality, BETWEEN, and IN predicates; the NULL " +
        "byte row never matches"),
    QCase("udf_folder_constants.q", "aa06",
      "select unix_timestamp(concat(a.year, '-01-01 00:00:00')) AS " +
        "ts from (select * from (VALUES (2001, 11)) udf_tb1(year, " +
        "month) where year=2001) a join (VALUES (11)) b(month) on " +
        "(a.month=b.month)",
      duck = Some(""),
      hive = Some(Seq("978307200")),
      note = "constant folding of a deterministic function over a " +
        "join's filtered side; the reference transcript runs " +
        "US/Pacific (978336000) — adapted to this engine's pinned " +
        "UTC session, same instant arithmetic"))

  test("qtest conformance wave 16aa: count spellings, per-type " +
      "HiveHash row, inline, binary predicates, constant folding " +
      "through a join") {
    run("udf_count", "udf_hash", "udf_inline", "udf_in_binary",
      "udf_folder_constants")
  }
}
