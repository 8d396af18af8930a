package graft

/** Conformance wave 17ac: the parquet_* corpus (ref ql/src/test/
  * queries/clientpositive/parquet_*.q). Two groups:
  *
  *  1. LEGACY LIST/MAP ENCODING interop — the corpus ships parquet
  *     files written by old Hive, Avro, Thrift and unannotated writers
  *     (SingleFieldGroupInList & co.); each file's one row is pinned
  *     from its .q.out in the buildJSONString rendering, read via the
  *     path-addressed `parquet.` relation (the modern reader must
  *     resolve every historical list shape identically).
  *
  *  2. STORAGE ROUND TRIPS — complex types, decimals, partitioning,
  *     renames, CTAS and joins staged INTO parquet tables through the
  *     front door and read back (DuckDB literal twins as oracles).
  */
class QtestParquetWave17acSpec extends QtestHarness {

  private def pq(file: String) =
    s"parquet.`/root/reference/data/files/$file`"

  private def legacy(q: String, n: String, fixture: String, col: String,
      pin: String, note: String) = QCase(q, n,
    s"select cast($col as string) AS c from ${pq(fixture)}",
    duck = Some(""), hive = Some(Seq(pin)), note = note)

  private val setup: Seq[String] = Seq(
    "drop table if exists pq17_complex",
    "create table pq17_complex (id int, mp map<string,string>, " +
      "lst array<string>, strct struct<a:string,b:string>) " +
      "stored as parquet",
    "insert into pq17_complex select 1, map('k1','v1','k2','v2'), " +
      "array('x','y'), named_struct('a','A1','b','B1')",
    "insert into pq17_complex select 2, map('k3',cast(null as " +
      "string)), array('z',cast(null as string)), " +
      "named_struct('a',cast(null as string),'b','B2')",

    "drop table if exists pq17_emptynull",
    "create table pq17_emptynull (id int, lst array<int>, " +
      "mp map<string,int>) stored as parquet",
    "insert into pq17_emptynull select 1, array(), map()",
    "insert into pq17_emptynull select 2, array(7, cast(null as " +
      "int)), map('a', cast(null as int))",

    "drop table if exists pq17_types",
    "create table pq17_types (cint int, ctinyint tinyint, " +
      "csmallint smallint, cfloat float, cdouble double, " +
      "cstring1 string, t timestamp, cbinary binary) " +
      "stored as parquet",
    "insert into pq17_types values (1, 2, 3, 1.5, 2.25, 'one', " +
      "timestamp '2011-01-01 01:01:01', cast('bin' as binary)), " +
      "(2, null, 5, null, 4.5, null, timestamp " +
      "'2012-02-02 02:02:02.22', null)",

    "drop table if exists pq17_dec",
    "create table pq17_dec (arr array<decimal(5,2)>, " +
      "m map<string,decimal(5,2)>, s struct<i:int,d:decimal(5,2)>) " +
      "stored as parquet",
    "insert into pq17_dec select array(cast(12.25 as decimal(5,2)), " +
      "cast(-33.50 as decimal(5,2))), map('k', cast(0.01 as " +
      "decimal(5,2))), named_struct('i', 7, 'd', cast(99.99 as " +
      "decimal(5,2)))",

    "drop table if exists pq17_part",
    "create table pq17_part (id int, str string) " +
      "partitioned by (part string) stored as parquet",
    "insert into pq17_part partition(part='a') values (1, 'one'), " +
      "(2, 'two')",
    "insert into pq17_part partition(part='b') values (3, 'three')",

    "drop table if exists pq17_stage",
    "create table pq17_stage (key int, value string)",
    "insert into pq17_stage select cast(key as int), value from " +
      "qt_src order by cast(key as int), value limit 10",
    "drop table if exists pq17_ctas",
    "create table pq17_ctas stored as parquet as " +
      "select * from pq17_stage",
    "drop table if exists pq17_join2",
    "create table pq17_join2 stored as parquet as select key, " +
      "key + 1 as key2, concat(value, 'value') as myvalue " +
      "from pq17_stage",

    "drop table if exists pq17_columnar",
    "create table pq17_columnar (s string, i int, f float) " +
      "stored as parquet",
    "insert into pq17_columnar values ('row1', 1, 1.5), " +
      "('row2', 2, 2.5)",
    "alter table pq17_columnar change column i irenamed int",

    "drop table if exists pq17_mixedcase",
    "create table pq17_mixedcase (UpperCased int, lowercased string) " +
      "stored as parquet",
    "insert into pq17_mixedcase values (1, 'a'), (2, 'b')",

    "drop table if exists pq17_nested",
    "create table pq17_nested (simple_int int, " +
      "nested array<array<array<int>>>, " +
      "nested_map array<map<string,string>>, simple_string string) " +
      "stored as parquet",
    "insert into pq17_nested select 1, " +
      "array(array(array(1,2), array(3))), " +
      "array(map('k','v')), 'deep'"
  )

  protected val qcases: Seq[QCase] = Seq(
    // ---------------------------------------- legacy encodings
    legacy("parquet_array_of_single_field_struct.q", "w17ac01",
      "SingleFieldGroupInList.parquet", "single_element_groups",
      "[1234,2345]",
      "ambiguous single-field group resolves to the ELEMENT type"),
    legacy("parquet_array_of_optional_elements.q", "w17ac02",
      "NewOptionalGroupInList.parquet", "locations",
      """[{"latitude":0.0,"longitude":0.0},null,{"latitude":0.0,"longitude":180.0}]""",
      "modern 3-level list with a NULL element mid-array"),
    legacy("parquet_array_of_required_elements.q", "w17ac03",
      "NewRequiredGroupInList.parquet", "locations",
      """[{"latitude":0.0,"longitude":180.0},{"latitude":0.0,"longitude":0.0}]""",
      "required (non-null) element spelling"),
    legacy("parquet_array_of_multi_field_struct.q", "w17ac04",
      "MultiFieldGroupInList.parquet", "locations",
      """[{"latitude":0.0,"longitude":0.0},{"latitude":0.0,"longitude":180.0}]""",
      "2-level legacy list of multi-field groups"),
    legacy("parquet_array_of_structs.q", "w17ac05",
      "HiveRequiredGroupInList.parquet", "locations",
      """[{"latitude":0.0,"longitude":180.0},{"latitude":0.0,"longitude":0.0}]""",
      "old-Hive writer's list encoding"),
    legacy("parquet_array_of_unannotated_groups.q", "w17ac06",
      "UnannotatedListOfGroups.parquet", "list_of_points",
      """[{"x":1.0,"y":1.0},{"x":2.0,"y":2.0}]""",
      "repeated group with NO LIST annotation"),
    legacy("parquet_array_of_unannotated_primitives.q", "w17ac07",
      "UnannotatedListOfPrimitives.parquet", "list_of_ints",
      "[34,35,36]",
      "repeated primitive with no annotation"),
    legacy("parquet_avro_array_of_primitives.q", "w17ac08",
      "AvroPrimitiveInList.parquet", "list_of_ints", "[34,35,36]",
      "Avro writer's 2-level list"),
    legacy("parquet_avro_array_of_single_field_struct.q", "w17ac09",
      "AvroSingleFieldGroupInList.parquet", "single_element_groups",
      """[{"count":1234},{"count":2345}]""",
      "Avro keeps the single-field STRUCT (array-of-struct, not the " +
        "flattened ambiguity)"),
    legacy("parquet_thrift_array_of_primitives.q", "w17ac10",
      "ThriftPrimitiveInList.parquet", "list_of_ints", "[34,35,36]",
      "Thrift writer's 2-level list"),
    legacy("parquet_thrift_array_of_single_field_struct.q", "w17ac11",
      "ThriftSingleFieldGroupInList.parquet", "single_element_groups",
      """[{"count":1234},{"count":2345}]""",
      "Thrift single-field struct list"),
    legacy("parquet_map_of_arrays_of_ints.q", "w17ac12",
      "StringMapOfOptionalIntArray.parquet", "examples",
      """{"low":[34,35,null],"high":[340,360]}""",
      "map whose values are nullable-int arrays"),
    legacy("parquet_map_of_maps.q", "w17ac13",
      "NestedMap.parquet", "map_of_maps",
      """{"a":{"b":1},"b":{"a":-1,"b":-2}}""",
      "nested map-of-maps encoding"),

    // ---------------------------------------- round trips
    QCase("parquet_create.q", "w17ac14",
      "select id, cast(mp as string) AS m, cast(lst as string) AS l, " +
        "cast(strct as string) AS s from pq17_complex",
      duck = Some("""SELECT * FROM (VALUES
        |  (1, '{"k1":"v1","k2":"v2"}', '["x","y"]',
        |   '{"a":"A1","b":"B1"}'),
        |  (2, '{"k3":null}', '["z",null]', '{"a":null,"b":"B2"}'))
        |  t(id, m, l, s)""".stripMargin),
      note = "complex types through parquet storage, NULL cells " +
        "rendered in the JSON forms"),
    QCase("parquet_array_null_element.q", "w17ac15",
      "select id, cast(lst as string) AS l, cast(mp as string) AS m " +
        "from pq17_emptynull where id = 2",
      duck = Some("""SELECT 2 AS id, '[7,null]' AS l,
        |  '{"a":null}' AS m""".stripMargin),
      note = "NULL elements inside parquet-stored collections"),
    QCase("parquet_array_map_emptynullvals.q", "w17ac16",
      "select id, size(lst) AS ls, size(mp) AS ms " +
        "from pq17_emptynull",
      duck = Some("SELECT * FROM (VALUES (1, 0, 0), (2, 2, 1)) " +
        "t(id, ls, ms)"),
      note = "EMPTY (not NULL) arrays and maps round-trip with " +
        "size 0"),
    QCase("parquet_types.q", "w17ac17",
      "select cint, ctinyint, csmallint, cfloat, cdouble, cstring1, " +
        "cast(t as string) AS ts, cast(cbinary as string) AS b " +
        "from pq17_types",
      duck = Some("""SELECT * FROM (VALUES
        |  (1, 2, 3, 1.5, 2.25, 'one', '2011-01-01 01:01:01', 'bin'),
        |  (2, CAST(NULL AS INT), 5, CAST(NULL AS DOUBLE), 4.5,
        |   CAST(NULL AS VARCHAR), '2012-02-02 02:02:02.22',
        |   CAST(NULL AS VARCHAR))) t(cint, ctinyint, csmallint,
        |  cfloat, cdouble, cstring1, ts, b)""".stripMargin),
      note = "the primitive battery incl. timestamp fraction and " +
        "binary round trip"),
    QCase("parquet_decimal1.q", "w17ac18",
      "select cast(arr as string) AS a, cast(m as string) AS m, " +
        "cast(s as string) AS s from pq17_dec",
      duck = Some("""SELECT '[12.25,-33.5]' AS a,
        |  '{"k":0.01}' AS m, '{"i":7,"d":99.99}' AS s"""
        .stripMargin),
      note = "decimal(5,2) inside array/map/struct through parquet"),
    QCase("parquet_decimal.q", "w17ac19",
      "select cast(arr[0] * 2 as decimal(7,2)) AS d from pq17_dec",
      duck = Some("SELECT CAST(24.50 AS DECIMAL(7,2)) AS d"),
      note = "arithmetic over the stored decimal element"),
    QCase("parquet_partitioned.q", "w17ac20",
      "select part, id, str from pq17_part",
      duck = Some("SELECT * FROM (VALUES ('a', 1, 'one'), " +
        "('a', 2, 'two'), ('b', 3, 'three')) t(part, id, str)"),
      note = "partitioned parquet reads across partitions"),
    QCase("parquet_partition_col.q", "w17ac21",
      "select part, count(*) AS c from pq17_part group by part",
      duck = Some("SELECT * FROM (VALUES ('a', 2), ('b', 1)) " +
        "t(part, c)"),
      note = "aggregation keyed on the partition column"),
    QCase("parquet_ctas.q", "w17ac22",
      "select key, value from pq17_ctas",
      duck = Some("""select cast(key as int) AS key, value from qt_src
        |order by cast(key as int), value limit 10""".stripMargin),
      note = "CTAS INTO parquet preserves the staged 10-row sample"),
    QCase("parquet_join.q", "w17ac23",
      "select p2.myvalue AS v from pq17_ctas p1 join pq17_join2 p2 " +
        "on p1.key = p2.key",
      duck = Some("""with s as (select cast(key as int) AS key, value
        |  from qt_src order by cast(key as int), value limit 10)
        |select s2.myvalue AS v from s s1 join
        |  (select key, concat(value, 'value') AS myvalue from s) s2
        |  on s1.key = s2.key""".stripMargin),
      note = "parquet-to-parquet equi-join (duplicate staged keys " +
        "fan out)"),
    QCase("parquet_join2.q", "w17ac24",
      "select count(*) AS c from pq17_ctas p1 join pq17_join2 p2 " +
        "on p1.key = p2.key2",
      duck = Some("""with s as (select cast(key as int) AS key, value
        |  from qt_src order by cast(key as int), value limit 10)
        |select count(*) AS c from s s1 join s s2
        |  on s1.key = s2.key + 1""".stripMargin),
      note = "join on the shifted key column"),
    QCase("parquet_columnar.q", "w17ac25",
      "select s, irenamed, f from pq17_columnar",
      duck = Some("SELECT * FROM (VALUES ('row1', 1, 1.5), " +
        "('row2', 2, 2.5)) t(s, irenamed, f)"),
      note = "CHANGE COLUMN rename still reads the old parquet " +
        "field (positional v1 evolution)"),
    QCase("parquet_mixed_case.q", "w17ac26",
      "select UpperCased, lowercased from pq17_mixedcase " +
        "where uppercased = 2",
      duck = Some("SELECT 2 AS UpperCased, 'b' AS lowercased"),
      note = "mixed-case column names resolve case-insensitively"),
    QCase("parquet_nested_complex.q", "w17ac27",
      "select simple_int, cast(nested as string) AS n, " +
        "cast(nested_map as string) AS nm, simple_string " +
        "from pq17_nested",
      duck = Some("""SELECT 1 AS simple_int, '[[[1,2],[3]]]' AS n,
        |  '[{"k":"v"}]' AS nm, 'deep' AS simple_string"""
        .stripMargin),
      note = "multi-level nesting through parquet storage"),
    QCase("parquet_no_row_serde.q", "w17ac28",
      "select sum(cint) AS s, count(cstring1) AS c, max(cdouble) AS m " +
        "from pq17_types",
      duck = Some("SELECT 3 AS s, 1 AS c, 4.5 AS m"),
      note = "aggregate battery over the parquet scan (the file " +
        "pins the vectorized no-row-serde path)")
  )

  test("qtest conformance wave 17ac: the parquet corpus — legacy " +
      "list/map encoding interop (.q.out-pinned) and complex-type " +
      "storage round trips") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures // qt_ views must exist before staging
    setup.foreach(sparkRows)
    run("parquet")
  }
}
