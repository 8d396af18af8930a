package graft.plans

import graft.{Engine, SparkSpec}

/** Hive v1 schema-evolution DDL (ref the schema_evol_* qtest corpus —
  * schema_evol_orc_nonvec_table.q's table shapes): ADD COLUMNS reads
  * old files as NULL, REPLACE COLUMNS re-types POSITIONALLY with
  * conversion of existing data (string→double, date→string, integer
  * widening), CHANGE COLUMN renames and re-types, extra target columns
  * fill NULL and dropped tails disappear, partitioned tables evolve
  * their data columns only, and an impossible transition refuses with
  * the incompatible-column message (plans/SchemaEvolution — Spark's v1
  * catalog refuses all of these shapes outright).
  */
class SchemaEvolutionSpec extends SparkSpec {
  private def sql(s: String) = Engine.sql(spark, sfDir, s)
  private def rows(s: String): Seq[Seq[Any]] =
    sql(s).collect().toSeq.map(_.toSeq)

  test("ADD COLUMNS: old files answer NULL for the new column") {
    sql("DROP TABLE IF EXISTS se_add")
    sql("CREATE TABLE se_add(insert_num int, a int, b string)")
    sql("INSERT INTO se_add VALUES (101, 1, 'original'), (102, 2, 'original')")
    sql("ALTER TABLE se_add ADD COLUMNS (c int)")
    sql("INSERT INTO se_add VALUES (111, 80000, 'new', 80000)")
    assert(rows("SELECT insert_num, a, b, c FROM se_add ORDER BY insert_num") ===
      Seq(Seq(101, 1, "original", null), Seq(102, 2, "original", null),
        Seq(111, 80000, "new", 80000)))
    sql("DROP TABLE se_add")
  }

  test("REPLACE COLUMNS: string group re-types to DOUBLE with " +
      "conversion of the existing rows (schema_evol string→double)") {
    sql("DROP TABLE IF EXISTS se_sd")
    sql("CREATE TABLE se_sd(insert_num int, c1 string, b string)")
    sql("INSERT INTO se_sd VALUES (101, '123.25', 'original'), " +
      "(102, 'notanumber', 'original')")
    sql("ALTER TABLE se_sd REPLACE COLUMNS (insert_num int, c1 double, b string)")
    sql("INSERT INTO se_sd VALUES (111, 789.321, 'new')")
    assert(rows("SELECT insert_num, c1, b FROM se_sd ORDER BY insert_num") ===
      Seq(Seq(101, 123.25, "original"), Seq(102, null, "original"),
        Seq(111, 789.321, "new")))
    sql("DROP TABLE se_sd")
  }

  test("REPLACE COLUMNS: date/timestamp re-type to STRING renders; " +
      "integer widening preserves values") {
    sql("DROP TABLE IF EXISTS se_dt")
    sql("CREATE TABLE se_dt(insert_num int, d date, t tinyint)")
    sql("INSERT INTO se_dt VALUES (101, date '2009-07-30', 3)")
    sql("ALTER TABLE se_dt REPLACE COLUMNS (insert_num int, d string, t bigint)")
    assert(rows("SELECT insert_num, d, t FROM se_dt") ===
      Seq(Seq(101, "2009-07-30", 3L)))
    sql("DROP TABLE se_dt")
  }

  test("REPLACE COLUMNS: positional semantics — extra targets fill " +
      "NULL, dropped tails disappear") {
    sql("DROP TABLE IF EXISTS se_pos")
    sql("CREATE TABLE se_pos(insert_num int, a int, b string)")
    sql("INSERT INTO se_pos VALUES (101, 7, 'orig')")
    sql("ALTER TABLE se_pos REPLACE COLUMNS " +
      "(insert_num int, a2 bigint, b2 string, c int)")
    assert(rows("SELECT insert_num, a2, b2, c FROM se_pos") ===
      Seq(Seq(101, 7L, "orig", null)))
    sql("ALTER TABLE se_pos REPLACE COLUMNS (insert_num int, a2 bigint)")
    assert(sql("SELECT * FROM se_pos").columns.toSeq ===
      Seq("insert_num", "a2"))
    sql("DROP TABLE se_pos")
  }

  test("CHANGE COLUMN: rename + re-type in place (the Hive spelling " +
      "Spark's parser refuses)") {
    sql("DROP TABLE IF EXISTS se_chg")
    sql("CREATE TABLE se_chg(insert_num int, a int, b string)")
    sql("INSERT INTO se_chg VALUES (101, 5, 'orig')")
    sql("ALTER TABLE se_chg CHANGE COLUMN a a2 bigint")
    assert(rows("SELECT insert_num, a2, b FROM se_chg") ===
      Seq(Seq(101, 5L, "orig")))
    // same-name spelling (parses to AlterColumns) widens too
    sql("ALTER TABLE se_chg CHANGE COLUMN insert_num insert_num bigint")
    assert(rows("SELECT insert_num FROM se_chg") === Seq(Seq(101L)))
    sql("DROP TABLE se_chg")
  }

  test("partitioned tables evolve DATA columns only") {
    sql("DROP TABLE IF EXISTS se_part")
    sql("CREATE TABLE se_part(insert_num int, v string) " +
      "PARTITIONED BY (part int)")
    sql("INSERT INTO se_part PARTITION(part=1) VALUES (101, '42')")
    sql("INSERT INTO se_part PARTITION(part=2) VALUES (102, '43.5')")
    sql("ALTER TABLE se_part REPLACE COLUMNS (insert_num int, v double)")
    assert(rows("SELECT insert_num, v, part FROM se_part ORDER BY insert_num") ===
      Seq(Seq(101, 42.0, 1), Seq(102, 43.5, 2)))
    sql("DROP TABLE se_part")
  }

  test("an impossible transition refuses with the incompatible-column " +
      "message") {
    sql("DROP TABLE IF EXISTS se_bad")
    sql("CREATE TABLE se_bad(insert_num int, v string)")
    sql("INSERT INTO se_bad VALUES (101, 'x')")
    val e = intercept[Exception] {
      sql("ALTER TABLE se_bad REPLACE COLUMNS (insert_num int, v map<int,int>)")
    }
    assert(e.getMessage.toLowerCase.contains("cannot evolve"), e.getMessage)
    // the table is untouched
    assert(rows("SELECT insert_num, v FROM se_bad") === Seq(Seq(101, "x")))
    sql("DROP TABLE se_bad")
  }
}
