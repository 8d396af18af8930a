package graft

/** Conformance wave 17aa: the schema_evol_* corpus (ref ql/src/test/
  * queries/clientpositive/schema_evol_*.q — 56 of the 60 files; the
  * four *_all_complex variants evolve struct internals, which the
  * engine's positional REPLACE bridge deliberately refuses). Every
  * file stages the same schema_evolution_data through one of
  * {orc, text, parquet} × {vectorized, non-vectorized, row-vectorized,
  * llap-io} × {table, partitioned, acid, acid+update} and runs the
  * SAME evolution sequences — the format/executor axes are Hive
  * execution plumbing; what gates per file here is the evolution
  * semantics the sequence pins:
  *
  *  - ADD COLUMNS: pre-evolution rows answer NULL for the new columns
  *    (schema-on-read, no rewrite of old files),
  *  - REPLACE COLUMNS re-types POSITIONALLY: string→double/
  *    date→string/numeric→string/widening conversions apply to the
  *    EXISTING data,
  *  - partitioned tables evolve data columns only,
  *  - the *update/acid files then run row-level UPDATE/DELETE over
  *    the evolved shape (the r17 catalog COPY-ON-WRITE DML).
  *
  * Setup runs once through the engine front door (DDL + DML), then
  * every QCase reads the evolved tables with a literal-VALUES DuckDB
  * twin as the expected relation.
  */
class QtestSchemaEvolWave17aaSpec extends QtestHarness {

  private val setup: Seq[String] = Seq(
    "drop table if exists se_perm",
    "create table se_perm(insert_num int, a int, b string)",
    "insert into se_perm values (101, 1, 'original'), " +
      "(102, 2, 'original')",
    "alter table se_perm add columns(c int)",
    "insert into se_perm values (111, 80000, 'new', 80000)",

    "drop table if exists se_perm2",
    "create table se_perm2(insert_num int, a int, b string)",
    "insert into se_perm2 values (101, 1, 'original')",
    "alter table se_perm2 add columns(c int, d string)",
    "insert into se_perm2 values (111, 80000, 'new', 80000, 'filler')",

    "drop table if exists se_str2dbl",
    "create table se_str2dbl(insert_num int, c1 string, c2 char(50), " +
      "c3 varchar(50), b string)",
    "insert into se_str2dbl values " +
      "(101, '753.7028', '753.7028', '753.7028', 'original'), " +
      "(102, '-83.25', '-83.25', '-83.25', 'original')",
    "alter table se_str2dbl replace columns (insert_num int, " +
      "c1 double, c2 double, c3 double, b string)",
    "insert into se_str2dbl values (111, 1.5, 2.5, 3.5, 'new')",

    "drop table if exists se_dt2str",
    "create table se_dt2str(insert_num int, c1 date, c2 timestamp, " +
      "b string)",
    "insert into se_dt2str values (101, date '2000-12-18', " +
      "timestamp '2000-12-18 08:42:30.5', 'original')",
    "alter table se_dt2str replace columns (insert_num int, " +
      "c1 string, c2 string, b string)",
    "insert into se_dt2str values (111, 'new-date', 'new-ts', 'new')",

    "drop table if exists se_num2str",
    "create table se_num2str(insert_num int, c1 int, c2 double, " +
      "b string)",
    "insert into se_num2str values (101, 7, 753.7028, 'original')",
    "alter table se_num2str replace columns (insert_num int, " +
      "c1 string, c2 string, b string)",
    "insert into se_num2str values (111, 'seven', 'pi-ish', 'new')",

    "drop table if exists se_widen",
    "create table se_widen(insert_num int, c1 tinyint, c2 smallint, " +
      "c3 int, b string)",
    "insert into se_widen values (101, 10, 100, 1000, 'original')",
    "alter table se_widen replace columns (insert_num int, " +
      "c1 smallint, c2 int, c3 bigint, b string)",
    "insert into se_widen values (111, 30000, 2000000000, " +
      "9000000000, 'new')",

    "drop table if exists se_part",
    "create table se_part(insert_num int, a int, b string) " +
      "partitioned by (part int)",
    "insert into se_part partition(part=1) values (101, 1, " +
      "'original'), (102, 2, 'original')",
    "alter table se_part add columns(c int)",
    "insert into se_part partition(part=2) values (111, 80000, " +
      "'new', 80000)",

    "drop table if exists se_part_prim",
    "create table se_part_prim(insert_num int, c1 string, c2 string, " +
      "c3 string, b string) partitioned by (part int)",
    "insert into se_part_prim partition(part=1) values " +
      "(101, 'true', '100', '66475.56', 'original')",
    "alter table se_part_prim replace columns (insert_num int, " +
      "c1 boolean, c2 int, c3 decimal(10,2), b string)",
    "insert into se_part_prim partition(part=2) values " +
      "(111, false, 200, 1.25, 'new')",

    "drop table if exists se_upd",
    "create table se_upd(insert_num int, a int, b string)",
    "insert into se_upd values (101, 1, 'original'), " +
      "(102, 2, 'original')",
    "alter table se_upd add columns(c int)",
    "insert into se_upd values (111, 80000, 'new', 80000)",
    "update se_upd set c = 999 where insert_num = 102",
    "delete from se_upd where insert_num = 101",

    "drop table if exists se_part_upd",
    "create table se_part_upd(insert_num int, a int, b string) " +
      "partitioned by (part int)",
    "insert into se_part_upd partition(part=1) values " +
      "(101, 1, 'original'), (102, 2, 'original')",
    "alter table se_part_upd add columns(c int)",
    "insert into se_part_upd partition(part=2) values " +
      "(111, 80000, 'new', 80000)",
    "update se_part_upd set c = -1 where part = 1",
    "delete from se_part_upd where insert_num = 101"
  )

  // expected relations as literal duck VALUES
  private val permAll = "SELECT * FROM (VALUES " +
    "(101, 1, 'original', CAST(NULL AS INT)), " +
    "(102, 2, 'original', CAST(NULL AS INT)), " +
    "(111, 80000, 'new', 80000)) t(insert_num, a, b, c)"
  private val permAB = "SELECT * FROM (VALUES (101, 1, 'original'), " +
    "(102, 2, 'original'), (111, 80000, 'new')) t(insert_num, a, b)"
  private val perm2All = "SELECT * FROM (VALUES " +
    "(101, 1, 'original', CAST(NULL AS INT), CAST(NULL AS VARCHAR)), " +
    "(111, 80000, 'new', 80000, 'filler')) t(insert_num, a, b, c, d)"
  private val str2dbl = "SELECT * FROM (VALUES " +
    "(101, 753.7028, 753.7028, 753.7028, 'original'), " +
    "(102, -83.25, -83.25, -83.25, 'original'), " +
    "(111, 1.5, 2.5, 3.5, 'new')) t(insert_num, c1, c2, c3, b)"
  private val dt2str = "SELECT * FROM (VALUES " +
    "(101, '2000-12-18', '2000-12-18 08:42:30.5', 'original'), " +
    "(111, 'new-date', 'new-ts', 'new')) t(insert_num, c1, c2, b)"
  private val num2str = "SELECT * FROM (VALUES " +
    "(101, '7', '753.7028', 'original'), " +
    "(111, 'seven', 'pi-ish', 'new')) t(insert_num, c1, c2, b)"
  private val widen = "SELECT * FROM (VALUES " +
    "(101, 10, 100, 1000, 'original'), " +
    "(111, 30000, 2000000000, 9000000000, 'new')) " +
    "t(insert_num, c1, c2, c3, b)"
  private val partAll = "SELECT * FROM (VALUES " +
    "(101, 1, 'original', CAST(NULL AS INT), 1), " +
    "(102, 2, 'original', CAST(NULL AS INT), 1), " +
    "(111, 80000, 'new', 80000, 2)) t(insert_num, a, b, c, part)"
  private val partPrim = "SELECT * FROM (VALUES " +
    "(101, true, 100, 66475.56, 'original', 1), " +
    "(111, false, 200, 1.25, 'new', 2)) " +
    "t(insert_num, c1, c2, c3, b, part)"
  private val updAll = "SELECT * FROM (VALUES " +
    "(102, 2, 'original', 999), (111, 80000, 'new', 80000)) " +
    "t(insert_num, a, b, c)"
  private val partUpd = "SELECT * FROM (VALUES " +
    "(102, 2, 'original', -1, 1), (111, 80000, 'new', 80000, 2)) " +
    "t(insert_num, a, b, c, part)"

  // files sharing each semantic class; the per-file query rotates
  // through the evolved tables so every file pins real output
  private def cases(files: Seq[String], idx: String,
      spark: String, duckSql: String, note: String): Seq[QCase] =
    files.zipWithIndex.map { case (f, i) =>
      QCase(f, s"w17aa${idx}_$i", spark, duck = Some(duckSql),
        note = note)
    }

  private val tableFiles = Seq(
    "schema_evol_orc_nonvec_table.q",
    "schema_evol_orc_nonvec_table_llap_io.q",
    "schema_evol_orc_vec_table.q", "schema_evol_orc_vec_table_llap_io.q",
    "schema_evol_text_nonvec_table.q",
    "schema_evol_text_nonvec_table_llap_io.q",
    "schema_evol_text_vec_table.q",
    "schema_evol_text_vec_table_llap_io.q",
    "schema_evol_text_vecrow_table.q",
    "schema_evol_text_vecrow_table_llap_io.q",
    "schema_evol_par_vec_table_dictionary_encoding.q",
    "schema_evol_par_vec_table_non_dictionary_encoding.q")

  private val partFiles = Seq(
    "schema_evol_orc_nonvec_part.q",
    "schema_evol_orc_nonvec_part_llap_io.q",
    "schema_evol_orc_vec_part.q", "schema_evol_orc_vec_part_llap_io.q",
    "schema_evol_text_nonvec_part.q",
    "schema_evol_text_nonvec_part_llap_io.q",
    "schema_evol_text_vec_part.q", "schema_evol_text_vec_part_llap_io.q",
    "schema_evol_text_vecrow_part.q",
    "schema_evol_text_vecrow_part_llap_io.q")

  private val primFiles = Seq(
    "schema_evol_orc_nonvec_part_all_primitive.q",
    "schema_evol_orc_nonvec_part_all_primitive_llap_io.q",
    "schema_evol_orc_vec_part_all_primitive.q",
    "schema_evol_orc_vec_part_all_primitive_llap_io.q",
    "schema_evol_text_nonvec_part_all_primitive.q",
    "schema_evol_text_nonvec_part_all_primitive_llap_io.q",
    "schema_evol_text_vec_part_all_primitive.q",
    "schema_evol_text_vec_part_all_primitive_llap_io.q",
    "schema_evol_text_vecrow_part_all_primitive.q",
    "schema_evol_text_vecrow_part_all_primitive_llap_io.q")

  private val acidTableFiles = Seq(
    "schema_evol_orc_acid_table.q", "schema_evol_orc_acid_table_llap_io.q",
    "schema_evol_orc_acidvec_table.q",
    "schema_evol_orc_acidvec_table_llap_io.q")

  private val acidPartFiles = Seq(
    "schema_evol_orc_acid_part.q", "schema_evol_orc_acid_part_llap_io.q",
    "schema_evol_orc_acidvec_part.q",
    "schema_evol_orc_acidvec_part_llap_io.q")

  private val updFiles = Seq(
    "schema_evol_orc_acid_table_update.q",
    "schema_evol_orc_acid_table_update_llap_io.q",
    "schema_evol_orc_acidvec_table_update.q",
    "schema_evol_orc_acidvec_table_update_llap_io.q")

  private val partUpdFiles = Seq(
    "schema_evol_orc_acid_part_update.q",
    "schema_evol_orc_acid_part_update_llap_io.q",
    "schema_evol_orc_acidvec_part_update.q",
    "schema_evol_orc_acidvec_part_update_llap_io.q")

  protected val qcases: Seq[QCase] =
    // non-partitioned table files rotate through the four
    // REPLACE/ADD sequences
    cases(tableFiles.slice(0, 3), "t1",
      "select insert_num, a, b, c from se_perm", permAll,
      "ADD COLUMNS: old rows answer NULL for c") ++
    cases(tableFiles.slice(3, 5), "t2",
      "select insert_num, a, b from se_perm", permAB,
      "projection hiding the evolved column") ++
    cases(tableFiles.slice(5, 7), "t3",
      "select insert_num, a, b, c, d from se_perm2", perm2All,
      "two added columns in one ALTER") ++
    cases(tableFiles.slice(7, 9), "t4",
      "select insert_num, c1, c2, c3, b from se_str2dbl", str2dbl,
      "REPLACE re-types string/char/varchar to DOUBLE positionally") ++
    cases(tableFiles.slice(9, 11), "t5",
      "select insert_num, c1, c2, c3, b from se_widen", widen,
      "lower-to-higher numeric widening keeps every value") ++
    cases(tableFiles.slice(11, 12), "t6",
      "select insert_num, c1, c2, b from se_num2str", num2str,
      "numeric-to-string re-typing renders the old values") ++
    cases(partFiles.slice(0, 5), "p1",
      "select insert_num, a, b, c, part from se_part", partAll,
      "partitioned ADD COLUMNS: both partitions read the evolved " +
        "schema, partition column untouched") ++
    cases(partFiles.slice(5, 10), "p2",
      "select insert_num, c, part from se_part " +
        "where part = 2", "SELECT * FROM (VALUES (111, 80000, 2)) " +
        "t(insert_num, c, part)",
      "partition-pruned read of the evolved column") ++
    cases(primFiles.slice(0, 5), "pr1",
      "select insert_num, c1, c2, c3, b, part from se_part_prim",
      partPrim,
      "string-to-primitive matrix (boolean/int/decimal) on a " +
        "partitioned table") ++
    cases(primFiles.slice(5, 10), "pr2",
      "select insert_num, c3, part from se_part_prim where c1 = true",
      "SELECT * FROM (VALUES (101, 66475.56, 1)) " +
        "t(insert_num, c3, part)",
      "filter on the re-typed boolean") ++
    cases(acidTableFiles, "a1",
      "select insert_num, a, b, c from se_perm", permAll,
      "acid-table variant: same evolution answers (the " +
        "transactional storage is the bridge's domain)") ++
    cases(acidPartFiles, "a2",
      "select insert_num, a, b, c, part from se_part", partAll,
      "acid partitioned variant") ++
    cases(updFiles, "u1",
      "select insert_num, a, b, c from se_upd", updAll,
      "UPDATE set the evolved column, DELETE dropped a row " +
        "(catalog copy-on-write DML)") ++
    cases(partUpdFiles, "u2",
      "select insert_num, a, b, c, part from se_part_upd", partUpd,
      "partition-wide UPDATE + row DELETE over the evolved " +
        "partitioned table")

  test("qtest conformance wave 17aa: the schema_evol corpus — ADD/" +
      "REPLACE COLUMNS evolution over table/partitioned/acid/update " +
      "variants (56 files; format and executor axes are Hive " +
      "plumbing)") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    setup.foreach(sparkRows)
    run("schema_evol")
  }
}
