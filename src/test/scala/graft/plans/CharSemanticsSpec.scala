package graft.plans

import graft.{Engine, SparkSpec}

/** CHAR comparison semantics over catalog tables (ref char_join1.q /
  * varchar_join1.q with data/files/vc1.txt — rows 'abc', 'abc ',
  * ' abc'): char-vs-char joins are pad-insensitive at ANY length pair
  * (char(10) meets char(20)), while a char compared against a PLAIN
  * STRING column uses the STRIPPED char value — Hive's conversion rule
  * — so 'abc' and 'abc ' (both stored as char 'abc') meet string 'abc'
  * but not 'abc '; the leading space of ' abc' is significant
  * everywhere. The r17 CharStrippedFunctions comparison arm closes the
  * char-vs-string gap (Spark's padding made those joins empty); the
  * expected row sets are the .q.out's, transcribed.
  */
class CharSemanticsSpec extends SparkSpec {
  private def sql(s: String) = Engine.sql(spark, sfDir, s)

  private def withTables(body: => Unit): Unit = {
    Seq("cj_ch1", "cj_ch2", "cj_str").foreach(t =>
      sql(s"DROP TABLE IF EXISTS $t"))
    sql("CREATE TABLE cj_ch1(c1 int, c2 char(10))")
    sql("CREATE TABLE cj_ch2(c1 int, c2 char(20))")
    sql("CREATE TABLE cj_str(c1 int, c2 string)")
    // vc1.txt rows: 'abc', 'abc ', ' abc' (char storage strips the
    // TRAILING space at insert; the leading space stays significant)
    Seq("cj_ch1", "cj_ch2", "cj_str").foreach(t =>
      sql(s"INSERT INTO $t VALUES (1, 'abc'), (2, 'abc '), (3, ' abc')"))
    try body
    finally Seq("cj_ch1", "cj_ch2", "cj_str").foreach(t =>
      sql(s"DROP TABLE $t"))
  }

  test("char joins: pad-insensitive char-vs-char at any length; " +
      "char-vs-STRING compares the stripped value (char_join1.q.out)") {
    withTables {
      def pairs(q: String): Seq[(Int, Int)] =
        sql(q).collect().toSeq
          .map(r => (r.getInt(0), r.getInt(2))).sorted
      assert(pairs("select * from cj_ch1 a join cj_ch1 b on a.c2 = b.c2") ===
        Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 3)))
      assert(pairs("select * from cj_ch1 a join cj_ch2 b on a.c2 = b.c2") ===
        Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 3)))
      // the .q.out's third join: char rows 1 and 2 (both 'abc' once
      // stripped) meet ONLY string row 1 ('abc'); string 'abc ' keeps
      // its trailing space and matches nothing; ' abc' meets ' abc'
      assert(pairs("select * from cj_ch1 a join cj_str b on a.c2 = b.c2") ===
        Seq((1, 1), (2, 1), (3, 3)))
    }
  }

  test("char group-by keys render PADDED; function args see the " +
      "stripped value (char_2.q shape)") {
    withTables {
      val g = sql("select c2, count(*) AS c from cj_ch1 group by c2")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(g === Seq((" abc      ", 1L), ("abc       ", 2L)))
      assert(sql("select length(c2) AS l from cj_ch1 where c1 = 1")
        .head().getInt(0) === 3)
    }
  }

  test("varchar joins need no special casing (varchar_join1.q): " +
      "values keep their exact spelling") {
    sql("DROP TABLE IF EXISTS vj_vc1")
    sql("DROP TABLE IF EXISTS vj_str")
    sql("CREATE TABLE vj_vc1(c1 int, c2 varchar(10))")
    sql("CREATE TABLE vj_str(c1 int, c2 string)")
    Seq("vj_vc1", "vj_str").foreach(t =>
      sql(s"INSERT INTO $t VALUES (1, 'abc'), (2, 'abc '), (3, ' abc')"))
    try {
      val got = sql("select a.c1, b.c1 from vj_vc1 a join vj_str b " +
        "on a.c2 = b.c2").collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1))).sorted
      assert(got === Seq((1, 1), (2, 2), (3, 3)))
    } finally Seq("vj_vc1", "vj_str").foreach(t => sql(s"DROP TABLE $t"))
  }

  test("char unions negotiate Hive's types: all-char pads to the MAX " +
      "length, char-vs-string strips the char legs (char_union1.q.out)") {
    withTables {
      def vals(q: String): Seq[String] =
        Engine.sql(spark, sfDir, q).collect()
          .map(_.getString(0)).sorted.toSeq
      // same-length: 10-pad throughout
      assert(vals("select c2 from (select * from cj_ch1 union all " +
        "select * from cj_ch1) q1") ===
        Seq(" abc      ", " abc      ", "abc       ", "abc       ",
          "abc       ", "abc       "))
      // mixed lengths: EVERY leg re-pads to char(20)
      assert(vals("select c2 from (select * from cj_ch1 union all " +
        "select * from cj_ch2) q1") ===
        Seq(" abc                ", " abc                ",
          "abc                 ", "abc                 ",
          "abc                 ", "abc                 "))
      // char-vs-string: the char legs STRIP, string legs keep spelling
      assert(vals("select c2 from (select * from cj_ch1 union all " +
        "select * from cj_str) q1") ===
        Seq(" abc", " abc", "abc", "abc", "abc", "abc "))
    }
  }
}
