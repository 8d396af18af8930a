package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Golden transcripts for every catalog query WITHOUT a DuckDB oracle — the
  * reference's own verification model (golden .q.out diffs; driver
  * itests/util/.../QTestUtil.java:110). The no-oracle queries (the set is
  * DERIVED — count it, don't trust a comment) are the signature-algorithm
  * operators (MinHash/SimHash/LSH/sketches/stub codec) whose exact output
  * no other engine reproduces; a committed transcript pins them against
  * regressions with the same strength as an oracle row.
  *
  * The golden set is derived from the catalog (`oracle == None`), so a new
  * rows-only query FAILS here until its transcript is committed — the
  * verification surface can't silently lag the catalog again.
  *
  * Rendering: header of name:type, one TAB-separated line per row, rows
  * sorted lexicographically (content-identity, independent of output
  * order), doubles via toString (queries already round to 4-5 decimals),
  * arrays/structs rendered recursively. Regenerate with
  * GRAFT_REGEN_GOLDENS=1 sbt "Test/testOnly graft.CatalogGoldenSpec" —
  * regen renders twice and refuses to write an unstable transcript.
  */
class CatalogGoldenSpec extends SparkSpec {

  private val goldenDir =
    Paths.get(sys.props("user.dir"), "src", "test", "resources", "goldens")
  private val regen = sys.env.get("GRAFT_REGEN_GOLDENS").exists(_.nonEmpty)

  private def cell(v: Any): String = v match {
    case null => "NULL"
    case s: String => s
    case a: Array[Byte] => "0x" + a.map("%02x".format(_)).mkString
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => cell(k) + "->" + cell(x) }.sorted
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(cell).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(cell).mkString("(", ",", ")")
    case other => other.toString
  }

  private def render(df: DataFrame): String = {
    val header = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString("\t")
    val rows = df.collect().map(_.toSeq.map(cell).mkString("\t")).sorted
    (header +: rows.toSeq).mkString("\n") + "\n"
  }

  private val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty)

  test("every no-oracle catalog query is golden-pinned (set is closed)") {
    val pinned = if (Files.exists(goldenDir))
      Files.list(goldenDir).toArray.map(_.toString)
        .map(p => Paths.get(p).getFileName.toString.stripSuffix(".golden")).toSet
    else Set.empty[String]
    val missing = noOracle.map(_.name).filterNot(pinned)
    assert(regen || missing.isEmpty,
      s"no-oracle queries without a committed golden: ${missing.mkString(", ")} " +
        "(regenerate with GRAFT_REGEN_GOLDENS=1)")
  }

  // Second pin at sf0.01 (the driver's correctness-gate scale) as a compact
  // digest — row count + md5 of the rendered transcript — so a scale-
  // dependent regression (wrong pruning, lost rows past the first file)
  // can't hide behind an sf0.001-only golden.
  private val sf001Dir = "/root/testdata/sf0.01"

  private def digest(df: DataFrame): String = {
    val r = render(df)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(r.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"rows=${r.linesIterator.size - 1}\nmd5=$md\n"
  }

  noOracle.foreach { d =>
    test(s"golden digest @sf0.01: ${d.name}") {
      val got = digest(d.fn(spark, sf001Dir))
      val path = goldenDir.resolve(d.name + ".sf0.01.digest")
      if (regen) {
        val second = digest(d.fn(spark, sf001Dir))
        assert(got === second,
          s"${d.name} digests unstably across two runs at sf0.01 — cannot pin")
        Files.createDirectories(goldenDir)
        Files.write(path, got.getBytes("UTF-8"))
      } else {
        assert(Files.exists(path), s"missing digest golden $path — regenerate")
        val want = new String(Files.readAllBytes(path), "UTF-8")
        assert(got === want, s"${d.name} sf0.01 digest diverged:\n" +
          s"  golden: ${want.trim.replace("\n", " ")}\n  got   : ${got.trim.replace("\n", " ")}")
      }
    }
  }

  noOracle.foreach { d =>
    test(s"golden: ${d.name}") {
      val got = render(d.fn(spark, sfDir))
      val path = goldenDir.resolve(d.name + ".golden")
      if (regen) {
        val second = render(d.fn(spark, sfDir))
        assert(got === second,
          s"${d.name} renders unstably across two runs — cannot pin a golden")
        Files.createDirectories(goldenDir)
        Files.write(path, got.getBytes("UTF-8"))
      } else {
        assert(Files.exists(path), s"missing golden ${path} — regenerate")
        val want = new String(Files.readAllBytes(path), "UTF-8")
        if (got != want) {
          val gotL = got.linesIterator.toSeq
          val wantL = want.linesIterator.toSeq
          val firstDiff = gotL.zipAll(wantL, "<eof>", "<eof>")
            .indexWhere { case (a, b) => a != b }
          fail(s"${d.name} diverges from golden at line ${firstDiff + 1}:\n" +
            s"  golden: ${wantL.lift(firstDiff).getOrElse("<eof>").take(300)}\n" +
            s"  got   : ${gotL.lift(firstDiff).getOrElse("<eof>").take(300)}\n" +
            s"(rows golden=${wantL.size - 1} got=${gotL.size - 1})")
        }
      }
    }
  }
}
