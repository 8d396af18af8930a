package graft

/** Qtest conformance, URL + sentence parsing: `udf_parse_url.q` (the
  * scalar parse_url — parse_url_tuple's generator form has its own gate)
  * and `udf_sentences.q`'s tokenizer core. DuckDB has no parse_url or
  * sentences — the transcribed Hive semantics are the gate.
  */
class QtestUrlSpec extends QtestHarness {

  private val U = "'http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1'"

  protected val qcases: Seq[QCase] = Seq(

    QCase("udf_parse_url.q", "pu1",
      s"""SELECT parse_url($U, 'HOST') AS a, parse_url($U, 'PATH') AS b,
         |  parse_url($U, 'QUERY') AS c, parse_url($U, 'REF') AS d"""
        .stripMargin,
      duck = Some(""),
      hive = Some(Seq("facebook.com", "/path1/p.php", "k1=v1&k2=v2",
        "Ref1"))),
    QCase("udf_parse_url.q", "pu2",
      s"""SELECT parse_url($U, 'QUERY', 'k2') AS a,
         |  parse_url($U, 'QUERY', 'k1') AS b,
         |  parse_url($U, 'QUERY', 'k3') AS c,
         |  parse_url($U, 'FILE') AS d,
         |  parse_url($U, 'PROTOCOL') AS e,
         |  parse_url($U, 'USERINFO') AS f""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("v2", "v1", "NULL", "/path1/p.php?k1=v1&k2=v2",
        "http", "NULL")),
      note = "keyed QUERY extraction, missing key/userinfo -> NULL"),
    QCase("udf_sentences.q", "st1",
      """SELECT sentences('Hive is an excellent tool!! Multiple,
        | ill-formed sentences...confounding punctuation--and yet this
        | UDF still works!!!!')[0][0] AS w1,
        |  size(sentences('One sentence. Two sentences here.')) AS n"""
        .stripMargin.replace("\n", " "),
      duck = Some(""),
      hive = Some(Seq("Hive", "2")),
      note = "sentence/word tokenization: first word of the first " +
        "sentence; punctuation splits sentences"))

  test("qtest conformance: parse_url components and sentences " +
      "tokenization") {
    run("udf_parse_url", "udf_sentences")
  }
}
