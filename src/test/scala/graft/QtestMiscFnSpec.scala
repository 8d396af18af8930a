package graft

/** Conformance wave: aes_encrypt/aes_decrypt and width_bucket — ref
  * ql/src/test/queries/clientpositive/udf_aes_encrypt.q,
  * udf_aes_decrypt.q, udf_width_bucket.q, cells transcribed from
  * results/clientpositive/llap.
  *
  * Finding fixed in HiveFunctions: Hive's 2-arg aes_encrypt/aes_decrypt
  * is DETERMINISTIC AES/ECB/PKCS5 answering NULL on a bad key, where
  * Spark's 2-arg default is random-IV GCM (never comparable run to run)
  * and raises on key errors — the Hive spelling now pins ECB + TryEval.
  */
class QtestMiscFnSpec extends QtestHarness {

  private def h(file: String, name: String, sql: String,
      expected: Seq[String], note: String = "") =
    QCase(file, name, sql, duck = Some(""), hive = Some(expected),
      note = note)

  protected val qcases: Seq[QCase] = Seq(
    h("udf_aes_encrypt.q", "aes1",
      "select base64(aes_encrypt('ABC', '1234567890123456')), " +
        "base64(aes_encrypt('', '1234567890123456')), " +
        "base64(aes_encrypt(binary('ABC'), binary('1234567890123456'))), " +
        "aes_encrypt('ABC', cast(null as string))",
      Seq("y6Ss+zCYObpCbgfWfyNWTw==", "BQGHoM3lqYcsurCRq3PlUw==",
        "y6Ss+zCYObpCbgfWfyNWTw==", "NULL"),
      note = "deterministic ECB ciphertexts (the wave's finding)"),
    h("udf_aes_encrypt.q", "aes2",
      "select aes_encrypt('ABC', '12345678901234567'), " +
        "aes_encrypt(binary('ABC'), binary('123456789012345')), " +
        "aes_encrypt('ABC', '')",
      Seq("NULL", "NULL", "NULL"),
      note = "bad key lengths answer NULL, never an error"),
    h("udf_aes_decrypt.q", "aes3",
      "select CAST(aes_decrypt(unbase64('y6Ss+zCYObpCbgfWfyNWTw=='), " +
        "'1234567890123456') AS STRING), " +
        "aes_decrypt(unbase64('BQGHoM3lqYcsurCRq3PlUw=='), " +
        "'1234567890123456') = binary(''), " +
        "aes_decrypt(unbase64('y6Ss+zCYObpCbgfWfyNWTw=='), '')",
      Seq("ABC", "true", "NULL"),
      note = "round-trips the encrypt wave's ciphertexts"),

    h("udf_width_bucket.q", "wb1",
      "select width_bucket(1, 5, 25, 4), width_bucket(10, 5, 25, 4), " +
        "width_bucket(20, 5, 25, 4), width_bucket(30, 5, 25, 4)",
      Seq("0", "2", "4", "5")),
    h("udf_width_bucket.q", "wb2",
      "select width_bucket(1, NULL, 25, 4), width_bucket(NULL, 5, 25, 4), " +
        "width_bucket(20, 5, NULL, 4), width_bucket(30, 5, 25, NULL)",
      Seq("NULL", "NULL", "NULL", "NULL")),
    h("udf_width_bucket.q", "wb3",
      "select width_bucket(-1, -25, -5, 4), width_bucket(-10, -25, -5, 4), " +
        "width_bucket(-20, -25, -5, 4), width_bucket(-30, -25, -5, 4)",
      Seq("5", "4", "2", "0")),
    h("udf_width_bucket.q", "wb4",
      "select width_bucket(1, 25, 5, 4), width_bucket(10, 25, 5, 4), " +
        "width_bucket(20, 25, 5, 4), width_bucket(30, 25, 5, 4)",
      Seq("5", "4", "2", "0"),
      note = "DESCENDING bounds bucket from the high end"),
    h("udf_width_bucket.q", "wb5",
      "select width_bucket(0.1, 0, 1, 10), width_bucket(0.25, 0, 1, 10), " +
        "width_bucket(0.3456, 0, 1, 10), width_bucket(0.654321, 0, 1, 10), " +
        "width_bucket(0.1, 1, 0, 10), width_bucket(0.654321, 1, 0, 10)",
      Seq("2", "3", "4", "7", "10", "4")))

  test("qtest conformance: aes_encrypt/decrypt ECB determinism + NULL " +
      "key contract; width_bucket incl. descending bounds") {
    run("udf_aes", "udf_width_bucket")
  }
}
