package graft.functions

import graft.SparkSpec

/** Completeness check against SURVEY §2.5/§2.3/§2.6: every public Hive
  * function name in the capability surface resolves in an engine session —
  * either a Spark builtin or a graft registration. (Existence, not arity;
  * behavior is covered by the oracle queries and per-family specs.)
  */
class FunctionSurfaceSpec extends SparkSpec {

  private val hiveNames = Seq(
    // string
    "concat", "concat_ws", "substr", "substring", "substring_index", "space",
    "repeat", "ascii", "lpad", "rpad", "levenshtein", "soundex", "upper",
    "lower", "ucase", "lcase", "mid", "trim", "ltrim", "rtrim", "length",
    "char_length", "character_length", "octet_length", "reverse",
    "find_in_set", "initcap", "like", "rlike", "regexp_replace",
    "regexp_extract", "replace", "parse_url", "split", "str_to_map",
    "translate", "instr", "locate", "position", "elt", "format_number",
    "printf", "sentences", "encode", "decode", "base64", "unbase64", "hex",
    "unhex", "conv", "bin", "chr", "field", "quote", "likeany", "likeall",
    // math
    "round", "bround", "floor", "ceil", "ceiling", "sqrt", "cbrt", "rand",
    "abs", "pmod", "ln", "log2", "log10", "log", "exp", "power", "pow",
    "sign", "pi", "e", "degrees", "radians", "sin", "asin", "sinh", "cos",
    "acos", "cosh", "tan", "atan", "tanh", "factorial", "shiftleft",
    "shiftright", "shiftrightunsigned", "greatest", "least", "width_bucket",
    // date/time
    "day", "dayofmonth", "dayofweek", "month", "quarter", "year", "hour",
    "minute", "second", "weekofyear", "from_unixtime", "unix_timestamp",
    "to_unix_timestamp", "to_date", "last_day", "next_day", "trunc",
    "date_format", "date_add", "date_sub", "datediff", "add_months",
    "months_between", "from_utc_timestamp", "to_utc_timestamp",
    "current_date", "current_timestamp", "to_epoch_milli", "tumbling_window",
    "floor_year", "floor_quarter", "floor_month", "floor_week", "floor_day",
    "floor_hour", "floor_minute", "floor_second", "date_trunc",
    "cast_format",
    // conditional / null
    "if", "nvl", "nvl2", "nullif", "coalesce", "isnull", "isnotnull",
    "istrue", "isnottrue", "isfalse", "isnotfalse", "assert_true",
    // complex types
    "size", "array", "map", "struct", "named_struct", "create_union",
    "extract_union", "sort_array", "sort_array_by", "array_contains",
    "array_min", "array_max", "array_distinct", "array_join", "array_except",
    "array_intersect", "array_union", "array_remove", "array_position",
    "array_append", "array_compact", "map_keys", "map_values", "slice",
    "array_slice",
    // json/xml
    "get_json_object", "json_tuple", "from_json", "to_json", "schema_of_json",
    "xpath", "xpath_string", "xpath_boolean", "xpath_double", "xpath_float",
    "xpath_long", "xpath_int", "xpath_short", "xpath_number",
    // hash/crypto/masking
    "crc32", "md5", "sha1", "sha", "sha2", "aes_encrypt", "aes_decrypt",
    "uuid", "hash", "xxhash64", "murmur_hash", "mask", "mask_first_n",
    "mask_last_n", "mask_show_first_n", "mask_show_last_n", "mask_hash",
    // misc
    "grouping", "grouping_id", "current_database", "current_user",
    "surrogate_key", "version", "reflect", "java_method", "typeof",
    "monotonically_increasing_id", "input_file_name", "spark_partition_id",
    // aggregates
    "max", "min", "sum", "count", "avg", "mean", "stddev", "stddev_pop",
    "stddev_samp", "variance", "var_pop", "var_samp", "covar_pop",
    "covar_samp", "corr", "regr_slope", "regr_intercept", "regr_r2",
    "regr_sxx", "regr_syy", "regr_sxy", "regr_avgx", "regr_avgy",
    "regr_count", "histogram_numeric", "percentile", "percentile_approx",
    "approx_count_distinct", "collect_set", "collect_list", "ngrams",
    "context_ngrams", "bloom_filter", "in_bloom_filter", "median", "mode",
    "first", "last", "first_value", "last_value", "any_value", "count_if",
    "bool_and", "bool_or", "bit_and", "bit_or", "bit_xor", "skewness",
    "kurtosis",
    // windows
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist", "ntile",
    "lead", "lag",
    // UDTFs
    "explode", "posexplode", "explode_outer", "posexplode_outer", "inline",
    "stack", "parse_url_tuple", "replicate_rows")

  test("every Hive-surface function name resolves") {
    HiveFunctions.registerAll(spark)
    NGramAggregates.register(spark)
    val missing = hiveNames.filterNot { n =>
      try {
        spark.sessionState.catalog.lookupFunctionInfo(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)) != null
      } catch { case _: Exception => false }
    }
    assert(missing.isEmpty, s"unresolved functions: ${missing.mkString(", ")}")
  }

  test("reflect/java_method resolve but refuse with the documented error") {
    HiveFunctions.registerAll(spark)
    Seq("reflect", "java_method").foreach { name =>
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT $name('java.lang.System', 'getProperty', 'user.dir')")
          .collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("disabled") && msg.contains("reflection"),
        s"$name must fail with the documented refusal, got: $e")
    }
  }

  test("every geospatial ST_* surface name resolves") {
    GeoFunctions.registerAll(spark)
    val stNames = Seq(
      "st_point", "st_geomfromtext", "st_astext", "st_linestring",
      "st_polygon", "st_multipoint", "st_asbinary", "st_geomfromwkb",
      "st_asgeojson", "st_asjson", "st_geomfromgeojson", "st_geomfromjson",
      "st_geometrytype", "st_x", "st_y", "st_minx",
      "st_miny", "st_maxx", "st_maxy", "st_numpoints", "st_pointn",
      "st_startpoint", "st_endpoint", "st_numgeometries", "st_geometryn",
      "st_exteriorring", "st_numinteriorring", "st_interiorringn",
      "st_isempty", "st_isclosed", "st_isring", "st_dimension",
      "st_coorddim", "st_is3d", "st_ismeasured", "st_srid", "st_setsrid",
      "st_envelope", "st_centroid", "st_boundary", "st_area", "st_length",
      "st_distance", "st_distancesphere", "st_geodesiclengthwgs84",
      "st_equals", "st_intersects", "st_disjoint", "st_contains",
      "st_within", "st_touches", "st_crosses", "st_overlaps",
      "st_envintersects", "st_convexhull", "st_buffer", "st_intersection",
      "st_bin", "st_binenvelope", "st_aggr_convexhull")
    val missing = stNames.filterNot { n =>
      try {
        spark.sessionState.catalog.lookupFunctionInfo(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)) != null
      } catch { case _: Exception => false }
    }
    assert(missing.isEmpty, s"unresolved ST functions: ${missing.mkString(", ")}")
  }

  test("parameterized queries (prepared-statement analog)") {
    graft.Engine.register(spark, sfDir)
    val named = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > :lo AND o_orderstatus = :st",
      Map("lo" -> 100000, "st" -> "O")).head().getLong(0)
    val positional = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > ? AND o_orderstatus = ?",
      Array(100000, "O")).head().getLong(0)
    assert(named === positional && named > 0)
  }
}
