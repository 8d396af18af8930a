package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine
import QDef.q

/** Scalar + aggregate function surface (SURVEY §2.3/§2.5). Each query packs a
  * family of Hive functions into one verifiable projection; the oracle is the
  * DuckDB-dialect equivalent (function names differ, semantics matched).
  * Functions with engine-specific algorithms (approx_count_distinct,
  * percentile_approx, histogram_numeric, crc32, xxhash) are covered by
  * ScalaTest instead of the oracle.
  */
object FunctionQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(spark, dir, name)

  private def sqlQ(sql: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { Engine.register(spark, dir); spark.sql(sql) }

  val defs: Seq[QDef] = Seq(

    q("f01_string_basic",
      """SELECT c_custkey,
        |  upper(c_name) AS u, lower(c_name) AS l,
        |  substr(c_name, 10, 4) AS sub,
        |  CAST(length(c_name) AS INT) AS len,
        |  reverse(c_mktsegment) AS rev,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        |  rpad(c_mktsegment, 12, '.') AS rp,
        |  concat_ws('|', c_name, c_mktsegment) AS cw,
        |  replace(c_name, 'Customer', 'Cust') AS rep,
        |  trim(concat(' ', c_name, ' ')) AS tr,
        |  CAST(instr(c_name, '#') AS INT) AS ipos,
        |  split_part(c_name, '#', 2) AS spart,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS trans,
        |  upper(substr(c_mktsegment,1,1)) || lower(substr(c_mktsegment,2)) AS icap,
        |  repeat(substr(c_mktsegment,1,2), 3) AS rep3
        |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "customer").filter($"c_custkey" < 50)
        .select($"c_custkey",
          upper($"c_name").as("u"), lower($"c_name").as("l"),
          substring($"c_name", 10, 4).as("sub"),
          length($"c_name").as("len"),
          reverse($"c_mktsegment").as("rev"),
          lpad($"c_custkey".cast("string"), 8, "0").as("pad"),
          rpad($"c_mktsegment", 12, ".").as("rp"),
          concat_ws("|", $"c_name", $"c_mktsegment").as("cw"),
          regexp_replace($"c_name", "Customer", "Cust").as("rep"),
          trim(concat(lit(" "), $"c_name", lit(" "))).as("tr"),
          instr($"c_name", "#").as("ipos"),
          expr("split_part(c_name, '#', 2)").as("spart"),
          translate($"c_mktsegment", "AEIOU", "aeiou").as("trans"),
          initcap(lower($"c_mktsegment")).as("icap"),
          repeat(substring($"c_mktsegment", 1, 2), 3).as("rep3"))
        .orderBy($"c_custkey")
    },

    q("f02_string_regex",
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+) (\w+)$', 1) AS adj,
        |  regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS noun,
        |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS novowel,
        |  regexp_matches(p_name, '^b') AS starts_b,
        |  CASE WHEN p_brand LIKE 'Brand#1%' THEN 1 ELSE 0 END AS is_b1
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "part").filter($"p_partkey" < 200)
        .select($"p_partkey",
          regexp_extract($"p_name", "^(\\w+) (\\w+)$", 1).as("adj"),
          regexp_extract($"p_name", "^(\\w+) (\\w+)$", 2).as("noun"),
          regexp_replace($"p_type", "[AEIOU]", "_").as("novowel"),
          $"p_name".rlike("^b").as("starts_b"),
          when($"p_brand".like("Brand#1%"), 1).otherwise(0).as("is_b1"))
        .orderBy($"p_partkey")
    },

    q("f03_string_hash",
      """SELECT r_regionkey,
        |  md5(r_name) AS h_md5,
        |  sha256(r_name) AS h_sha256,
        |  to_base64(CAST(r_name AS BLOB)) AS b64,
        |  upper(hex(CAST(r_name AS BLOB))) AS hx,
        |  CAST(ascii(r_name) AS INT) AS asc_first,
        |  chr(65 + r_regionkey) AS ch
        |FROM region ORDER BY r_regionkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "region")
        .select($"r_regionkey",
          md5($"r_name".cast("binary")).as("h_md5"),
          sha2($"r_name".cast("binary"), 256).as("h_sha256"),
          base64($"r_name".cast("binary")).as("b64"),
          upper(hex($"r_name".cast("binary"))).as("hx"),
          ascii($"r_name").as("asc_first"),
          chr(lit(65) + $"r_regionkey").as("ch"))
        .orderBy($"r_regionkey")
    },

    q("f04_math",
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS r1,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  abs(p_size - 20) AS ab,
        |  round(power(p_size, 2), 4) AS pw,
        |  round(sqrt(p_retailprice), 6) AS sq,
        |  round(ln(p_retailprice), 6) AS lg,
        |  round(log10(p_retailprice), 6) AS l10,
        |  round(log2(p_retailprice), 6) AS l2,
        |  round(exp(p_size / 100.0), 6) AS ex,
        |  CAST(sign(p_size - 20) AS DOUBLE) AS sg,
        |  p_partkey % 7 AS pm,
        |  round(degrees(p_size / 10.0), 6) AS dg,
        |  round(radians(p_size), 6) AS rd,
        |  round(cbrt(p_retailprice), 6) AS cb,
        |  greatest(p_size, 25) AS gr, least(p_size, 25) AS le
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey",
          round($"p_retailprice", 1).as("r1"),
          floor($"p_retailprice").as("fl"),
          ceil($"p_retailprice").as("ce"),
          abs($"p_size" - 20).as("ab"),
          round(pow($"p_size", 2), 4).as("pw"),
          round(sqrt($"p_retailprice"), 6).as("sq"),
          round(log($"p_retailprice"), 6).as("lg"),
          round(log10($"p_retailprice"), 6).as("l10"),
          round(log2($"p_retailprice"), 6).as("l2"),
          round(exp($"p_size" / 100.0), 6).as("ex"),
          signum($"p_size" - 20).as("sg"),
          pmod($"p_partkey", lit(7)).as("pm"),
          round(degrees($"p_size" / 10.0), 6).as("dg"),
          round(radians($"p_size"), 6).as("rd"),
          round(cbrt($"p_retailprice"), 6).as("cb"),
          greatest($"p_size", lit(25)).as("gr"),
          least($"p_size", lit(25)).as("le"))
        .orderBy($"p_partkey")
    },

    q("f05_datetime",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon_start,
        |  strftime(CASE WHEN CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
        |    THEN last_day(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE))
        |    ELSE CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) END, '%Y-%m-%d') AS plus3m,
        |  strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS plus30d,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS dd,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "orders").filter($"o_orderkey" < 200)
        .select($"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("d"),
          quarter($"o_orderdate").as("q"),
          dayofweek($"o_orderdate").as("dow"),
          weekofyear($"o_orderdate").as("woy"),
          dayofyear($"o_orderdate").as("doy"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("mon_start"),
          date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd").as("plus3m"),
          date_format(date_add($"o_orderdate", 30), "yyyy-MM-dd").as("plus30d"),
          date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("eom"),
          datediff(to_date(lit("2000-01-01")), $"o_orderdate").as("dd"),
          unix_timestamp($"o_orderdate").as("unix_s"),
          date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("fmt"))
        .orderBy($"o_orderkey")
    },

    q("f06_conditional",
      """SELECT c_custkey,
        |  CASE c_mktsegment WHEN 'BUILDING' THEN 'B' WHEN 'AUTOMOBILE' THEN 'A'
        |    ELSE 'X' END AS seg_code,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low'
        |    ELSE 'high' END AS bal_bucket,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'none') AS seg_nn,
        |  round(greatest(c_acctbal, 0.0), 2) AS bal_pos,
        |  round(least(c_acctbal, 1000.0), 2) AS bal_cap,
        |  CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'neg' END AS sgn,
        |  (c_acctbal IS NULL) AS isn, (c_acctbal IS NOT NULL) AS isnn,
        |  (c_acctbal BETWEEN 0 AND 1000) AS in_range,
        |  (c_nationkey IN (0, 1, 2)) AS in_set
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "customer").filter($"c_custkey" < 100)
        .select($"c_custkey",
          when($"c_mktsegment" === "BUILDING", "B")
            .when($"c_mktsegment" === "AUTOMOBILE", "A")
            .otherwise("X").as("seg_code"),
          when($"c_acctbal" < 0, "neg").when($"c_acctbal" < 5000, "low")
            .otherwise("high").as("bal_bucket"),
          coalesce(nullif($"c_mktsegment", lit("MACHINERY")), lit("none")).as("seg_nn"),
          round(greatest($"c_acctbal", lit(0.0)), 2).as("bal_pos"),
          round(least($"c_acctbal", lit(1000.0)), 2).as("bal_cap"),
          expr("if(c_acctbal > 0, 'pos', 'neg')").as("sgn"),
          $"c_acctbal".isNull.as("isn"),
          $"c_acctbal".isNotNull.as("isnn"),
          $"c_acctbal".between(0, 1000).as("in_range"),
          $"c_nationkey".isin(0, 1, 2).as("in_set"))
        .orderBy($"c_custkey")
    },

    q("f07_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .select(get_json_object($"props", "$.k").cast("int").as("k"), $"value")
        .groupBy($"k")
        .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("total"))
        .orderBy($"k")
    },

    q("f08_array",
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_words,
        |  list_contains(string_split(text,' '), 'the') AS has_the,
        |  CAST(coalesce(list_position(string_split(text,' '), 'the'), 0) AS BIGINT) AS pos_the,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_uniq,
        |  array_to_string(string_split(text,' ')[1:3], '-') AS first3,
        |  list_min(string_split(text,' ')) AS wmin,
        |  list_max(string_split(text,' ')) AS wmax
        |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents").filter($"doc_id" < 30)
        .withColumn("words", split($"text", " "))
        .select($"doc_id",
          size($"words").as("n_words"),
          array_contains($"words", "the").as("has_the"),
          array_position($"words", "the").as("pos_the"),
          size(array_distinct($"words")).as("n_uniq"),
          array_join(slice($"words", 1, 3), "-").as("first3"),
          array_min($"words").as("wmin"),
          array_max($"words").as("wmax"))
        .orderBy($"doc_id")
    },

    q("f09_agg_stats",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity),4) AS sd_s,
        |  round(stddev_pop(l_quantity),4) AS sd_p,
        |  round(var_samp(l_quantity),4) AS var_s,
        |  round(var_pop(l_quantity),4) AS var_p,
        |  round(corr(l_quantity, l_extendedprice),6) AS cr,
        |  round(covar_pop(l_quantity, l_extendedprice),2) AS cv_p,
        |  round(covar_samp(l_quantity, l_extendedprice),2) AS cv_s,
        |  round(min(l_quantity),2) AS mn, round(max(l_quantity),2) AS mx,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_s"),
          round(stddev_pop($"l_quantity"), 4).as("sd_p"),
          round(var_samp($"l_quantity"), 4).as("var_s"),
          round(var_pop($"l_quantity"), 4).as("var_p"),
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("cr"),
          round(covar_pop($"l_quantity", $"l_extendedprice"), 2).as("cv_p"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 2).as("cv_s"),
          round(min($"l_quantity"), 2).as("mn"),
          round(max($"l_quantity"), 2).as("mx"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // Linear-regression family. The regr_* builtins use order-dependent
    // double accumulation (Welford central moments), so their last bits vary
    // with partition count and round() can flip at a boundary — the builtins
    // are therefore verified in ScalaTest (AggregateSemanticsSpec) against
    // these exact formulas, while the oracled query computes the same
    // quantities from exact DECIMAL sums. All derived values are produced by
    // identical IEEE expressions in both engines, so results are bit-stable.
    // x = l_quantity (integral), y = l_extendedprice (2-decimal quantized).
    q("f10_agg_regr",
      """WITH s AS (
        |  SELECT l_linestatus,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(15,2)) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(15,2)) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(25,4)) AS sxx2,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,4)) AS syy2,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,4)) AS sxy2
        |  FROM lineitem GROUP BY l_linestatus),
        |w AS (
        |  SELECT l_linestatus, n, sxx2, syy2, sxy2,
        |    CAST(sx AS DECIMAL(19,2)) AS sx, CAST(sy AS DECIMAL(19,2)) AS sy
        |  FROM s),
        |d AS (
        |  SELECT l_linestatus, n,
        |    CAST(CAST(n AS DECIMAL(10,0)) * sxx2 - CAST(sx * sx AS DECIMAL(31,4)) AS DOUBLE) AS nsxx,
        |    CAST(CAST(n AS DECIMAL(10,0)) * syy2 - CAST(sy * sy AS DECIMAL(31,4)) AS DOUBLE) AS nsyy,
        |    CAST(CAST(n AS DECIMAL(10,0)) * sxy2 - CAST(sx * sy AS DECIMAL(31,4)) AS DOUBLE) AS nsxy,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, CAST(n AS DOUBLE) AS nd
        |  FROM w)
        |SELECT l_linestatus,
        |  nsxy / nsxx AS slope,
        |  (syd - (nsxy / nsxx) * sxd) / nd AS icept,
        |  (nsxy * nsxy) / (nsxx * nsyy) AS r2,
        |  n,
        |  sxd / nd AS avgx,
        |  syd / nd AS avgy,
        |  nsxx / nd AS sxx,
        |  nsyy / nd AS syy,
        |  nsxy / nd AS sxy
        |FROM d ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      val x = $"l_quantity".cast(DecimalType(12, 2))
      val y = $"l_extendedprice".cast(DecimalType(12, 2))
      val s = t(spark, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DecimalType(15, 2)).as("sx"),
          sum(y).cast(DecimalType(15, 2)).as("sy"),
          sum(x * x).cast(DecimalType(25, 4)).as("sxx2"),
          sum(y * y).cast(DecimalType(25, 4)).as("syy2"),
          sum(x * y).cast(DecimalType(25, 4)).as("sxy2"))
      val d = s.select($"l_linestatus", $"n",
        ($"n".cast(DecimalType(10, 0)) * $"sxx2"
          - ($"sx" * $"sx").cast(DecimalType(31, 4))).cast("double").as("nsxx"),
        ($"n".cast(DecimalType(10, 0)) * $"syy2"
          - ($"sy" * $"sy").cast(DecimalType(31, 4))).cast("double").as("nsyy"),
        ($"n".cast(DecimalType(10, 0)) * $"sxy2"
          - ($"sx" * $"sy").cast(DecimalType(31, 4))).cast("double").as("nsxy"),
        $"sx".cast("double").as("sxd"), $"sy".cast("double").as("syd"),
        $"n".cast("double").as("nd"))
      d.select($"l_linestatus",
        ($"nsxy" / $"nsxx").as("slope"),
        (($"syd" - ($"nsxy" / $"nsxx") * $"sxd") / $"nd").as("icept"),
        (($"nsxy" * $"nsxy") / ($"nsxx" * $"nsyy")).as("r2"),
        $"n",
        ($"sxd" / $"nd").as("avgx"),
        ($"syd" / $"nd").as("avgy"),
        ($"nsxx" / $"nd").as("sxx"),
        ($"nsyy" / $"nd").as("syy"),
        ($"nsxy" / $"nd").as("sxy"))
        .orderBy($"l_linestatus")
    },

    // Exact percentiles (Hive percentile/percentile_cont/percentile_disc,
    // ref FunctionRegistry.java:553-579).
    q("f11_agg_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5),4) AS p50,
        |  round(quantile_cont(l_quantity, 0.25),4) AS p25,
        |  round(quantile_disc(l_quantity, 0.75),4) AS p75d,
        |  round(median(l_quantity),4) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )(sqlQ(
      """SELECT l_returnflag,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity),4) AS p50,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity),4) AS p25,
        |  round(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity),4) AS p75d,
        |  round(median(l_quantity),4) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // collect_set with canonical ordering (ref GenericUDAFCollectSet).
    q("f12_agg_collect",
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs,
        |  count(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "customer")
        .groupBy($"c_nationkey")
        .agg(concat_ws(",", array_sort(collect_set($"c_mktsegment"))).as("segs"),
          count(lit(1)).as("n"))
        .orderBy($"c_nationkey")
    },

    // Hive-gap functions registered by graft.functions.HiveFunctions,
    // exercised through the SQL surface and cross-checked in DuckDB via
    // equivalent rewrites.
    q("f14_hive_string_gaps",
      """SELECT c_custkey,
        |  CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'AUTOMOBILE' THEN 2
        |    WHEN 'MACHINERY' THEN 3 ELSE 0 END AS f,
        |  concat(regexp_replace(regexp_replace(regexp_replace(substr(c_name,1,4),
        |    '[A-Z]','X','g'), '[a-z]','x','g'), '[0-9]','n','g'), substr(c_name,5)) AS m4,
        |  (c_mktsegment LIKE 'B%' OR c_mktsegment LIKE 'A%') AS la,
        |  (c_mktsegment LIKE 'B%' AND c_mktsegment LIKE '%G') AS ll,
        |  coalesce(c_acctbal > 0, false) AS it,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
        |    THEN 'other' ELSE 'bldg' END AS nv,
        |  sha256(c_mktsegment) AS mh
        |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey,
        |  field(c_mktsegment, 'BUILDING', 'AUTOMOBILE', 'MACHINERY') AS f,
        |  mask_first_n(c_name, 4) AS m4,
        |  likeany(c_mktsegment, 'B%', 'A%') AS la,
        |  likeall(c_mktsegment, 'B%', '%G') AS ll,
        |  istrue(c_acctbal > 0) AS it,
        |  nvl2(nullif(c_mktsegment, 'BUILDING'), 'other', 'bldg') AS nv,
        |  mask_hash(c_mktsegment) AS mh
        |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin)),

    q("f15_hive_time_gaps",
      """SELECT o_orderkey,
        |  CAST(epoch_ms(o_orderdate) AS BIGINT) AS em,
        |  strftime(date_trunc('year', o_orderdate), '%Y-%m-%d %H:%M:%S') AS fy,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS fm,
        |  strftime(time_bucket(INTERVAL '7 days', o_orderdate,
        |    TIMESTAMP '1970-01-01'), '%Y-%m-%d %H:%M:%S') AS tw
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin
    )(sqlQ(
      """SELECT o_orderkey,
        |  to_epoch_milli(o_orderdate) AS em,
        |  date_format(floor_year(o_orderdate), 'yyyy-MM-dd HH:mm:ss') AS fy,
        |  date_format(floor_month(o_orderdate), 'yyyy-MM-dd HH:mm:ss') AS fm,
        |  date_format(tumbling_window(o_orderdate, INTERVAL 7 DAYS),
        |    'yyyy-MM-dd HH:mm:ss') AS tw
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin)),

    // More of the string surface: levenshtein, find_in_set, format_number,
    // str_to_map, sentences-adjacent splitting.
    q("f16_string_more",
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, 'cold widget') AS INT) AS lev,
        |  CASE WHEN list_contains(string_split('PROMO,ECONOMY,LARGE', ','), p_type)
        |    THEN CAST(list_position(string_split('PROMO,ECONOMY,LARGE', ','), p_type) AS INT)
        |    ELSE 0 END AS fis,
        |  format('{:.2f}', CAST(p_retailprice AS DECIMAL(18,2))) AS fmt,
        |  CAST(len(string_split(p_type, 'O')) - 1 AS INT) AS n_os
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey",
          levenshtein($"p_name", lit("cold widget")).as("lev"),
          expr("find_in_set(p_type, 'PROMO,ECONOMY,LARGE')").as("fis"),
          format_string("%.2f", $"p_retailprice").as("fmt"),
          (size(split($"p_type", "O")) - 1).as("n_os"))
        .orderBy($"p_partkey")
    },

    // Algorithm-specific approximations: no cross-engine oracle; bounds are
    // asserted in ScalaTest (ApproxSpec). Array outputs are serialized to
    // JSON strings — the driver's rows-only pass still sorts the result
    // frame, and raw array cells are unsortable/unhashable there.
    QDef.rowsOnly("f17_approx_aggs") { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey").as("approx_parts"),
          percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("p50_approx"),
          to_json(expr("histogram_numeric(l_quantity, 5)")).as("hist"))
        .orderBy($"l_returnflag")
    },

    // ds_* DataSketches families (ref DataSketchesFunctions.java:316-360):
    // per-group hll/cpc/theta sketches of l_partkey, rolled up via
    // SKETCH-TO-SKETCH union — the pre-aggregated distinct-count shape.
    // Estimates are approximate (no cross-engine oracle exists) → golden
    // gate; the in-query requires pin the 5% accuracy envelope against
    // the exact distinct count, and the mergeability law is spec-asserted
    // (ApproxSpec).
    QDef.rowsOnly("f33_ds_sketch_families") { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").createOrReplaceTempView("f33_lineitem")
      val df = spark.sql(
        """SELECT l_returnflag,
          |  CAST(round(ds_hll_estimate(
          |    ds_hll_sketch(CAST(l_partkey AS STRING)))) AS BIGINT) AS hll_d,
          |  CAST(round(ds_cpc_estimate(
          |    ds_cpc_sketch(CAST(l_partkey AS STRING)))) AS BIGINT) AS cpc_d,
          |  CAST(round(ds_theta_estimate(
          |    ds_theta_sketch(CAST(l_partkey AS STRING)))) AS BIGINT) AS theta_d
          |FROM f33_lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
          .stripMargin)
      val exact = spark.sql(
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS d
          |FROM f33_lineitem GROUP BY l_returnflag""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      df.collect().foreach { r =>
        val ex = exact(r.getString(0)).toDouble
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)).foreach(est =>
          require(math.abs(est - ex) / ex < 0.05,
            s"sketch estimate $est outside 5% of exact $ex " +
              s"for flag ${r.getString(0)}"))
      }
      // the union roll-up estimates the global distinct from the
      // per-group sketches alone
      val global = spark.sql(
        """SELECT CAST(round(ds_hll_estimate(ds_hll_union(sk))) AS BIGINT) AS d
          |FROM (SELECT ds_hll_sketch(CAST(l_partkey AS STRING)) AS sk
          |      FROM f33_lineitem GROUP BY l_returnflag)""".stripMargin)
        .head().getLong(0)
      val globalExact = spark.sql(
        "SELECT count(DISTINCT l_partkey) FROM f33_lineitem").head().getLong(0)
      require(math.abs(global - globalExact).toDouble / globalExact < 0.05,
        s"union roll-up $global outside 5% of exact $globalExact")
      df
    },

    // ds_kll + ds_freq families (the remaining DataSketchesFunctions.java
    // rows): the OUTPUT is the frequent-items estimates, which are EXACT
    // here (3 distinct flags, no map eviction) and so replay in DuckDB as
    // plain counts — a true oracle over the sketch/union/estimate path.
    // KLL estimates are randomized (compaction coin flips) so they stay
    // out of the output; the in-query requires pin their accuracy and the
    // mergeability law instead.
    q("f34_ds_kll_freq",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS freq_est
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "lineitem").createOrReplaceTempView("f34_lineitem")
      // kll accuracy + mergeability (union of per-group sketches): pinned
      // in-query, not in the output (randomized compaction)
      val r = spark.sql(
        """SELECT
          |  ds_kll_quantile(ds_kll_sketch(l_quantity), 0.5d) AS whole_med,
          |  ds_kll_rank(ds_kll_sketch(l_quantity), 25.0d) AS r25,
          |  ds_kll_n(ds_kll_sketch(l_quantity)) AS n
          |FROM f34_lineitem""".stripMargin).head()
      val exactMed = spark.sql(
        "SELECT percentile(l_quantity, 0.5d) FROM f34_lineitem")
        .head().getDouble(0)
      val total = spark.sql("SELECT count(*) FROM f34_lineitem")
        .head().getLong(0)
      require(math.abs(r.getDouble(0) - exactMed) / exactMed < 0.10,
        s"kll median ${r.getDouble(0)} outside 10% of exact $exactMed")
      require(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0,
        s"kll rank of an in-range value must be in (0,1): ${r.getDouble(1)}")
      require(r.getLong(2) == total,
        s"kll n ${r.getLong(2)} != row count $total")
      val unionMed = spark.sql(
        """SELECT ds_kll_quantile(ds_kll_union(sk), 0.5d) FROM (
          |  SELECT ds_kll_sketch(l_quantity) AS sk
          |  FROM f34_lineitem GROUP BY l_returnflag)""".stripMargin)
        .head().getDouble(0)
      require(math.abs(unionMed - exactMed) / exactMed < 0.10,
        s"kll union-of-partials median $unionMed outside 10% of $exactMed")
      // the OUTPUT: frequency estimates via sketch -> union -> estimate,
      // exact at this cardinality, replayed by DuckDB as counts
      spark.sql(
        """WITH sk AS (
          |  SELECT ds_freq_union(s) AS s FROM (
          |    SELECT ds_freq_sketch(l_returnflag) AS s
          |    FROM f34_lineitem GROUP BY l_linestatus))
          |SELECT f.l_returnflag,
          |  ds_freq_estimate(sk.s, f.l_returnflag) AS freq_est
          |FROM (SELECT DISTINCT l_returnflag FROM f34_lineitem) f
          |CROSS JOIN sk ORDER BY f.l_returnflag""".stripMargin)
    },

    // ds_tuple family (the ArrayOfDoubles tuple row of
    // DataSketchesFunctions.java): distinct keys + per-key summed double
    // summary. At this key cardinality (3 flags << nominal entries) theta
    // stays 1 — nothing sampled — so the estimate and the summary total
    // are EXACT and replay in DuckDB as count(DISTINCT)/sum.
    q("f35_ds_tuple",
      """SELECT CAST(count(DISTINCT l_returnflag) AS DOUBLE) AS n_keys,
        |  CAST(sum(l_quantity) AS DOUBLE) AS qty_total
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      t(spark, dir, "lineitem").createOrReplaceTempView("f35_lineitem")
      // mergeability pinned in-query: union of per-group sketches must
      // estimate identically to one sketch over the whole table
      val whole = spark.sql(
        """SELECT ds_tuple_estimate(ds_tuple_sketch(l_returnflag, l_quantity))
          |FROM f35_lineitem""".stripMargin).head().getDouble(0)
      val unioned = spark.sql(
        """SELECT ds_tuple_estimate(ds_tuple_union(s)) FROM (
          |  SELECT ds_tuple_sketch(l_returnflag, l_quantity) AS s
          |  FROM f35_lineitem GROUP BY l_linestatus)""".stripMargin)
        .head().getDouble(0)
      require(whole == unioned,
        s"tuple union-of-partials $unioned != whole-table sketch $whole")
      spark.sql(
        """WITH sk AS (
          |  SELECT ds_tuple_union(s) AS s FROM (
          |    SELECT ds_tuple_sketch(l_returnflag, l_quantity) AS s
          |    FROM f35_lineitem GROUP BY l_linestatus))
          |SELECT ds_tuple_estimate(sk.s) AS n_keys,
          |  ds_tuple_sum(sk.s) AS qty_total
          |FROM sk""".stripMargin)
    },

    // sentences() tokenizer (Hive GenericUDFSentences) + ngrams UDAF,
    // exploded to one row per top bigram. The synthetic documents are
    // single-space-separated ASCII words, so the oracle replays the
    // tokenization as a plain split and the ngrams estimator (which never
    // prunes here: distinct bigrams ≪ k*pf*2) as an exact count with the
    // same (freq DESC, bigram ASC) tie-break.
    QDef.q("f18_sentences_ngrams",
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
        |  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w))
        |SELECT bigram, CAST(cnt AS DOUBLE) AS freq FROM (
        |  SELECT bigram, count(*) AS cnt FROM g GROUP BY bigram
        |  ORDER BY cnt DESC, bigram LIMIT 10)
        |ORDER BY freq DESC, bigram""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Engine.register(spark, dir)
      spark.sql(
        """SELECT concat_ws(' ', g.ngram) AS bigram, g.estfrequency AS freq FROM (
          |  SELECT explode(tops) AS g FROM (
          |    SELECT ngrams(sentences(concat(text, '.')), 2, 10, 100) AS tops
          |    FROM documents))
          |ORDER BY freq DESC, bigram""".stripMargin)
    },

    // Trigonometric family (sinh/cosh/tanh are DuckDB-absent; emulated from
    // exp in the oracle — same IEEE formulae, round 6).
    q("f20_trig",
      """SELECT p_partkey,
        |  round(sin(p_size/10.0),6) AS sn, round(cos(p_size/10.0),6) AS cs,
        |  round(tan(p_size/100.0),6) AS tn,
        |  round(asin(p_size/100.0),6) AS asn, round(acos(p_size/100.0),6) AS acs,
        |  round(atan(p_size/10.0),6) AS atn,
        |  round(atan2(p_size/10.0, 2.0),6) AS at2,
        |  round((exp(p_size/10.0)-exp(-p_size/10.0))/2,6) AS snh,
        |  round((exp(p_size/10.0)+exp(-p_size/10.0))/2,6) AS csh,
        |  round((exp(p_size/5.0)-1)/(exp(p_size/5.0)+1),6) AS tnh,
        |  round(pi(),6) AS p, round(exp(1.0),6) AS eu
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey",
          round(sin($"p_size" / 10.0), 6).as("sn"),
          round(cos($"p_size" / 10.0), 6).as("cs"),
          round(tan($"p_size" / 100.0), 6).as("tn"),
          round(asin($"p_size" / 100.0), 6).as("asn"),
          round(acos($"p_size" / 100.0), 6).as("acs"),
          round(atan($"p_size" / 10.0), 6).as("atn"),
          round(atan2($"p_size" / 10.0, lit(2.0)), 6).as("at2"),
          round(sinh($"p_size" / 10.0), 6).as("snh"),
          round(cosh($"p_size" / 10.0), 6).as("csh"),
          round(tanh($"p_size" / 10.0), 6).as("tnh"),
          round(lit(math.Pi), 6).as("p"),
          round(exp(lit(1.0)), 6).as("eu"))
        .orderBy($"p_partkey")
    },

    // locate/position/char_length/octet_length (FunctionRegistry.java:286-389).
    q("f21_string_lengths",
      """SELECT c_custkey,
        |  CAST(strpos(c_name, 'mer') AS INT) AS loc,
        |  CAST(length(c_name) AS INT) AS clen,
        |  CAST(octet_length(encode(c_name)) AS INT) AS olen,
        |  CAST(length(c_mktsegment) AS INT) AS slen
        |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "customer").filter($"c_custkey" < 50)
        .select($"c_custkey",
          locate("mer", $"c_name").as("loc"),
          char_length($"c_name").as("clen"),
          octet_length($"c_name").as("olen"),
          expr("character_length(c_mktsegment)").as("slen"))
        .orderBy($"c_custkey")
    },

    // Bitwise operators (Hive `& | ^ ~ shiftleft shiftright`,
    // FunctionRegistry.java:438-452).
    q("f19_bitops",
      """SELECT p_partkey,
        |  p_partkey & 255 AS ba, p_partkey | 16 AS bo,
        |  xor(p_partkey, 85) AS bx, CAST(~p_partkey AS BIGINT) AS bn,
        |  p_size << 2 AS sl, p_partkey >> 3 AS sr,
        |  bin(p_size) AS bi,
        |  CAST(bit_count(p_partkey) AS INT) AS bc
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "part").filter($"p_partkey" < 100)
        .select($"p_partkey",
          $"p_partkey".bitwiseAND(255).as("ba"),
          $"p_partkey".bitwiseOR(16).as("bo"),
          $"p_partkey".bitwiseXOR(85).as("bx"),
          expr("~p_partkey").as("bn"),
          shiftleft($"p_size", 2).as("sl"),
          shiftright($"p_partkey", 3).as("sr"),
          bin($"p_size").as("bi"),
          bit_count($"p_partkey").as("bc"))
        .orderBy($"p_partkey")
    },

    // width_bucket binning (Hive GenericUDFWidthBucket,
    // ref FunctionRegistry.java:636).
    q("f13_width_bucket",
      """SELECT CASE WHEN c_acctbal < 0 THEN 0
        |  WHEN c_acctbal >= 10000 THEN 11
        |  ELSE CAST(floor(c_acctbal/1000) AS BIGINT) + 1 END AS bucket,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "customer")
        .select(expr("width_bucket(c_acctbal, 0.0, 10000.0, 10)").as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },

    // Map surface: str_to_map, element access, map_keys/map_values, size
    // (Hive map type + GenericUDFStrToMap, FunctionRegistry.java:615-640).
    // The oracle recomputes the expected values from the base columns — the
    // check verifies the map round-trip, not the mechanism.
    q("f22_map_functions",
      """SELECT c_custkey,
        |  c_mktsegment AS v_seg,
        |  CAST(c_nationkey AS VARCHAR) AS v_nat,
        |  'nat,seg' AS ks,
        |  c_mktsegment || ',' || CAST(c_nationkey AS VARCHAR) AS vs,
        |  CAST(2 AS INT) AS n,
        |  true AS has_seg
        |FROM customer WHERE c_custkey < 60 ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey,
        |  m['seg'] AS v_seg,
        |  m['nat'] AS v_nat,
        |  concat_ws(',', array_sort(map_keys(m))) AS ks,
        |  concat_ws(',', map_values(m)) AS vs,
        |  size(m) AS n,
        |  map_contains_key(m, 'seg') AS has_seg
        |FROM (SELECT c_custkey,
        |  str_to_map(concat('seg:', c_mktsegment, ',nat:', CAST(c_nationkey AS STRING)), ',', ':') AS m
        |  FROM customer) WHERE c_custkey < 60 ORDER BY c_custkey""".stripMargin)),

    // Struct surface: named_struct, field access, struct-in-array indexing
    // (Hive struct type; toStruct/index, FunctionRegistry.java:494-496).
    q("f23_struct_functions",
      """SELECT c_custkey,
        |  c_name AS nm, c_mktsegment AS seg,
        |  c_nationkey AS nk, c_nationkey AS ak
        |FROM customer WHERE c_custkey < 40 ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey,
        |  named_struct('nm', c_name, 'seg', c_mktsegment).nm AS nm,
        |  named_struct('nm', c_name, 'seg', c_mktsegment).seg AS seg,
        |  struct(c_custkey, c_nationkey).c_nationkey AS nk,
        |  array(named_struct('k', c_nationkey))[0].k AS ak
        |FROM customer WHERE c_custkey < 40 ORDER BY c_custkey""".stripMargin)),

    // Datetime depth: months_between (31-day-month fraction, HALF_UP@8dp —
    // formula mirrored exactly; rounding parity verified exhaustively over the
    // value domain), next_day, weekday, dayofweek alignment, interval add
    // (ref GenericUDFMonthsBetween, GenericUDFNextDay).
    q("f24_datetime_more",
      """SELECT o_orderkey,
        |  CASE WHEN day(CAST(o_orderdate AS DATE)) = 15
        |    THEN CAST((year(o_orderdate)-1995)*12 + (month(o_orderdate)-6) AS DOUBLE)
        |    ELSE round((year(o_orderdate)-1995)*12 + (month(o_orderdate)-6)
        |      + ((day(CAST(o_orderdate AS DATE))-15)*86400.0)/2678400.0, 8) END AS mb,
        |  CAST(CAST(o_orderdate AS DATE) + to_days(CAST(
        |    CASE WHEN (1 - dayofweek(o_orderdate) + 7) % 7 = 0 THEN 7
        |         ELSE (1 - dayofweek(o_orderdate) + 7) % 7 END AS INT)) AS DATE) AS nd,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dw,
        |  o_orderdate + INTERVAL 3 DAY AS plus3,
        |  o_orderdate - INTERVAL 2 HOUR AS minus2h
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin
    )(sqlQ(
      """SELECT o_orderkey,
        |  months_between(o_orderdate, TIMESTAMP '1995-06-15 00:00:00') AS mb,
        |  next_day(o_orderdate, 'MON') AS nd,
        |  weekday(o_orderdate) AS wd,
        |  dayofweek(o_orderdate) AS dw,
        |  o_orderdate + INTERVAL 3 DAYS AS plus3,
        |  o_orderdate - INTERVAL 2 HOURS AS minus2h
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin)),

    // printf-style formatting, elt, substring_index, locate, space
    // (GenericUDFPrintf, GenericUDFElt, GenericUDFSubstringIndex...).
    q("f25_string_format",
      """SELECT p_partkey,
        |  printf('%05d|%s', p_partkey, p_type) AS fs,
        |  printf('%x', p_partkey) AS fx,
        |  CASE CAST(1 + p_partkey % 3 AS INT) WHEN 1 THEN 'alpha'
        |    WHEN 2 THEN 'beta' ELSE 'gamma' END AS e,
        |  list_extract(string_split(p_name, ' '), 1) AS si1,
        |  array_to_string(list_slice(string_split(p_name, ' '),
        |    len(string_split(p_name, ' ')), len(string_split(p_name, ' '))), ' ') AS si2,
        |  CAST(ascii(p_type) AS INT) AS asc,
        |  chr(CAST(65 + p_partkey % 26 AS INT)) AS ch,
        |  '[' || repeat(' ', 2) || ']' AS sp,
        |  CAST(instr(p_name, 'o') AS INT) AS loc
        |FROM part WHERE p_partkey < 80 ORDER BY p_partkey""".stripMargin
    )(sqlQ(
      """SELECT p_partkey,
        |  format_string('%05d|%s', p_partkey, p_type) AS fs,
        |  format_string('%x', p_partkey) AS fx,
        |  elt(CAST(1 + p_partkey % 3 AS INT), 'alpha', 'beta', 'gamma') AS e,
        |  substring_index(p_name, ' ', 1) AS si1,
        |  substring_index(p_name, ' ', -1) AS si2,
        |  ascii(p_type) AS asc,
        |  chr(65 + p_partkey % 26) AS ch,
        |  concat('[', space(2), ']') AS sp,
        |  locate('o', p_name) AS loc
        |FROM part WHERE p_partkey < 80 ORDER BY p_partkey""".stripMargin)),

    // Radix conversion: bin/hex/conv (GenericUDFConv, UDFBin, UDFHex) — the
    // oracle uses DuckDB to_base (uppercase digits, matching conv/hex).
    q("f26_conv_bases",
      """SELECT o_orderkey,
        |  to_base(o_orderkey, 2) AS b2,
        |  to_base(o_orderkey, 16) AS hx,
        |  to_base(o_orderkey, 16) AS c16,
        |  to_base(o_orderkey, 36) AS c36,
        |  hex(o_orderpriority) AS hs,
        |  o_orderpriority AS rt
        |FROM orders WHERE o_orderkey < 150 ORDER BY o_orderkey""".stripMargin
    )(sqlQ(
      """SELECT o_orderkey,
        |  bin(o_orderkey) AS b2,
        |  hex(o_orderkey) AS hx,
        |  conv(CAST(o_orderkey AS STRING), 10, 16) AS c16,
        |  conv(CAST(o_orderkey AS STRING), 10, 36) AS c36,
        |  hex(o_orderpriority) AS hs,
        |  CAST(unhex(hex(o_orderpriority)) AS STRING) AS rt
        |FROM orders WHERE o_orderkey < 150 ORDER BY o_orderkey""".stripMargin)),

    // ANSI EXTRACT(field FROM source) syntax — same text in both engines.
    q("f28_extract_syntax",
      """SELECT o_orderkey,
        |  CAST(extract(YEAR FROM o_orderdate) AS INT) AS y,
        |  CAST(extract(QUARTER FROM o_orderdate) AS INT) AS q,
        |  CAST(extract(MONTH FROM o_orderdate) AS INT) AS m,
        |  CAST(extract(DAY FROM o_orderdate) AS INT) AS d,
        |  CAST(extract(HOUR FROM o_orderdate) AS INT) AS h
        |FROM orders WHERE o_orderkey < 250 ORDER BY o_orderkey""".stripMargin
    )(sqlQ(
      """SELECT o_orderkey,
        |  CAST(extract(YEAR FROM o_orderdate) AS INT) AS y,
        |  CAST(extract(QUARTER FROM o_orderdate) AS INT) AS q,
        |  CAST(extract(MONTH FROM o_orderdate) AS INT) AS m,
        |  CAST(extract(DAY FROM o_orderdate) AS INT) AS d,
        |  CAST(extract(HOUR FROM o_orderdate) AS INT) AS h
        |FROM orders WHERE o_orderkey < 250 ORDER BY o_orderkey""".stripMargin)),

    // SQL:2016 CAST ... FORMAT (ref GenericUDFCastFormat) through the
    // Engine front door — format AND parse directions; the oracle is
    // DuckDB strftime with the equivalent C tokens.
    q("f36_cast_format",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso,
        |  strftime(o_orderdate, '%m/%d/%Y') AS us,
        |  upper(strftime(o_orderdate, '%d-%b-%Y')) AS orcl,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(o_orderdate, '%A') AS dayname,
        |  '2009-07-30' AS parsed
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT o_orderkey,
          |  CAST(o_orderdate AS STRING FORMAT 'yyyy-MM-dd') AS iso,
          |  CAST(o_orderdate AS STRING FORMAT 'MM/dd/yyyy') AS us,
          |  CAST(o_orderdate AS STRING FORMAT 'DD-MON-YYYY') AS orcl,
          |  CAST(o_orderdate AS varchar(7) FORMAT 'yyyy-mm') AS ym,
          |  cast_format(o_orderdate, 'string', 'Day') AS dayname,
          |  CAST(CAST('07/30/2009' AS DATE FORMAT 'MM/dd/yyyy') AS STRING) AS parsed
          |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin)
    },

    // try_* error-safe functions (null-on-error — the engine-wide non-ANSI
    // coercion story made explicit): try_cast, try_divide, try_element_at,
    // try_add overflow. The oracle emulates with TRY_CAST/CASE in DuckDB.
    q("f29_try_functions",
      """SELECT p_partkey,
        |  TRY_CAST(p_type AS INT) AS bad_int,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_int,
        |  CASE WHEN p_size - p_size = 0 THEN NULL
        |    ELSE p_retailprice / (p_size - p_size) END AS div0,
        |  p_retailprice / 2.0 AS half,
        |  string_split(p_name, ' ')[5] AS oob,
        |  string_split(p_name, ' ')[1] AS w1,
        |  CASE WHEN p_partkey > 7 THEN NULL
        |    ELSE p_partkey + 9223372036854775800 END AS ovf
        |FROM part WHERE p_partkey < 90 ORDER BY p_partkey""".stripMargin
    )(sqlQ(
      """SELECT p_partkey,
        |  try_cast(p_type AS INT) AS bad_int,
        |  try_cast(CAST(p_size AS STRING) AS INT) AS good_int,
        |  try_divide(p_retailprice, p_size - p_size) AS div0,
        |  try_divide(p_retailprice, 2.0) AS half,
        |  try_element_at(split(p_name, ' '), 5) AS oob,
        |  try_element_at(split(p_name, ' '), 1) AS w1,
        |  try_add(p_partkey, 9223372036854775800L) AS ovf
        |FROM part WHERE p_partkey < 90 ORDER BY p_partkey""".stripMargin)),

    // Variant type (SURVEY §1.2: Hive `variant` → Spark 4 VariantType):
    // parse_json into a real VARIANT value, typed extraction via variant_get,
    // dynamic field presence, round-trip through to_json. The oracle reads the
    // same JSON with DuckDB's json functions.
    q("f27_variant",
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract(props, '$.k') AS VARCHAR) AS k_str,
        |  CAST(json_extract(props, '$.missing') AS INT) AS k_missing,
        |  json_extract_string(props, '$') IS NOT NULL AS is_obj,
        |  json_extract(props, '$') AS rt
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin
    )(sqlQ(
      """SELECT event_id,
        |  variant_get(parse_json(props), '$.k', 'int') AS k_int,
        |  CAST(variant_get(parse_json(props), '$.k', 'string') AS STRING) AS k_str,
        |  try_variant_get(parse_json(props), '$.missing', 'int') AS k_missing,
        |  parse_json(props) IS NOT NULL AS is_obj,
        |  to_json(parse_json(props)) AS rt
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin)),

    // Geospatial ST_* surface (graft.functions.GeoFunctions; ref ql/.../udf/
    // esri/). Coordinates derive arithmetically from c_custkey so the DuckDB
    // oracle can mirror every function in closed-form SQL: WKT text, point
    // accessors, euclidean + haversine distance, OGC containment, envelope
    // area, convex-hull area, bbox intersection, and the reference's
    // BinUtils cell addressing (esri/BinUtils.java:28-55 — half-integer
    // cell boundaries, sqrt(Long.MaxValue)-per-axis extent). Trig-dependent
    // values are rounded (1-3dp) so last-ulp libm differences between
    // engines cannot flip the hash.
    q("f30_geospatial",
      """SELECT c_custkey,
        |  'POINT (' ||
        |    (CASE WHEN px = floor(px) THEN CAST(CAST(px AS BIGINT) AS VARCHAR)
        |          ELSE CAST(px AS VARCHAR) END) || ' ' ||
        |    (CASE WHEN py = floor(py) THEN CAST(CAST(py AS BIGINT) AS VARCHAR)
        |          ELSE CAST(py AS VARCHAR) END) || ')' AS pt_wkt,
        |  px AS px_rt,
        |  round(sqrt((px - 10.0)*(px - 10.0) + (py - 20.0)*(py - 20.0)), 4) AS dist_fixed,
        |  (px > 0 AND px < 30 AND py > 0 AND py < 30) AS in_box,
        |  round(abs(qx - px) * abs(qy - py), 3) AS env_area,
        |  CAST(floor(1518500249.5 - py) AS BIGINT) * 3037000499
        |    + CAST(floor(px + 1518500249.5) AS BIGINT) AS bin_id,
        |  round(6371008.0 * 2 * atan2(
        |    sqrt(power(sin(radians(qy/10.0 - py/10.0)/2), 2)
        |      + cos(radians(py/10.0)) * cos(radians(qy/10.0))
        |        * power(sin(radians(qx/10.0 - px/10.0)/2), 2)),
        |    sqrt(1 - (power(sin(radians(qy/10.0 - py/10.0)/2), 2)
        |      + cos(radians(py/10.0)) * cos(radians(qy/10.0))
        |        * power(sin(radians(qx/10.0 - px/10.0)/2), 2)))), 1) AS dsphere,
        |  round(abs((qx - px)*(5.0 - py) - (qy - py)*(10.0 - px)) / 2, 3) AS hull_area,
        |  (least(px, qx) <= 20 AND greatest(px, qx) >= 10 AND
        |   least(py, qy) <= 20 AND greatest(py, qy) >= 10) AS env_ix
        |FROM (SELECT c_custkey,
        |        CAST(c_custkey % 100 AS DOUBLE) * 0.5 AS px,
        |        CAST((c_custkey * 7) % 100 AS DOUBLE) * 0.5 AS py,
        |        CAST(c_custkey % 37 AS DOUBLE) * 0.7 AS qx,
        |        CAST((c_custkey * 3) % 41 AS DOUBLE) * 0.7 AS qy
        |      FROM customer WHERE c_custkey <= 300) d
        |ORDER BY c_custkey""".stripMargin
    )(sqlQ(
      """SELECT c_custkey,
        |  st_astext(st_point(px, py)) AS pt_wkt,
        |  st_x(st_point(px, py)) AS px_rt,
        |  round(st_distance(st_point(px, py), st_point(10.0, 20.0)), 4) AS dist_fixed,
        |  st_contains(st_geomfromtext('POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0))'),
        |              st_point(px, py)) AS in_box,
        |  round(st_area(st_envelope(st_linestring(array(px, qx), array(py, qy)))), 3) AS env_area,
        |  st_bin(1.0, st_point(px, py)) AS bin_id,
        |  round(st_distancesphere(st_point(px/10.0, py/10.0),
        |                          st_point(qx/10.0, qy/10.0)), 1) AS dsphere,
        |  round(st_area(st_convexhull(st_multipoint(array(px, qx, 10.0),
        |                                            array(py, qy, 5.0)))), 3) AS hull_area,
        |  st_envintersects(st_linestring(array(px, qx), array(py, qy)),
        |    st_geomfromtext('POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))')) AS env_ix
        |FROM (SELECT c_custkey,
        |        CAST(c_custkey % 100 AS DOUBLE) * 0.5 AS px,
        |        CAST((c_custkey * 7) % 100 AS DOUBLE) * 0.5 AS py,
        |        CAST(c_custkey % 37 AS DOUBLE) * 0.7 AS qx,
        |        CAST((c_custkey * 3) % 41 AS DOUBLE) * 0.7 AS qy
        |      FROM customer WHERE c_custkey <= 300) d
        |ORDER BY c_custkey""".stripMargin)),

    // Bin-bucketed spatial join (operators.SpatialJoin): every customer point
    // against a 5x5 grid of nation rectangles, joined through grid-cell ids
    // (one equi-join, no cartesian) and refined with exact OGC contains
    // (boundary excluded). The oracle is the closed-form strict-inequality
    // join DuckDB can run directly.
    q("f31_spatial_join",
      """SELECT n_nationkey, count(*) AS cnt, CAST(sum(c_custkey) AS BIGINT) AS sk
        |FROM (SELECT c_custkey,
        |        CAST(c_custkey % 100 AS DOUBLE) * 0.5 AS px,
        |        CAST((c_custkey * 7) % 100 AS DOUBLE) * 0.5 AS py
        |      FROM customer) p
        |JOIN (SELECT n_nationkey,
        |        CAST(n_nationkey % 5 AS DOUBLE) * 12 AS x0,
        |        CAST(floor(n_nationkey / 5) AS DOUBLE) * 10 AS y0
        |      FROM nation) r
        |  ON p.px > r.x0 AND p.px < r.x0 + 9
        | AND p.py > r.y0 AND p.py < r.y0 + 7.5
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin
    ) { (spark, dir) =>
      Engine.register(spark, dir)
      val pts = spark.sql(
        """SELECT c_custkey,
          |  CAST(c_custkey % 100 AS DOUBLE) * 0.5 AS px,
          |  CAST((c_custkey * 7) % 100 AS DOUBLE) * 0.5 AS py
          |FROM customer""".stripMargin)
      val polys = spark.sql(
        """SELECT n_nationkey,
          |  st_polygon(array(x0, x0 + 9, x0 + 9, x0),
          |             array(y0, y0, y0 + 7.5, y0 + 7.5)) AS wkt
          |FROM (SELECT n_nationkey,
          |        CAST(n_nationkey % 5 AS DOUBLE) * 12 AS x0,
          |        CAST(floor(n_nationkey / 5) AS DOUBLE) * 10 AS y0
          |      FROM nation)""".stripMargin)
      graft.operators.SpatialJoin
        .pointsInPolygons(pts, "px", "py", polys, "wkt", binSize = 8.0)
        .groupBy("n_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("c_custkey").as("sk"))
        .orderBy("n_nationkey")
    },

    // CREATE TEMPORARY MACRO (plans.Macros; ref ql/.../ddl/function/macro/
    // CreateMacroAnalyzer.java): inline-expanded, type-inferred SQL macros.
    // One macro nests inside another, both expand before optimization, and
    // the whole statement runs through the engine front door; the oracle
    // replays the expansion by hand — integer arithmetic, cell-exact.
    q("f32_sql_macro",
      """SELECT CAST(o_orderkey % 7 + CASE WHEN o_orderkey % 2 = 0
        |         THEN 100 ELSE 0 END AS INT) AS bucket,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sk
        |FROM orders WHERE o_orderkey <= 2000
        |GROUP BY 1 ORDER BY bucket""".stripMargin) { (spark, dir) =>
      Engine.sql(spark, dir,
        "CREATE TEMPORARY MACRO graft_even_boost(x BIGINT) " +
          "CASE WHEN x % 2 = 0 THEN 100 ELSE 0 END")
      Engine.sql(spark, dir,
        "CREATE TEMPORARY MACRO graft_bucketize(x BIGINT) " +
          "CAST(x % 7 + graft_even_boost(x) AS INT)")
      Engine.sql(spark, dir,
        """SELECT graft_bucketize(o_orderkey) AS bucket,
          |  count(*) AS n, sum(o_orderkey) AS sk
          |FROM orders WHERE o_orderkey <= 2000
          |GROUP BY 1 ORDER BY bucket""".stripMargin)
    },

    // Interval-aware datetime field functions + time-only string parsing
    // (r16; ref interval_udf.q, udf_hour.q — Hive's year/month and
    // day/hour/minute/second accept INTERVAL arguments, and
    // hour/minute/second parse bare HH:mm:ss strings). The per-row leg
    // derives a time string from the key so the oracle is not constant.
    q("f37_interval_time_fields",
      """SELECT o_orderkey,
        |  date_part('year', INTERVAL 1 YEAR + INTERVAL 2 MONTHS) AS iy,
        |  date_part('month', INTERVAL 1 YEAR + INTERVAL 2 MONTHS) AS im,
        |  date_part('day', INTERVAL 3 DAYS + INTERVAL 4 HOURS
        |    + INTERVAL 5 MINUTES + INTERVAL 6 SECONDS) AS idd,
        |  date_part('hour', INTERVAL 3 DAYS + INTERVAL 4 HOURS
        |    + INTERVAL 5 MINUTES + INTERVAL 6 SECONDS) AS ih,
        |  date_part('minute', INTERVAL 3 DAYS + INTERVAL 4 HOURS
        |    + INTERVAL 5 MINUTES + INTERVAL 6 SECONDS) AS imin,
        |  CAST(date_part('second', INTERVAL 3 DAYS + INTERVAL 4 HOURS
        |    + INTERVAL 5 MINUTES + INTERVAL 6 SECONDS) AS INT) AS isec,
        |  date_part('hour', CAST('13:14:15' AS TIME)) AS th,
        |  CAST(date_part('second', CAST('13:14:'
        |    || lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') AS TIME))
        |    AS INT) AS rs
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT o_orderkey,
          |  year(interval '1-2' year to month) AS iy,
          |  month(interval '1-2' year to month) AS im,
          |  day(interval '3 4:5:6.789' day to second) AS idd,
          |  hour(interval '3 4:5:6.789' day to second) AS ih,
          |  minute(interval '3 4:5:6.789' day to second) AS imin,
          |  second(interval '3 4:5:6.789' day to second) AS isec,
          |  hour('13:14:15') AS th,
          |  second(concat('13:14:',
          |    lpad(cast(o_orderkey % 60 as string), 2, '0'))) AS rs
          |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin)
    },

    // Numeric trunc (r16; ref udf_trunc_number.q — truncation toward
    // zero at positive/negative/zero scale). Values are non-negative, so
    // the DuckDB twin's floor arithmetic is the same truncation.
    q("f38_numeric_trunc",
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice * 10) / 10 AS t1,
        |  floor(l_extendedprice / 100) * 100 AS tm2,
        |  CAST(floor(l_extendedprice) AS DOUBLE) AS t0,
        |  floor(l_discount * 100) / 100 AS td
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT l_orderkey, l_linenumber,
          |  trunc(l_extendedprice, 1) AS t1,
          |  trunc(l_extendedprice, -2) AS tm2,
          |  trunc(l_extendedprice) AS t0,
          |  trunc(l_discount, 2) AS td
          |FROM lineitem WHERE l_orderkey < 200
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },

    // GROUP BY a MAP-typed key (r16; ref groupby_complex_types.q —
    // Spark 4 groups map keys natively, normalizing entry order via
    // InsertMapSortInGroupingExpressions). The
    // map projects back to scalars so the rendering is engine-neutral;
    // grouping by the one-entry map is definitionally grouping by the
    // pair, which is what the oracle does.
    q("f39_map_groupby",
      """SELECT o_orderpriority AS k, o_orderstatus AS v,
        |  count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY k, v""".stripMargin
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT element_at(map_keys(m), 1) AS k,
          |  element_at(map_values(m), 1) AS v, cnt
          |FROM (SELECT MAP(o_orderpriority, o_orderstatus) AS m,
          |        count(*) AS cnt
          |      FROM orders
          |      GROUP BY MAP(o_orderpriority, o_orderstatus))
          |ORDER BY k, v""".stripMargin)
    },
  )
}
