package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic TPC-DS-shaped snowflake for the plan-quality regression
  * (the reference's flagship perf corpus: 206 golden-plan queries over
  * 30 TB declared stats, ql/src/test/queries/clientpositive/perf/,
  * itests CliConfigs.java:282). Same seed discipline as TESTDATA.md:
  * every column is a pure hash of the row id (xxhash64) — no RNG, no
  * timestamps — so plans AND results are reproducible run to run.
  *
  * Tables land once per JVM as catalog parquet tables in database
  * `tpcds` with ANALYZE ... FOR ALL COLUMNS stats, store_sales
  * PARTITIONED BY ss_sold_date_sk (the DS convention, and what DPP
  * prunes against). Sold dates draw only from months {1,4,7,11,12} of
  * 1998-2002 — every month some ported query filters — capping the
  * partition count at ~770 while keeping date_dim itself complete.
  */
object DsData {

  @volatile private var built = false

  /** abs(xxhash64(seed, id)) % mod — the deterministic column driver. */
  private def h(seed: String, id: Column, mod: Int): Column =
    pmod(xxhash64(lit(seed), id), lit(mod)).cast("int")

  private def pick(seed: String, id: Column, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*), h(seed, id, vals.size) + 1)

  def ensure(spark: SparkSession): Unit = synchronized {
    if (built) return
    spark.sql("CREATE DATABASE IF NOT EXISTS tpcds")
    // reason is the newest table — its absence regenerates a pre-16e
    // warehouse layout
    if (!spark.catalog.tableExists("tpcds.reason") ||
      !spark.table("tpcds.catalog_sales").columns
        .contains("cs_catalog_page_sk") ||
      !spark.table("tpcds.customer").columns
        .contains("c_last_review_date_sk") ||
      !spark.table("tpcds.web_returns").columns
        .contains("wr_refunded_cash") ||
      !spark.table("tpcds.web_sales").columns
        .contains("ws_promo_sk") ||
      !spark.table("tpcds.catalog_sales").columns
        .contains("cs_net_paid_inc_ship_tax")) generate(spark)
    // always refresh the temp-view aliases (session-shared)
    Seq("date_dim", "time_dim", "item", "store", "customer",
      "customer_address", "customer_demographics",
      "household_demographics", "promotion", "store_sales",
      "store_returns", "catalog_sales", "catalog_returns", "inventory",
      "warehouse", "web_sales", "web_returns", "web_site",
      "income_band", "ship_mode", "call_center", "reason", "web_page",
      "catalog_page").foreach { t =>
      spark.table(s"tpcds.$t").createOrReplaceTempView(t)
    }
    built = true
  }

  private def save(spark: SparkSession, name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(s"tpcds.$name")
    spark.sql(s"ANALYZE TABLE tpcds.$name COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  private def generate(spark: SparkSession): Unit = {
    import spark.implicits._

    // ---- date_dim: complete 1998-01-01 .. 2002-12-31, DS julian sks
    val nDays = 1826
    val dateDim = spark.range(nDays).select(
      (col("id") + 2450815L).cast("int").as("d_date_sk"),
      date_add(to_date(lit("1998-01-01")), col("id").cast("int")).as("d_date"))
      .select(col("d_date_sk"), col("d_date"),
        year(col("d_date")).as("d_year"),
        month(col("d_date")).as("d_moy"),
        dayofmonth(col("d_date")).as("d_dom"),
        (dayofweek(col("d_date")) - 1).as("d_dow"), // 0 = Sunday (DS)
        quarter(col("d_date")).as("d_qoy"),
        date_format(col("d_date"), "EEEE").as("d_day_name"),
        // Sunday-start week counter (1998-01-01 is a Thursday, so the
        // first boundary is id=3): same-week dates share d_week_seq —
        // what q72's d1/d2 equi-join keys on
        (floor(((col("d_date_sk") - 2450815L) + 4L) / 7L) + 5217L)
          .cast("int").as("d_week_seq"),
        // DS month counter (1998-01 = 1200, the corpus convention that
        // makes q65's `d_month_seq between 1212 and 1212+11` = 1999)
        ((year(col("d_date")) - 1998) * 12 + month(col("d_date")) + 1199)
          .cast("int").as("d_month_seq"),
        concat(year(col("d_date")), lit("Q"), quarter(col("d_date")))
          .as("d_quarter_name"))
    save(spark, "date_dim", dateDim)

    // the fact-side sold/returned date pool (see scaladoc)
    val factDates: Seq[Int] = (0 until nDays).map { i =>
      (java.time.LocalDate.of(1998, 1, 1).plusDays(i), 2450815 + i)
    }.collect { case (d, sk)
        if Seq(1, 4, 7, 11, 12).contains(d.getMonthValue) => sk }
    val dateArr = array(factDates.map(lit): _*)
    def pickDate(seed: String, id: Column): Column =
      element_at(dateArr, h(seed, id, factDates.size) + 1)

    // ---- time_dim: one row per second of day (the DS shape)
    save(spark, "time_dim", spark.range(86400).select(
      col("id").cast("int").as("t_time_sk"),
      col("id").cast("int").as("t_time"),
      (col("id") / 3600).cast("int").as("t_hour"),
      (col("id") % 3600 / 60).cast("int").as("t_minute"),
      // DS meal-time bands (q71/q90): breakfast 6-9, dinner 17-20
      when(col("id") / 3600 >= 6 && col("id") / 3600 < 9, lit("breakfast"))
        .when(col("id") / 3600 >= 17 && col("id") / 3600 < 20,
          lit("dinner"))
        .otherwise(lit(null)).as("t_meal_time")))

    // ---- item
    val categories = Seq("Books", "Sports", "Jewelry", "Home",
      "Electronics", "Music", "Men", "Women", "Shoes", "Children")
    save(spark, "item", spark.range(1, 2001).select(
      col("id").cast("int").as("i_item_sk"),
      concat(lit("AAAA"), lpad(col("id").cast("string"), 8, "0"))
        .as("i_item_id"),
      concat(lit("item description "), col("id")).as("i_item_desc"),
      (h("brand", col("id"), 500) + 1).as("i_brand_id"),
      concat(lit("Brand#"), h("brand", col("id"), 500) + 1).as("i_brand"),
      (h("cat", col("id"), 10) + 1).as("i_category_id"),
      pick("cat2", col("id"), categories).as("i_category"),
      (h("class", col("id"), 100) + 1).as("i_class_id"),
      concat(lit("class"), h("class", col("id"), 100) + 1).as("i_class"),
      (h("manu", col("id"), 1000) + 1).as("i_manufact_id"),
      concat(lit("manu"), h("manu", col("id"), 1000) + 1).as("i_manufact"),
      (h("mgr", col("id"), 100) + 1).as("i_manager_id"),
      ((h("price", col("id"), 9900) + 100) / lit(100.0))
        .as("i_current_price"),
      pick("color", col("id"), Seq("maroon", "burnished", "dim", "steel",
        "navajo", "chocolate", "ivory", "salmon", "plum", "khaki"))
        .as("i_color"),
      concat(lit("product"), col("id")).as("i_product_name"),
      pick("isz", col("id"), Seq("small", "medium", "large", "extra large",
        "economy", "petite", "N/A")).as("i_size"),
      pick("iun", col("id"), Seq("Each", "Dozen", "Case", "Pound", "Oz",
        "Pallet", "Gross", "Box")).as("i_units")))

    // county -> state FUNCTIONAL mapping over the counties the store and
    // customer_address pools share: q54 joins on ca_county = s_county AND
    // ca_state = s_state — independent draws make the joint match
    // vanishingly rare, exactly unlike real data where a county IS in one
    // state. States stay inside the store pool (NM/TN/SD/AL) so every
    // older state literal keeps matching.
    val countyState = Map(
      "Mobile County" -> "NM", "Huron County" -> "TN",
      "Jackson County" -> "SD", "Kittitas County" -> "AL",
      "Fairfield County" -> "NM", "Maverick County" -> "TN",
      "Barrow County" -> "SD", "Pennington County" -> "AL")
    def stateFor(county: Column, fallback: Column): Column =
      countyState.foldLeft(fallback) { case (acc, (c, st)) =>
        when(county === c, lit(st)).otherwise(acc) }

    // ---- store (12 rows; names/cities/counties cover the query literals)
    save(spark, "store", spark.range(1, 13).select(
      col("id").cast("int").as("s_store_sk"),
      concat(lit("S"), lpad(col("id").cast("string"), 4, "0")).as("s_store_id"),
      pick("sname", col("id"), Seq("ought", "able", "ese", "anti"))
        .as("s_store_name"),
      pick("scity", col("id"),
        Seq("Cedar Grove", "Wildwood", "Midway", "Fairview")).as("s_city"),
      pick("scounty", col("id"), Seq("Mobile County", "Maverick County",
        "Huron County", "Kittitas County", "Fairfield County",
        "Jackson County", "Barrow County", "Pennington County"))
        .as("s_county"),
      stateFor(pick("scounty", col("id"), Seq("Mobile County",
          "Maverick County", "Huron County", "Kittitas County",
          "Fairfield County", "Jackson County", "Barrow County",
          "Pennington County")),
        pick("sstate", col("id"), Seq("NM", "TN", "SD", "AL")))
        .as("s_state"),
      // 40-zip shared pool (q24 equi-joins s_zip = ca_zip)
      lpad((h("szip", col("id"), 40) * 437 + 10007).cast("string"), 5, "0")
        .as("s_zip"),
      (lit(200) + col("id").cast("int") * 8).as("s_number_employees"),
      (h("scoid", col("id"), 2) + 1).as("s_company_id"),
      (h("smkt", col("id"), 10) + 1).as("s_market_id"),
      (h("sstn", col("id"), 999) + 1).cast("string")
        .as("s_street_number"),
      pick("sstnm", col("id"), Seq("Main", "Oak", "Elm", "Park"))
        .as("s_street_name"),
      pick("sstt", col("id"), Seq("St", "Ave", "Blvd", "Ct"))
        .as("s_street_type"),
      concat(lit("Suite "), (h("ssui", col("id"), 20) * 10))
        .as("s_suite_number"),
      // two companies so q47's company partition key is non-degenerate
      concat(lit("company"), h("scomp", col("id"), 2) + 1)
        .as("s_company_name"),
      (lit(-5) - h("sgmt", col("id"), 4)).as("s_gmt_offset")))

    // ---- customer_address
    val nCa = 10000
    save(spark, "customer_address", spark.range(1, nCa + 1).select(
      col("id").cast("int").as("ca_address_sk"),
      pick("cacity", col("id"), Seq("Cedar Grove", "Wildwood", "Midway",
        "Fairview", "Oakland", "Springdale", "Union", "Salem", "Clinton",
        "Marion")).as("ca_city"),
      stateFor(pick("cacnty", col("id"), Seq("Ziebach County",
          "Walker County", "Storey County", "Richland County",
          "Mobile County", "Luce County", "Huron County",
          "Fairfield County", "Jackson County", "Barrow County",
          "Pennington County", "Kittitas County", "Maverick County",
          "Dauphin County", "Greene County", "Tyler County",
          "Wadena County", "Mesa County", "Perry County",
          "Salem County")),
        pick("castate", col("id"), Seq("KY", "GA", "NM", "MT", "OR", "IN",
          "WI", "MO", "WV", "TN", "TX", "OH"))).as("ca_state"),
      lit("United States").as("ca_country"),
      lpad((h("cazip", col("id"), 40) * 437 + 10007).cast("string"), 5, "0")
        .as("ca_zip"),
      (h("castn", col("id"), 999) + 1).cast("string")
        .as("ca_street_number"),
      pick("castnm", col("id"), Seq("Main", "Oak", "Elm", "Park", "Pine",
        "Maple", "Lake", "Hill")).as("ca_street_name"),
      pick("castt", col("id"), Seq("St", "Ave", "Blvd", "Ct", "Way"))
        .as("ca_street_type"),
      concat(lit("Suite "), (h("casui", col("id"), 30) * 10))
        .as("ca_suite_number"),
      pick("calt", col("id"), Seq("apartment", "condo", "single family"))
        .as("ca_location_type"),
      // 20 counties: q31's double quarter-over-quarter ratio compare
      // keeps ~25% of counties on random data — a short list can
      // deterministically keep none
      pick("cacnty", col("id"), Seq("Ziebach County", "Walker County",
        "Storey County", "Richland County", "Mobile County",
        "Luce County", "Huron County", "Fairfield County",
        "Jackson County", "Barrow County", "Pennington County",
        "Kittitas County", "Maverick County", "Dauphin County",
        "Greene County", "Tyler County", "Wadena County",
        "Mesa County", "Perry County", "Salem County"))
        .as("ca_county"),
      (lit(-5) - h("cagmt", col("id"), 4)).as("ca_gmt_offset")))

    // ---- customer
    save(spark, "customer", spark.range(1, nCa * 2 + 1).select(
      col("id").cast("int").as("c_customer_sk"),
      concat(lit("C"), lpad(col("id").cast("string"), 10, "0"))
        .as("c_customer_id"),
      pick("cfn", col("id"), Seq("James", "Mary", "John", "Linda",
        "Robert", "Susan", "Ana", "Wei", "Omar", "Kim")).as("c_first_name"),
      pick("cln", col("id"), Seq("Smith", "Johnson", "Lee", "Garcia",
        "Chen", "Patel", "Brown", "Davis")).as("c_last_name"),
      pick("csal", col("id"), Seq("Mr.", "Ms.", "Dr.", "Sir"))
        .as("c_salutation"),
      pick("cpf", col("id"), Seq("Y", "N")).as("c_preferred_cust_flag"),
      (h("cbd", col("id"), 28) + 1).as("c_birth_day"),
      (h("cbm", col("id"), 12) + 1).as("c_birth_month"),
      (h("cby", col("id"), 60) + 1930).as("c_birth_year"),
      (h("caddr", col("id"), nCa) + 1).as("c_current_addr_sk"),
      (h("ccd", col("id"), 7000) + 1).as("c_current_cdemo_sk"),
      (h("chd", col("id"), 720) + 1).as("c_current_hdemo_sk"),
      (h("cfsd", col("id"), 1826) + 2450815).as("c_first_sales_date_sk"),
      (h("cfsh", col("id"), 1826) + 2450815).as("c_first_shipto_date_sk"),
      pick("cbc", col("id"), Seq("UNITED STATES", "CANADA", "MEXICO",
        "INDIA", "CHINA", "BRAZIL")).as("c_birth_country"),
      concat(lit("login"), col("id")).as("c_login"),
      concat(lit("C"), col("id"), lit("@example.com"))
        .as("c_email_address"),
      (h("crev", col("id"), 1826) + 2450815).as("c_last_review_date_sk")))

    // ---- customer_demographics (full cross, DS-style decomposition)
    save(spark, "customer_demographics", spark.range(1, 7001).select(
      col("id").cast("int").as("cd_demo_sk"),
      element_at(array(lit("M"), lit("F")),
        (col("id") % 2 + 1).cast("int")).as("cd_gender"),
      element_at(array(Seq("M", "S", "D", "W", "U").map(lit): _*),
        (col("id") / 2 % 5 + 1).cast("int")).as("cd_marital_status"),
      element_at(array(Seq("Primary", "Secondary", "College",
        "2 yr Degree", "4 yr Degree", "Advanced Degree", "Unknown")
        .map(lit): _*),
        (col("id") / 10 % 7 + 1).cast("int")).as("cd_education_status"),
      (col("id") % 7).cast("int").as("cd_dep_count"),
      ((col("id") / 7) % 7).cast("int").as("cd_dep_employed_count"),
      ((col("id") / 49) % 7).cast("int").as("cd_dep_college_count"),
      ((h("cdpe", col("id"), 20) + 1) * 500).as("cd_purchase_estimate"),
      pick("cdcr", col("id"), Seq("Low Risk", "Good", "High Risk",
        "Unknown")).as("cd_credit_rating")))

    // ---- household_demographics
    save(spark, "household_demographics", spark.range(1, 721).select(
      col("id").cast("int").as("hd_demo_sk"),
      (col("id") % 10).cast("int").as("hd_dep_count"),
      (col("id") / 10 % 6).cast("int").as("hd_vehicle_count"),
      element_at(array(Seq(">10000", "unknown", "1001-5000", "5001-10000",
        "501-1000", "0-500").map(lit): _*),
        (col("id") / 60 % 6 + 1).cast("int")).as("hd_buy_potential"),
      (h("hdib", col("id"), 20) + 1).as("hd_income_band_sk")))

    // ---- income_band (the DS 20-band decomposition)
    save(spark, "income_band", spark.range(1, 21).select(
      col("id").cast("int").as("ib_income_band_sk"),
      ((col("id") - 1) * 10000).cast("int").as("ib_lower_bound"),
      (col("id") * 10000 - 1).cast("int").as("ib_upper_bound")))

    // ---- warehouse
    save(spark, "warehouse", spark.range(1, 6).select(
      col("id").cast("int").as("w_warehouse_sk"),
      concat(lit("Warehouse "), col("id")).as("w_warehouse_name"),
      ((h("wsq", col("id"), 900000) + 100000)).as("w_warehouse_sq_ft"),
      pick("wci", col("id"), Seq("Cedar Grove", "Wildwood", "Midway",
        "Fairview")).as("w_city"),
      pick("wcn", col("id"), Seq("Mobile County", "Huron County",
        "Jackson County")).as("w_county"),
      pick("wst", col("id"), Seq("NM", "TN", "SD")).as("w_state"),
      lit("United States").as("w_country")))

    // ---- web_site (2 of 4 carry company 'pri' so q95's filter keeps rows)
    save(spark, "web_site", spark.range(1, 5).select(
      col("id").cast("int").as("web_site_sk"),
      concat(lit("W"), lpad(col("id").cast("string"), 4, "0"))
        .as("web_site_id"),
      pick("wco", col("id"), Seq("pri", "able")).as("web_company_name"),
      concat(lit("site_"), h("wnm", col("id"), 2)).as("web_name")))

    // ---- ship_mode (20 modes over the DS 5-type decomposition)
    save(spark, "ship_mode", spark.range(1, 21).select(
      col("id").cast("int").as("sm_ship_mode_sk"),
      concat(lit("SM"), lpad(col("id").cast("string"), 4, "0"))
        .as("sm_ship_mode_id"),
      pick("smt", col("id"), Seq("EXPRESS", "NEXT DAY", "OVERNIGHT",
        "REGULAR", "LIBRARY")).as("sm_type"),
      pick("smc", col("id"), Seq("AIR", "SURFACE", "SEA")).as("sm_code"),
      pick("smca", col("id"), Seq("UPS", "FEDEX", "AIRBORNE", "USPS",
        "DHL", "ZOUROS")).as("sm_carrier")))

    // ---- call_center (6; county pool overlaps q16's IN-list so the
    // filter keeps some centers and drops others)
    save(spark, "call_center", spark.range(1, 7).select(
      col("id").cast("int").as("cc_call_center_sk"),
      concat(lit("CC"), lpad(col("id").cast("string"), 4, "0"))
        .as("cc_call_center_id"),
      concat(lit("call center "), col("id")).as("cc_name"),
      pick("ccmgr", col("id"), Seq("Bob Belcher", "Felipe Perkins",
        "Mark Hightower", "Larry Mccray")).as("cc_manager"),
      pick("cccn", col("id"), Seq("Ziebach County", "Levy County",
        "Huron County", "Franklin Parish", "Daviess County",
        "Walker County")).as("cc_county")))

    // ---- web_page (100; char counts span q90's 5000..5200 band)
    save(spark, "web_page", spark.range(1, 101).select(
      col("id").cast("int").as("wp_web_page_sk"),
      concat(lit("WP"), lpad(col("id").cast("string"), 4, "0"))
        .as("wp_web_page_id"),
      (h("wpch", col("id"), 400) + 4900).as("wp_char_count")))

    // ---- catalog_page (100)
    save(spark, "catalog_page", spark.range(1, 101).select(
      col("id").cast("int").as("cp_catalog_page_sk"),
      concat(lit("CP"), lpad(col("id").cast("string"), 4, "0"))
        .as("cp_catalog_page_id")))

    // ---- reason (35, incl. q93's exact warranty literal)
    save(spark, "reason", spark.range(1, 36).select(
      col("id").cast("int").as("r_reason_sk"),
      concat(lit("R"), lpad(col("id").cast("string"), 4, "0"))
        .as("r_reason_id"),
      when(col("id") === 28, lit("Did not like the warranty"))
        .otherwise(concat(lit("reason "), col("id")))
        .as("r_reason_desc")))

    // ---- promotion
    save(spark, "promotion", spark.range(1, 101).select(
      col("id").cast("int").as("p_promo_sk"),
      concat(lit("promo"), col("id")).as("p_promo_name"),
      pick("pmail", col("id"), Seq("N", "Y")).as("p_channel_email"),
      pick("pevent", col("id"), Seq("N", "Y")).as("p_channel_event"),
      pick("pdmail", col("id"), Seq("N", "Y")).as("p_channel_dmail"),
      pick("ptv", col("id"), Seq("N", "Y")).as("p_channel_tv")))

    // ---- store_sales: 240k line items over 24k tickets (sizes vary so
    // per-ticket counts span the queries' HAVING bands), partitioned by
    // sold date — the DPP target
    val nCust = 20000
    // hot-skew: ~20% of draws land on 10 "hot" ids. q23's chains
    // (HAVING count(*)>4 per item-DATE; customers within 95% of the max
    // spender who then buy on catalog/web) are empty under a uniform
    // draw at this scale — real DS data is skewed for the same reason.
    def hotItem(seed: String, idc: Column): Column =
      when(h(seed + "_hot", idc, 5) === 0,
        h(seed + "_hi", idc, 10) * 200 + 8)
        .otherwise(h(seed + "_u", idc, 2000) + 1)
    def hotCust(seed: String, idc: Column): Column =
      when(h(seed + "_hot", idc, 5) === 0,
        h(seed + "_hc", idc, 10) * 1999 + 17)
        .otherwise(h(seed + "_u", idc, nCust) + 1)
    val tik = h("tk", col("id"), 24000)
    val price = ((h("sp", col("id"), 20000) + 1) / lit(100.0))
    val qty = (h("qty", col("id"), 100) + 1)
    val wholesale = ((h("wc", col("id"), 10000) + 1) / lit(100.0))
    val listp = price * lit(1.25)
    val storeSales = spark.range(240000).select(
      pickDate("sd", tik).as("ss_sold_date_sk"),
      h("st", tik, 86400).as("ss_sold_time_sk"),
      hotItem("it", col("id")).as("ss_item_sk"),
      hotCust("cu", tik).as("ss_customer_sk"),
      (h("cd", tik, 7000) + 1).as("ss_cdemo_sk"),
      // ~2% NULL demographic fk, as in real DS data — q44's baseline
      // subquery averages exactly the null-hdemo rows
      when(h("hdnull", col("id"), 50) === 0, lit(null))
        .otherwise(h("hd", tik, 720) + 1).as("ss_hdemo_sk"),
      // ~2% NULL address fk: q76's store channel SELECTS the null-addr
      // rows (channel-gap audit), inner address joins just drop them
      when(h("adnull", col("id"), 50) === 0, lit(null))
        .otherwise(h("ad", tik, nCa) + 1).as("ss_addr_sk"),
      (h("sto", tik, 12) + 1).as("ss_store_sk"),
      (h("pr", col("id"), 100) + 1).as("ss_promo_sk"),
      tik.cast("long").as("ss_ticket_number"),
      qty.as("ss_quantity"),
      price.as("ss_sales_price"),
      listp.as("ss_list_price"),
      wholesale.as("ss_wholesale_cost"),
      (price * qty).as("ss_ext_sales_price"),
      (listp * qty).as("ss_ext_list_price"),
      (wholesale * qty).as("ss_ext_wholesale_cost"),
      (price * qty * lit(0.08)).as("ss_ext_tax"),
      ((h("cpn", col("id"), 500)) / lit(100.0)).as("ss_ext_discount_amt"),
      ((h("cpn", col("id"), 500)) / lit(100.0)).as("ss_coupon_amt"),
      (price * qty * lit(0.92)).as("ss_net_paid"),
      (price * qty * lit(0.92) * lit(1.08)).as("ss_net_paid_inc_tax"),
      (((h("np", col("id"), 600000)) - 100000) / lit(100.0))
        .as("ss_net_profit"))
    save(spark, "store_sales", storeSales, Seq("ss_sold_date_sk"))

    // ---- store_returns: ~10% of sold lines return, later-pool date
    val ss = spark.table("tpcds.store_sales")
    val sr = ss.where(h("ret", col("ss_ticket_number"), 10) === 0).select(
      pickDate("rd", col("ss_ticket_number")).as("sr_returned_date_sk"),
      col("ss_item_sk").as("sr_item_sk"),
      col("ss_customer_sk").as("sr_customer_sk"),
      col("ss_cdemo_sk").as("sr_cdemo_sk"),
      col("ss_store_sk").as("sr_store_sk"),
      col("ss_ticket_number").as("sr_ticket_number"),
      (h("srr", col("ss_ticket_number") * 13 + col("ss_item_sk"), 35) + 1)
        .as("sr_reason_sk"),
      (h("fee", col("ss_ticket_number"), 10000) / lit(100.0)).as("sr_fee"),
      (col("ss_sales_price") * col("ss_quantity") * lit(0.9))
        .as("sr_return_amt"),
      (h("srq", col("ss_ticket_number") * 31 + col("ss_item_sk"), 20) + 1)
        .as("sr_return_quantity"),
      (h("loss", col("ss_ticket_number"), 20000) / lit(100.0))
        .as("sr_net_loss"))
    save(spark, "store_returns", sr)

    // ---- catalog_sales: half random, half CORRELATED with
    // store_returns (same customer/item, sold on the return date) so the
    // ss→sr→cs chain (query25) has matches — an uncorrelated table
    // starves the returns-chain queries to zero rows. Full q72/q23/q14
    // column set; order-scoped attributes key off cs_order_number the
    // way ticket-scoped ones key off tik.
    def csCols(idc: Column, soldDate: Column, item: Column,
        cust: Column): Seq[Column] = {
      val onum = h("cso", idc, 10000)
      val qty = h("csq", idc, 100) + 1
      val listp = (h("cslp", idc, 20000) + 1) / lit(100.0)
      Seq(
        soldDate.as("cs_sold_date_sk"),
        // ships 0..59 days after the sale (late-Dec-2002 sales can ship
        // past the calendar and drop out of d3 joins — harmless)
        (soldDate + h("cssh", idc, 60)).as("cs_ship_date_sk"),
        item.as("cs_item_sk"),
        cust.as("cs_bill_customer_sk"),
        (h("cscd", onum, 7000) + 1).as("cs_bill_cdemo_sk"),
        (h("cshd", onum, 720) + 1).as("cs_bill_hdemo_sk"),
        (h("csad", onum, 10000) + 1).as("cs_bill_addr_sk"),
        // ship-side fks (q10/q16/q99): customer and address are
        // order-scoped; warehouse varies BY LINE so q16's
        // same-order-different-warehouse EXISTS has matches, with ~5%
        // NULL for q76's catalog channel-gap leg
        hotCust("cssc", onum).as("cs_ship_customer_sk"),
        (h("cssa", onum, 10000) + 1).as("cs_ship_addr_sk"),
        when(h("cswn", idc, 20) === 0, lit(null))
          .otherwise(h("csw", idc, 5) + 1).as("cs_warehouse_sk"),
        (h("cssm", onum, 20) + 1).as("cs_ship_mode_sk"),
        (h("cscc", onum, 6) + 1).as("cs_call_center_sk"),
        (h("cscpg", idc, 100) + 1).as("cs_catalog_page_sk"),
        (h("csshc", idc, 5000) / lit(100.0)).as("cs_ext_ship_cost"),
        ((h("cswc", idc, 10000) + 1) / lit(100.0) * qty)
          .as("cs_ext_wholesale_cost"),
        (h("csda", idc, 500) / lit(100.0)).as("cs_ext_discount_amt"),
        (h("cspr", idc, 100) + 1).as("cs_promo_sk"),
        onum.cast("long").as("cs_order_number"),
        h("cst", idc, 86400).as("cs_sold_time_sk"),
        qty.as("cs_quantity"),
        ((h("cswu", idc, 10000) + 1) / lit(100.0))
          .as("cs_wholesale_cost"),
        listp.as("cs_list_price"),
        ((h("cssp", idc, 20000) + 1) / lit(100.0)).as("cs_sales_price"),
        (h("cscp", idc, 500) / lit(100.0)).as("cs_coupon_amt"),
        (listp * qty).as("cs_ext_list_price"),
        ((h("cssp", idc, 20000) + 1) / lit(100.0) * qty)
          .as("cs_ext_sales_price"),
        ((h("cssp", idc, 20000) + 1) / lit(100.0) * qty * lit(0.92))
          .as("cs_net_paid"),
        ((h("cssp", idc, 20000) + 1) / lit(100.0) * qty * lit(0.92)
          * lit(1.08)).as("cs_net_paid_inc_tax"),
        ((h("cssp", idc, 20000) + 1) / lit(100.0) * qty * lit(0.92)
          * lit(1.155)).as("cs_net_paid_inc_ship_tax"),
        (((h("csp", idc, 600000)) - 100000) / lit(100.0))
          .as("cs_net_profit"))
    }
    val csRandom = spark.range(60000).select(csCols(col("id"),
      pickDate("csd", col("id")),
      hotItem("csi", col("id")), hotCust("csc", col("id"))): _*)
    // the correlated half keeps the RETURN's item/customer (query25's
    // ss→sr→cs chain joins on them)
    val csFromSr = spark.table("tpcds.store_returns").select(
      csCols(col("sr_ticket_number") + 7000000L,
        col("sr_returned_date_sk"),
        col("sr_item_sk"), col("sr_customer_sk")): _*)
    save(spark, "catalog_sales", csRandom.unionByName(csFromSr))

    // ---- catalog_returns: ~33% of catalog order-lines return (r16:
    // raised from ~15%, and the return lands within 30 days of the
    // sale — month-filtered return-star selects like q91 need usable
    // mass in each pooled month); refunds are small vs list price so
    // q64's cs_ui HAVING keeps its groups
    val cs = spark.table("tpcds.catalog_sales")
    save(spark, "catalog_returns", cs
      .where(h("cret", col("cs_order_number") * 10000 + col("cs_item_sk"),
        3) === 0)
      .select(
        col("cs_item_sk").as("cr_item_sk"),
        col("cs_order_number").as("cr_order_number"),
        // returns land 0..89 days after the sale, clamped into the
        // calendar (q30/q77/q81/q91 filter the RETURN date)
        least(col("cs_sold_date_sk") +
            h("crd", col("cs_order_number") * 53 + col("cs_item_sk"), 30),
          lit(2450815 + 1825)).as("cr_returned_date_sk"),
        col("cs_bill_customer_sk").as("cr_returning_customer_sk"),
        col("cs_bill_addr_sk").as("cr_returning_addr_sk"),
        col("cs_call_center_sk").as("cr_call_center_sk"),
        (h("crcp", col("cs_order_number") * 59 + col("cs_item_sk"), 100)
          + 1).as("cr_catalog_page_sk"),
        ((h("cramt", col("cs_order_number") * 47 + col("cs_item_sk"),
          2000000) / lit(100.0)) * lit(1.08))
          .as("cr_return_amt_inc_tax"),
        (h("crnl", col("cs_order_number") * 61 + col("cs_item_sk"), 20000)
          / lit(100.0)).as("cr_net_loss"),
        (h("crrc", col("cs_order_number") * 31 + col("cs_item_sk"), 2000)
          / lit(100.0)).as("cr_refunded_cash"),
        (h("crrv", col("cs_order_number") * 37 + col("cs_item_sk"), 1000)
          / lit(100.0)).as("cr_reversed_charge"),
        (h("crsc", col("cs_order_number") * 41 + col("cs_item_sk"), 1000)
          / lit(100.0)).as("cr_store_credit"),
        (h("crq", col("cs_order_number") * 43 + col("cs_item_sk"), 20) + 1)
          .as("cr_return_quantity"),
        // up to 20k so q49's `> 10000` currency filter keeps rows
        (h("cramt", col("cs_order_number") * 47 + col("cs_item_sk"),
          2000000) / lit(100.0)).as("cr_return_amount")))

    // ---- inventory: weekly (Sunday-in-pool) per item per warehouse —
    // the q72 blowup table: at real scale this is the LARGEST table in
    // the schema and the classic join-order trap is building
    // cs × inventory before the demographic/date filters shrink cs
    // month 5 added beyond the fact pool: q39 correlates consecutive
    // months (d_moy = 4 vs 5) over inventory alone
    val invDates: Seq[Int] = (0 until nDays).collect {
      case i if Seq(1, 4, 5, 7, 11, 12).contains(
          java.time.LocalDate.of(1998, 1, 1).plusDays(i).getMonthValue) &&
        java.time.LocalDate.of(1998, 1, 1).plusDays(i)
          .getDayOfWeek == java.time.DayOfWeek.SUNDAY => 2450815 + i
    }
    val invDateArr = array(invDates.map(lit): _*)
    val nInv = invDates.size * 2000L * 5L
    save(spark, "inventory", spark.range(nInv).select(
      element_at(invDateArr,
        (col("id") % invDates.size).cast("int") + 1).as("inv_date_sk"),
      (floor(col("id") / invDates.size) % 2000 + 1).cast("int")
        .as("inv_item_sk"),
      (floor(col("id") / (invDates.size * 2000L)) + 1).cast("int")
        .as("inv_warehouse_sk"),
      // skewed on-hand quantities (80% small, 20% uniform to 999): a
      // flat draw makes every q39 coefficient-of-variation ~0.58 and
      // `cov > 1` returns nothing; the mixture's cov ~1.9 passes groups
      // the way real lumpy replenishment does, and q82's 100..500 band
      // keeps ~8% of rows
      when(h("invskew", col("id"), 5) === 0,
        h("invq", col("id"), 1000))
        .otherwise(h("invqs", col("id"), 50))
        .as("inv_quantity_on_hand")))

    // ---- web_sales: ~7.5 lines per order; warehouse varies BY LINE so
    // nearly every order spans >= 2 warehouses (q95's ws_wh self-join);
    // ship/site/address are order-scoped
    val wOnum = h("wo", col("id"), 8000)
    val wQty = h("wq", col("id"), 100) + 1
    val wListp = (h("wlp", col("id"), 20000) + 1) / lit(100.0)
    val wSold = pickDate("wsd", wOnum)
    save(spark, "web_sales", spark.range(60000).select(
      wSold.as("ws_sold_date_sk"),
      (wSold + h("wsdel", wOnum, 60)).as("ws_ship_date_sk"),
      hotItem("wsi", col("id")).as("ws_item_sk"),
      hotCust("wsc", wOnum).as("ws_bill_customer_sk"),
      (h("wsa", wOnum, nCa) + 1).as("ws_ship_addr_sk"),
      (h("wsba", wOnum, nCa) + 1).as("ws_bill_addr_sk"),
      ((h("wssp", col("id"), 20000) + 1) / lit(100.0))
        .as("ws_sales_price"),
      (h("wss", wOnum, 4) + 1).as("ws_web_site_sk"),
      (h("wwh", col("id"), 5) + 1).as("ws_warehouse_sk"),
      (h("wssm", wOnum, 20) + 1).as("ws_ship_mode_sk"),
      // ~5% NULL page fk: q76's web channel-gap leg
      when(h("wwpn", col("id"), 20) === 0, lit(null))
        .otherwise(h("wwp", col("id"), 100) + 1).as("ws_web_page_sk"),
      ((h("wswc", col("id"), 10000) + 1) / lit(100.0) * wQty)
        .as("ws_ext_wholesale_cost"),
      wOnum.cast("long").as("ws_order_number"),
      h("wst", col("id"), 86400).as("ws_sold_time_sk"),
      (h("wshd", wOnum, 720) + 1).as("ws_ship_hdemo_sk"),
      wQty.as("ws_quantity"),
      ((h("wswu", col("id"), 10000) + 1) / lit(100.0))
        .as("ws_wholesale_cost"),
      wListp.as("ws_list_price"),
      (h("wshc", col("id"), 5000) / lit(100.0)).as("ws_ext_ship_cost"),
      ((h("wssp", col("id"), 20000) + 1) / lit(100.0) * wQty)
        .as("ws_ext_sales_price"),
      (wListp * wQty).as("ws_ext_list_price"),
      (h("wsda", col("id"), 500) / lit(100.0)).as("ws_ext_discount_amt"),
      ((h("wssp", col("id"), 20000) + 1) / lit(100.0) * wQty * lit(0.92))
        .as("ws_net_paid"),
      ((h("wssp", col("id"), 20000) + 1) / lit(100.0) * wQty * lit(0.92)
        * lit(1.08)).as("ws_net_paid_inc_tax"),
      (h("wspr", col("id"), 100) + 1).as("ws_promo_sk"),
      // -100..+500: concentrated like real per-line profit, so q85's
      // 50..250-style bands keep a usable fraction of rows
      (((h("wsp", col("id"), 60000)) - 10000) / lit(100.0))
        .as("ws_net_profit")))

    // ---- web_returns: half the orders have a return; quantity/amount
    // derive from the (order, item) key AFTER the distinct so they are
    // deterministic (amounts to 20k so q49's `> 10000` filter keeps rows)
    save(spark, "web_returns", spark.table("tpcds.web_sales")
      .where(h("wret", col("ws_order_number"), 2) === 0)
      .select(col("ws_order_number").as("wr_order_number"),
        col("ws_item_sk").as("wr_item_sk"))
      .distinct()
      .select(col("wr_order_number"), col("wr_item_sk"),
        (h("wrq", col("wr_order_number") * 31 + col("wr_item_sk"), 20) + 1)
          .as("wr_return_quantity"),
        (h("wramt", col("wr_order_number") * 37 + col("wr_item_sk"),
          2000000) / lit(100.0)).as("wr_return_amt"),
        // return-side fks/measures (q30/q77/q83/q85/q90 consume the
        // web-returns star the way q91 consumes catalog's)
        (h("wrd", col("wr_order_number") * 41 + col("wr_item_sk"), 1826)
          + 2450815).as("wr_returned_date_sk"),
        (h("wrrc", col("wr_order_number") * 43 + col("wr_item_sk"),
          20000) + 1).as("wr_returning_customer_sk"),
        (h("wrra", col("wr_order_number") * 61 + col("wr_item_sk"),
          10000) + 1).as("wr_returning_addr_sk"),
        when(h("wrwpn", col("wr_order_number") * 47 + col("wr_item_sk"),
            20) === 0, lit(null))
          .otherwise(h("wrwp", col("wr_order_number") * 47 +
            col("wr_item_sk"), 100) + 1).as("wr_web_page_sk"),
        (h("wrr", col("wr_order_number") * 53 + col("wr_item_sk"), 35)
          + 1).as("wr_reason_sk"),
        (h("wrnl", col("wr_order_number") * 59 + col("wr_item_sk"),
          20000) / lit(100.0)).as("wr_net_loss"),
        (h("wrfc", col("wr_order_number") * 67 + col("wr_item_sk"),
          100000) / lit(100.0)).as("wr_refunded_cash"),
        (h("wrfe", col("wr_order_number") * 71 + col("wr_item_sk"),
          10000) / lit(100.0)).as("wr_fee"),
        (h("wrcd1", col("wr_order_number") * 73 + col("wr_item_sk"),
          7000) + 1).as("wr_refunded_cdemo_sk"),
        // the returning party IS the refunded party for ~80% of
        // returns (as in real data) — q85's cd1 = cd2 demographic
        // arms are deterministically empty under independent draws
        when(h("wrsame", col("wr_order_number") * 79 + col("wr_item_sk"),
            5) === 0,
          h("wrcd2", col("wr_order_number") * 79 + col("wr_item_sk"),
            7000) + 1)
          .otherwise(h("wrcd1", col("wr_order_number") * 73 +
            col("wr_item_sk"), 7000) + 1).as("wr_returning_cdemo_sk"),
        (h("wrfa", col("wr_order_number") * 83 + col("wr_item_sk"),
          10000) + 1).as("wr_refunded_addr_sk")))
  }
}
