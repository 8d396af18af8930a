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
    if (!spark.catalog.tableExists("tpcds.store_sales")) generate(spark)
    // always refresh the temp-view aliases (session-shared)
    Seq("date_dim", "time_dim", "item", "store", "customer",
      "customer_address", "customer_demographics",
      "household_demographics", "promotion", "store_sales",
      "store_returns", "catalog_sales").foreach { t =>
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
        date_format(col("d_date"), "EEEE").as("d_day_name"))
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
      (col("id") / 3600).cast("int").as("t_hour"),
      (col("id") % 3600 / 60).cast("int").as("t_minute")))

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
      concat(lit("class"), h("class", col("id"), 100)).as("i_class"),
      (h("manu", col("id"), 1000) + 1).as("i_manufact_id"),
      concat(lit("manu"), h("manu", col("id"), 1000) + 1).as("i_manufact"),
      (h("mgr", col("id"), 100) + 1).as("i_manager_id"),
      ((h("price", col("id"), 9900) + 100) / lit(100.0))
        .as("i_current_price")))

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
      pick("sstate", col("id"), Seq("NM", "TN", "SD", "AL")).as("s_state"),
      lpad(h("szip", col("id"), 100000).cast("string"), 5, "0").as("s_zip"),
      (lit(200) + col("id").cast("int") * 8).as("s_number_employees")))

    // ---- customer_address
    val nCa = 10000
    save(spark, "customer_address", spark.range(1, nCa + 1).select(
      col("id").cast("int").as("ca_address_sk"),
      pick("cacity", col("id"), Seq("Cedar Grove", "Wildwood", "Midway",
        "Fairview", "Oakland", "Springdale", "Union", "Salem", "Clinton",
        "Marion")).as("ca_city"),
      pick("castate", col("id"), Seq("KY", "GA", "NM", "MT", "OR", "IN",
        "WI", "MO", "WV", "TN", "TX", "OH")).as("ca_state"),
      lit("United States").as("ca_country"),
      lpad(h("cazip", col("id"), 100000).cast("string"), 5, "0").as("ca_zip")))

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
      (h("caddr", col("id"), nCa) + 1).as("c_current_addr_sk"),
      (h("ccd", col("id"), 7000) + 1).as("c_current_cdemo_sk"),
      (h("chd", col("id"), 720) + 1).as("c_current_hdemo_sk")))

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
        (col("id") / 10 % 7 + 1).cast("int")).as("cd_education_status")))

    // ---- household_demographics
    save(spark, "household_demographics", spark.range(1, 721).select(
      col("id").cast("int").as("hd_demo_sk"),
      (col("id") % 10).cast("int").as("hd_dep_count"),
      (col("id") / 10 % 6).cast("int").as("hd_vehicle_count"),
      element_at(array(Seq(">10000", "unknown", "1001-5000", "5001-10000",
        "501-1000", "0-500").map(lit): _*),
        (col("id") / 60 % 6 + 1).cast("int")).as("hd_buy_potential")))

    // ---- promotion
    save(spark, "promotion", spark.range(1, 101).select(
      col("id").cast("int").as("p_promo_sk"),
      pick("pmail", col("id"), Seq("N", "Y")).as("p_channel_email"),
      pick("pevent", col("id"), Seq("N", "Y")).as("p_channel_event")))

    // ---- store_sales: 240k line items over 24k tickets (sizes vary so
    // per-ticket counts span the queries' HAVING bands), partitioned by
    // sold date — the DPP target
    val nCust = 20000
    val tik = h("tk", col("id"), 24000)
    val price = ((h("sp", col("id"), 20000) + 1) / lit(100.0))
    val qty = (h("qty", col("id"), 100) + 1)
    val wholesale = ((h("wc", col("id"), 10000) + 1) / lit(100.0))
    val listp = price * lit(1.25)
    val storeSales = spark.range(240000).select(
      pickDate("sd", tik).as("ss_sold_date_sk"),
      h("st", tik, 86400).as("ss_sold_time_sk"),
      (h("it", col("id"), 2000) + 1).as("ss_item_sk"),
      (h("cu", tik, nCust) + 1).as("ss_customer_sk"),
      (h("cd", tik, 7000) + 1).as("ss_cdemo_sk"),
      (h("hd", tik, 720) + 1).as("ss_hdemo_sk"),
      (h("ad", tik, nCa) + 1).as("ss_addr_sk"),
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
      (h("fee", col("ss_ticket_number"), 10000) / lit(100.0)).as("sr_fee"),
      (col("ss_sales_price") * col("ss_quantity") * lit(0.9))
        .as("sr_return_amt"),
      (h("loss", col("ss_ticket_number"), 20000) / lit(100.0))
        .as("sr_net_loss"))
    save(spark, "store_returns", sr)

    // ---- catalog_sales: the minimal column set query25 touches. Half
    // random, half CORRELATED with store_returns (same customer/item,
    // sold on the return date) so the ss→sr→cs chain has matches — an
    // uncorrelated table starves the returns-chain queries to zero rows
    val csRandom = spark.range(60000).select(
      pickDate("csd", col("id")).as("cs_sold_date_sk"),
      (h("csi", col("id"), 2000) + 1).as("cs_item_sk"),
      (h("csc", col("id"), nCust) + 1).as("cs_bill_customer_sk"),
      (((h("csp", col("id"), 600000)) - 100000) / lit(100.0))
        .as("cs_net_profit"))
    val csFromSr = spark.table("tpcds.store_returns").select(
      col("sr_returned_date_sk").as("cs_sold_date_sk"),
      col("sr_item_sk").as("cs_item_sk"),
      col("sr_customer_sk").as("cs_bill_customer_sk"),
      (((h("csp2", col("sr_ticket_number"), 600000)) - 100000) / lit(100.0))
        .as("cs_net_profit"))
    save(spark, "catalog_sales", csRandom.unionByName(csFromSr))
  }
}
