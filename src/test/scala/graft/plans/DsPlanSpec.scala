package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, BroadcastNestedLoopJoinExec}

/** TPC-DS plan-quality regression — the 100×-scale guard. The
  * reference's flagship perf asset is 206 TPC-DS queries with golden
  * EXPLAIN plans at 30 TB declared stats (ql/src/test/queries/
  * clientpositive/perf/query*.q, itests CliConfigs.java:282); this
  * ports a representative 17 (star joins, snowflakes, demographics
  * selections, returns self-joins, a windowed rollup, time-bucket
  * cross of scalar aggregates) over the deterministic [[DsData]]
  * snowflake with ANALYZE column stats and CBO on, and pins the plan
  * properties that decide life at 100 TB:
  *
  *   - dimension joins broadcast (no dim ever shuffles the fact);
  *   - DPP fires against store_sales' date partition when date_dim is
  *     filtered (the single biggest scan reducer in the DS corpus);
  *   - no CartesianProduct / nested-loop join anywhere (q88's cross of
  *     eight ONE-ROW scalar aggregates is the documented exception —
  *     broadcasting a single row is the right plan);
  *   - results are plan-independent: each query re-runs with CBO,
  *     broadcasts, DPP and AQE all off, and must produce identical rows
  *     (catches wrong-plan-wrong-answer bugs, the oracled leg).
  */
class DsPlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The executed plan with AQE's final subtree expanded. */
  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def q88Block(hour: Int, half: Int, alias: String): String = {
    val minute = if (half == 0) "time_dim.t_minute < 30"
      else "time_dim.t_minute >= 30"
    s"""(select count(*) $alias
       | from store_sales, household_demographics, time_dim, store
       | where ss_sold_time_sk = time_dim.t_time_sk
       |   and ss_hdemo_sk = household_demographics.hd_demo_sk
       |   and ss_store_sk = s_store_sk
       |   and time_dim.t_hour = $hour and $minute
       |   and ((household_demographics.hd_dep_count = 3 and household_demographics.hd_vehicle_count<=3+2) or
       |        (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2) or
       |        (household_demographics.hd_dep_count = 1 and household_demographics.hd_vehicle_count<=1+2))
       |   and store.s_store_name = 'ese')""".stripMargin
  }

  /** (name, sql, expectDpp) — text verbatim from the reference's perf
    * corpus modulo Spark spellings noted inline.
    */
  private lazy val queries: Seq[(String, String, Boolean)] = Seq(
    ("query1",
      """with customer_total_return as
        |(select sr_customer_sk as ctr_customer_sk
        |,sr_store_sk as ctr_store_sk
        |,sum(SR_FEE) as ctr_total_return
        |from store_returns
        |,date_dim
        |where sr_returned_date_sk = d_date_sk
        |and d_year =2000
        |group by sr_customer_sk
        |,sr_store_sk)
        | select  c_customer_id
        |from customer_total_return ctr1
        |,store
        |,customer
        |where ctr1.ctr_total_return > (select avg(ctr_total_return)*1.2
        |from customer_total_return ctr2
        |where ctr1.ctr_store_sk = ctr2.ctr_store_sk)
        |and s_store_sk = ctr1.ctr_store_sk
        |and s_state = 'NM'
        |and ctr1.ctr_customer_sk = c_customer_sk
        |order by c_customer_id
        |limit 100""".stripMargin, false),

    ("query3",
      """select  dt.d_year
        |       ,item.i_brand_id brand_id
        |       ,item.i_brand brand
        |       ,sum(ss_ext_sales_price) sum_agg
        | from  date_dim dt
        |      ,store_sales
        |      ,item
        | where dt.d_date_sk = store_sales.ss_sold_date_sk
        |   and store_sales.ss_item_sk = item.i_item_sk
        |   and item.i_manufact_id = 436
        |   and dt.d_moy=12
        | group by dt.d_year
        |      ,item.i_brand
        |      ,item.i_brand_id
        | order by dt.d_year
        |         ,sum_agg desc
        |         ,brand_id
        | limit 100""".stripMargin, true),

    ("query7",
      """select  i_item_id,
        |        avg(ss_quantity) agg1,
        |        avg(ss_list_price) agg2,
        |        avg(ss_coupon_amt) agg3,
        |        avg(ss_sales_price) agg4
        | from store_sales, customer_demographics, date_dim, item, promotion
        | where ss_sold_date_sk = d_date_sk and
        |       ss_item_sk = i_item_sk and
        |       ss_cdemo_sk = cd_demo_sk and
        |       ss_promo_sk = p_promo_sk and
        |       cd_gender = 'F' and
        |       cd_marital_status = 'W' and
        |       cd_education_status = 'Primary' and
        |       (p_channel_email = 'N' or p_channel_event = 'N') and
        |       d_year = 1998
        | group by i_item_id
        | order by i_item_id
        | limit 100""".stripMargin, true),

    ("query13",
      """select avg(ss_quantity)
        |       ,avg(ss_ext_sales_price)
        |       ,avg(ss_ext_wholesale_cost)
        |       ,sum(ss_ext_wholesale_cost)
        | from store_sales
        |     ,store
        |     ,customer_demographics
        |     ,household_demographics
        |     ,customer_address
        |     ,date_dim
        | where s_store_sk = ss_store_sk
        | and  ss_sold_date_sk = d_date_sk and d_year = 2001
        | and((ss_hdemo_sk=hd_demo_sk
        |  and cd_demo_sk = ss_cdemo_sk
        |  and cd_marital_status = 'M'
        |  and cd_education_status = '4 yr Degree'
        |  and ss_sales_price between 100.00 and 150.00
        |  and hd_dep_count = 3
        |     )or
        |     (ss_hdemo_sk=hd_demo_sk
        |  and cd_demo_sk = ss_cdemo_sk
        |  and cd_marital_status = 'D'
        |  and cd_education_status = 'Primary'
        |  and ss_sales_price between 50.00 and 100.00
        |  and hd_dep_count = 1
        |     ) or
        |     (ss_hdemo_sk=hd_demo_sk
        |  and cd_demo_sk = ss_cdemo_sk
        |  and cd_marital_status = 'U'
        |  and cd_education_status = 'Advanced Degree'
        |  and ss_sales_price between 150.00 and 200.00
        |  and hd_dep_count = 1
        |     ))
        | and((ss_addr_sk = ca_address_sk
        |  and ca_country = 'United States'
        |  and ca_state in ('KY', 'GA', 'NM')
        |  and ss_net_profit between 100 and 200
        |     ) or
        |     (ss_addr_sk = ca_address_sk
        |  and ca_country = 'United States'
        |  and ca_state in ('MT', 'OR', 'IN')
        |  and ss_net_profit between 150 and 300
        |     ) or
        |     (ss_addr_sk = ca_address_sk
        |  and ca_country = 'United States'
        |  and ca_state in ('WI', 'MO', 'WV')
        |  and ss_net_profit between 50 and 250
        |     ))""".stripMargin, true),

    ("query19",
      """select  i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
        | sum(ss_ext_sales_price) ext_price
        | from date_dim, store_sales, item,customer,customer_address,store
        | where d_date_sk = ss_sold_date_sk
        |   and ss_item_sk = i_item_sk
        |   and i_manager_id=7
        |   and d_moy=11
        |   and d_year=1999
        |   and ss_customer_sk = c_customer_sk
        |   and c_current_addr_sk = ca_address_sk
        |   and substr(ca_zip,1,5) <> substr(s_zip,1,5)
        |   and ss_store_sk = s_store_sk
        | group by i_brand
        |      ,i_brand_id
        |      ,i_manufact_id
        |      ,i_manufact
        | order by ext_price desc
        |         ,i_brand
        |         ,i_brand_id
        |         ,i_manufact_id
        |         ,i_manufact
        |limit 100""".stripMargin, true),

    ("query25",
      """select
        | i_item_id
        | ,i_item_desc
        | ,s_store_id
        | ,s_store_name
        | ,sum(ss_net_profit) as store_sales_profit
        | ,sum(sr_net_loss) as store_returns_loss
        | ,sum(cs_net_profit) as catalog_sales_profit
        | from
        | store_sales
        | ,store_returns
        | ,catalog_sales
        | ,date_dim d1
        | ,date_dim d2
        | ,date_dim d3
        | ,store
        | ,item
        | where
        | d1.d_moy = 4
        | and d1.d_year = 2000
        | and d1.d_date_sk = ss_sold_date_sk
        | and i_item_sk = ss_item_sk
        | and s_store_sk = ss_store_sk
        | and ss_customer_sk = sr_customer_sk
        | and ss_item_sk = sr_item_sk
        | and ss_ticket_number = sr_ticket_number
        | and sr_returned_date_sk = d2.d_date_sk
        | and d2.d_moy               between 4 and  10
        | and d2.d_year              = 2000
        | and sr_customer_sk = cs_bill_customer_sk
        | and sr_item_sk = cs_item_sk
        | and cs_sold_date_sk = d3.d_date_sk
        | and d3.d_moy               between 4 and  10
        | and d3.d_year              = 2000
        | group by
        | i_item_id
        | ,i_item_desc
        | ,s_store_id
        | ,s_store_name
        | order by
        | i_item_id
        | ,i_item_desc
        | ,s_store_id
        | ,s_store_name
        | limit 100""".stripMargin, true),

    ("query34",
      """select c_last_name
        |       ,c_first_name
        |       ,c_salutation
        |       ,c_preferred_cust_flag
        |       ,ss_ticket_number
        |       ,cnt from
        |   (select ss_ticket_number
        |          ,ss_customer_sk
        |          ,count(*) cnt
        |    from store_sales,date_dim,store,household_demographics
        |    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |    and store_sales.ss_store_sk = store.s_store_sk
        |    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |    and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
        |    and (household_demographics.hd_buy_potential = '>10000' or
        |         household_demographics.hd_buy_potential = 'unknown')
        |    and household_demographics.hd_vehicle_count > 0
        |    and (case when household_demographics.hd_vehicle_count > 0
        |        then household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count
        |        else null
        |        end)  > 1.2
        |    and date_dim.d_year in (2000,2000+1,2000+2)
        |    and store.s_county in ('Mobile County','Maverick County','Huron County','Kittitas County',
        |                           'Fairfield County','Jackson County','Barrow County','Pennington County')
        |    group by ss_ticket_number,ss_customer_sk) dn,customer
        |    where ss_customer_sk = c_customer_sk
        |      and cnt between 15 and 20
        |    order by c_last_name,c_first_name,c_salutation,c_preferred_cust_flag desc""".stripMargin,
      true),

    ("query42",
      """select  dt.d_year
        | ,item.i_category_id
        | ,item.i_category
        | ,sum(ss_ext_sales_price)
        | from   date_dim dt
        | ,store_sales
        | ,item
        | where dt.d_date_sk = store_sales.ss_sold_date_sk
        | and store_sales.ss_item_sk = item.i_item_sk
        | and item.i_manager_id = 1
        | and dt.d_moy=12
        | and dt.d_year=1998
        | group by  dt.d_year
        |   ,item.i_category_id
        |   ,item.i_category
        | order by       sum(ss_ext_sales_price) desc,dt.d_year
        |   ,item.i_category_id
        |   ,item.i_category
        |limit 100""".stripMargin, true),

    ("query48",
      """select sum (ss_quantity)
        | from store_sales, store, customer_demographics, customer_address, date_dim
        | where s_store_sk = ss_store_sk
        | and  ss_sold_date_sk = d_date_sk and d_year = 1998
        | and
        | (
        |  (
        |   cd_demo_sk = ss_cdemo_sk
        |   and
        |   cd_marital_status = 'M'
        |   and
        |   cd_education_status = '4 yr Degree'
        |   and
        |   ss_sales_price between 100.00 and 150.00
        |   )
        | or
        |  (
        |  cd_demo_sk = ss_cdemo_sk
        |   and
        |   cd_marital_status = 'M'
        |   and
        |   cd_education_status = '4 yr Degree'
        |   and
        |   ss_sales_price between 50.00 and 100.00
        |  )
        | or
        | (
        |  cd_demo_sk = ss_cdemo_sk
        |  and
        |   cd_marital_status = 'M'
        |   and
        |   cd_education_status = '4 yr Degree'
        |   and
        |   ss_sales_price between 150.00 and 200.00
        | )
        | )
        | and
        | (
        |  (
        |  ss_addr_sk = ca_address_sk
        |  and
        |  ca_country = 'United States'
        |  and
        |  ca_state in ('KY', 'GA', 'NM')
        |  and ss_net_profit between 0 and 2000
        |  )
        | or
        |  (ss_addr_sk = ca_address_sk
        |  and
        |  ca_country = 'United States'
        |  and
        |  ca_state in ('MT', 'OR', 'IN')
        |  and ss_net_profit between 150 and 3000
        |  )
        | or
        |  (ss_addr_sk = ca_address_sk
        |  and
        |  ca_country = 'United States'
        |  and
        |  ca_state in ('WI', 'MO', 'WV')
        |  and ss_net_profit between 50 and 25000
        |  )
        | )""".stripMargin, true),

    ("query52",
      """select  dt.d_year
        | ,item.i_brand_id brand_id
        | ,item.i_brand brand
        | ,sum(ss_ext_sales_price) ext_price
        | from date_dim dt
        |     ,store_sales
        |     ,item
        | where dt.d_date_sk = store_sales.ss_sold_date_sk
        |    and store_sales.ss_item_sk = item.i_item_sk
        |    and item.i_manager_id = 1
        |    and dt.d_moy=12
        |    and dt.d_year=1998
        | group by dt.d_year
        | ,item.i_brand
        | ,item.i_brand_id
        | order by dt.d_year
        | ,ext_price desc
        | ,brand_id
        |limit 100""".stripMargin, true),

    ("query55",
      """select  i_brand_id brand_id, i_brand brand,
        | sum(ss_ext_sales_price) ext_price
        | from date_dim, store_sales, item
        | where d_date_sk = ss_sold_date_sk
        | and ss_item_sk = i_item_sk
        | and i_manager_id=36
        | and d_moy=12
        | and d_year=2001
        | group by i_brand, i_brand_id
        | order by ext_price desc, i_brand_id
        |limit 100""".stripMargin, true),

    ("query68",
      """select  c_last_name
        |       ,c_first_name
        |       ,ca_city
        |       ,bought_city
        |       ,ss_ticket_number
        |       ,extended_price
        |       ,extended_tax
        |       ,list_price
        | from (select ss_ticket_number
        |             ,ss_customer_sk
        |             ,ca_city bought_city
        |             ,sum(ss_ext_sales_price) extended_price
        |             ,sum(ss_ext_list_price) list_price
        |             ,sum(ss_ext_tax) extended_tax
        |       from store_sales
        |           ,date_dim
        |           ,store
        |           ,household_demographics
        |           ,customer_address
        |       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |         and store_sales.ss_store_sk = store.s_store_sk
        |        and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |        and store_sales.ss_addr_sk = customer_address.ca_address_sk
        |        and date_dim.d_dom between 1 and 2
        |        and (household_demographics.hd_dep_count = 2 or
        |             household_demographics.hd_vehicle_count= 1)
        |        and date_dim.d_year in (1998,1998+1,1998+2)
        |        and store.s_city in ('Cedar Grove','Wildwood')
        |       group by ss_ticket_number
        |               ,ss_customer_sk
        |               ,ss_addr_sk,ca_city) dn
        |      ,customer
        |      ,customer_address current_addr
        | where ss_customer_sk = c_customer_sk
        |   and customer.c_current_addr_sk = current_addr.ca_address_sk
        |   and current_addr.ca_city <> bought_city
        | order by c_last_name
        |         ,ss_ticket_number
        | limit 100""".stripMargin, true),

    ("query73",
      """select c_last_name
        |       ,c_first_name
        |       ,c_salutation
        |       ,c_preferred_cust_flag
        |       ,ss_ticket_number
        |       ,cnt from
        |   (select ss_ticket_number
        |          ,ss_customer_sk
        |          ,count(*) cnt
        |    from store_sales,date_dim,store,household_demographics
        |    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |    and store_sales.ss_store_sk = store.s_store_sk
        |    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |    and date_dim.d_dom between 1 and 2
        |    and (household_demographics.hd_buy_potential = '>10000' or
        |         household_demographics.hd_buy_potential = 'unknown')
        |    and household_demographics.hd_vehicle_count > 0
        |    and case when household_demographics.hd_vehicle_count > 0 then
        |             household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count else null end > 1
        |    and date_dim.d_year in (2000,2000+1,2000+2)
        |    and store.s_county in ('Mobile County','Maverick County','Huron County','Kittitas County')
        |    group by ss_ticket_number,ss_customer_sk) dj,customer
        |    where ss_customer_sk = c_customer_sk
        |      and cnt between 1 and 5
        |    order by cnt desc, c_last_name asc""".stripMargin, true),

    ("query79",
      """select
        |  c_last_name,c_first_name,substr(s_city,1,30),ss_ticket_number,amt,profit
        |  from
        |   (select ss_ticket_number
        |          ,ss_customer_sk
        |          ,store.s_city
        |          ,sum(ss_coupon_amt) amt
        |          ,sum(ss_net_profit) profit
        |    from store_sales,date_dim,store,household_demographics
        |    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |    and store_sales.ss_store_sk = store.s_store_sk
        |    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |    and (household_demographics.hd_dep_count = 8 or household_demographics.hd_vehicle_count > 0)
        |    and date_dim.d_dow = 1
        |    and date_dim.d_year in (1998,1998+1,1998+2)
        |    and store.s_number_employees between 200 and 295
        |    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,store.s_city) ms,customer
        |    where ss_customer_sk = c_customer_sk
        | order by c_last_name,c_first_name,substr(s_city,1,30), profit
        |limit 100""".stripMargin, true),

    ("query88",
      "select  * from\n" +
        Seq((8, 1, "h8_30_to_9"), (9, 0, "h9_to_9_30"), (9, 1, "h9_30_to_10"),
          (10, 0, "h10_to_10_30"), (10, 1, "h10_30_to_11"),
          (11, 0, "h11_to_11_30"), (11, 1, "h11_30_to_12"),
          (12, 0, "h12_to_12_30"))
          .zipWithIndex.map { case ((hr, half, alias), i) =>
            q88Block(hr, half, alias) + s" s${i + 1}" }
          .mkString(",\n"), false),

    ("query96",
      """select  count(*)
        |from store_sales
        |    ,household_demographics
        |    ,time_dim, store
        |where ss_sold_time_sk = time_dim.t_time_sk
        |    and ss_hdemo_sk = household_demographics.hd_demo_sk
        |    and ss_store_sk = s_store_sk
        |    and time_dim.t_hour = 8
        |    and time_dim.t_minute >= 30
        |    and household_demographics.hd_dep_count = 5
        |    and store.s_store_name = 'ese'
        |order by count(*)
        |limit 100""".stripMargin, false),

    ("query98",
      // `+ 30 days` spelled date_add (Spark's interval-literal syntax)
      """select i_item_desc
        |      ,i_category
        |      ,i_class
        |      ,i_current_price
        |      ,sum(ss_ext_sales_price) as itemrevenue
        |      ,sum(ss_ext_sales_price)*100/sum(sum(ss_ext_sales_price)) over
        |          (partition by i_class) as revenueratio
        |from
        | store_sales
        |     ,item
        |     ,date_dim
        |where
        | ss_item_sk = i_item_sk
        |   and i_category in ('Jewelry', 'Sports', 'Books')
        |   and ss_sold_date_sk = d_date_sk
        | and d_date between cast('2001-01-12' as date)
        |    and date_add(cast('2001-01-12' as date), 30)
        |group by
        | i_item_id
        |        ,i_item_desc
        |        ,i_category
        |        ,i_class
        |        ,i_current_price
        |order by
        | i_category
        |        ,i_class
        |        ,i_item_id
        |        ,i_item_desc
        |        ,revenueratio""".stripMargin, true))

  private def cboConfs = Seq(
    "spark.sql.cbo.enabled" -> "true",
    "spark.sql.cbo.joinReorder.enabled" -> "true",
    "spark.sql.cbo.planStats.enabled" -> "true",
    "spark.sql.statistics.histogram.enabled" -> "true")

  test("17 perf queries: dims broadcast, DPP prunes the date partition, " +
      "zero cartesians; results identical under a dumb plan") {
    DsData.ensure(spark)
    withConf(cboConfs: _*) {
      queries.foreach { case (name, sql, expectDpp) =>
        val df = spark.sql(sql)
        val plan = executed(df)
        val good = df.collect()
        // an empty result would let AQE collapse to EmptyRelation and
        // vacuously pass every plan assertion — the data must exercise
        // each query for real
        assert(good.nonEmpty, s"$name produced no rows — fix DsData")

        // no cartesian anywhere; no nested-loop either, except the two
        // documented legitimate shapes: q88's cross of eight ONE-ROW
        // scalar aggregates, and q19's residual non-equi predicate
        // (substr(ca_zip)<>substr(s_zip)) against the 12-row store dim —
        // a broadcast nested loop over a tiny dim is the right plan at
        // any scale (the reference's CBO keeps the same shape)
        val carts = collect(plan) { case c: CartesianProductExec => c }
        val bnl = collect(plan) { case b: BroadcastNestedLoopJoinExec => b }
        assert(carts.isEmpty, s"$name planned a CartesianProduct")
        if (name != "query88" && name != "query19") {
          assert(bnl.isEmpty, s"$name planned a BroadcastNestedLoopJoin")
        }

        // every query is a star around store_sales: the dims broadcast
        val bhj = collect(plan) { case b: BroadcastHashJoinExec => b }
        assert(bhj.nonEmpty, s"$name has no broadcast joins:\n$plan")

        // DPP: the store_sales scan's partition filter carries a dynamic
        // pruning subquery whenever date_dim is filtered
        if (expectDpp) {
          val ssScans = collect(plan) {
            case s: FileSourceScanExec
                if s.tableIdentifier.exists(_.table == "store_sales") => s
          }
          assert(ssScans.nonEmpty, s"$name: no store_sales scan found")
          assert(ssScans.exists(_.partitionFilters.exists(
              _.toString.toLowerCase.contains("dynamicpruning"))),
            s"$name: DPP did not reach the store_sales scan; filters = " +
              ssScans.map(_.partitionFilters.mkString("[", ", ", "]"))
                .mkString(" | "))
        }

        // plan-independence leg: same rows under a deliberately dumb plan
        withConf(
          "spark.sql.cbo.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false",
          "spark.sql.adaptive.enabled" -> "false") {
          val dumb = spark.sql(sql).collect()
          assert(dumb.length === good.length,
            s"$name row count differs under the dumb plan")
          // unordered multiset compare with float tolerance: a different
          // join order sums doubles in a different order, so ULP drift is
          // expected — greedy matching beats rounding (which always has
          // a boundary some sum lands on). n <= 100 rows per query.
          def cellsMatch(a: Any, b: Any): Boolean = (a, b) match {
            case (x: Double, y: Double) =>
              x == y || math.abs(x - y) <=
                1e-8 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
            case (x: Float, y: Float) =>
              x == y || math.abs(x - y) <=
                1e-4 * math.max(1.0f, math.max(math.abs(x), math.abs(y)))
            case (x, y) => x == y
          }
          def rowsMatch(a: org.apache.spark.sql.Row,
              b: org.apache.spark.sql.Row): Boolean =
            a.length == b.length &&
              a.toSeq.zip(b.toSeq).forall((cellsMatch _).tupled)
          val pool = scala.collection.mutable.ArrayBuffer(good: _*)
          dumb.foreach { r =>
            val i = pool.indexWhere(rowsMatch(r, _))
            assert(i >= 0,
              s"$name: dumb-plan row $r has no tolerant match in the " +
                s"optimized result")
            pool.remove(i)
          }
        }
      }
    }
  }

  test("declared stats drive the broadcast choice: with CBO stats the " +
      "date_dim side broadcasts even above the size-only estimate") {
    DsData.ensure(spark)
    withConf(cboConfs: _*) {
      // a filtered date_dim is tiny by STATS (selectivity on d_year) even
      // though its file size alone is broadcastable anyway; assert the
      // catalog relation carries rowCount stats — the CBO contract
      val rel = spark.table("tpcds.date_dim").queryExecution.optimizedPlan
      val stats = rel.stats
      assert(stats.rowCount.exists(_.toLong == 1826L),
        s"date_dim ANALYZE stats missing: $stats")
      val ss = spark.table("tpcds.store_sales").queryExecution.optimizedPlan
      assert(ss.stats.rowCount.exists(_.toLong == 240000L),
        s"store_sales ANALYZE stats missing: ${ss.stats}")
    }
  }
}
