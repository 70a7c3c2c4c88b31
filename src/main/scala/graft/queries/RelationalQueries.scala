package graft.queries

import graft.Tables
import graft.operators.{ColumnOps, DedupOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator coverage (SURVEY.md §2.4–§2.10) expressed on the
  * driver's TPC-H-ish test tables. Every query has a DuckDB oracle twin
  * in `oracle` with identical column names and deterministic values
  * (floats rounded, aggregates tie-broken).
  *
  * Query naming maps to the reference pattern each one reproduces.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // §2.6 groupBy aggregation (COUNT/SUM per group — the
    // transform_enrich_requests.py:45 / ceridian report shape)
    "q01_agg_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n_rows"))
    }),

    // §2.5 chained LEFT OUTER equi-joins (employee persona assembly,
    // employee_admin/ad_admin.py:4-18)
    "q02_join_chain_customer_geo" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
        .join(r, n("n_regionkey") === r("r_regionkey"), "left")
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("total_acctbal"))
    }),

    // §2.5 top-K semi-join (Dashburgh,
    // transform_enrich_requests.py:38-68): inner-join fact rows to their
    // own top-10 group aggregate
    "q03_topk_semijoin" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p  = Tables.part(s, d)
      // top-10 types from a per-partkey pre-aggregate: only
      // (partkey, cnt) shuffles for the ranking branch — the full
      // lineitem⋈part join runs once, for the final grouped count
      val perPart = li.groupBy(col("l_partkey").as("p_partkey"))
        .agg(count(lit(1)).as("__cnt"))
      val top10 = perPart.join(p.select("p_partkey", "p_type"), "p_partkey")
        .groupBy("p_type").agg(sum("__cnt").as("type_cnt"))
        .orderBy(col("type_cnt").desc, col("p_type").asc)
        .limit(10)
      li.join(p.select("p_partkey", "p_type"),
          li("l_partkey") === col("p_partkey"))
        .join(broadcast(top10.select("p_type")), Seq("p_type"))
        .groupBy("p_type", "l_returnflag")
        .agg(count(lit(1)).as("n_items"))
    }),

    // §2.5/§2.9 anti-join (NOT IN new-records insert,
    // general_queries.py:87-98)
    "q04_antijoin_new_records" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // §2.5 semi-join (WHERE id IN (SELECT ...),
    // integrate_new_requests.py:152-197)
    "q05_semijoin_open_orders" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // §2.7 ROW_NUMBER keep-latest dedup (build_dedup_old_updates,
    // general_queries.py:31-43)
    "q06_dedup_keep_latest" -> ((s, d) => {
      DedupOps.dedupKeepLatest(
        Tables.orders(s, d),
        keys = Seq("o_custkey"),
        orderCols = Seq(("o_orderdate", true), ("o_orderkey", true)))
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_orderdate"))
    }),

    // §2.6/§2.7 percentage-of-total via SUM(COUNT(*)) OVER()
    // (build_percentage_table_query, ceridian_admin.py:60-79)
    "q07_pct_of_total" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .withColumn("pct",
          round(col("n") * 100.0 / sum("n").over(Window.partitionBy()), 4))
    }),

    // §2.6 STRING_AGG (integrate_new_requests.py:53-58) — deterministic
    // via in-group sort
    "q08_string_agg_names" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_acctbal") > 9000)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation_name"))
        .agg(
          count(lit(1)).as("n_rich"),
          array_join(sort_array(collect_list(col("c_name"))), ", ").as("rich_names"))
    }),

    // §2.6 ARRAY_AGG per parent (child-ticket aggregation,
    // integrate_new_requests.py:200-232) — array rendered as string for
    // a portable oracle compare
    "q09_child_array_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("num_orders"),
          array_join(
            transform(sort_array(collect_list(col("o_orderkey"))),
              x => x.cast(StringType)), ",").as("order_ids"))
    }),

    // §2.9 UNION DISTINCT (document_missed_requests,
    // transform_enrich_requests.py:88-94)
    "q10_union_distinct" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
      val b = c.filter(col("c_acctbal") < 0).select("c_nationkey")
      a.unionByName(b).distinct()
    }),

    // §2.6 CASE-bucketed report over UNION ALL branches (EEO-4,
    // ceridian_admin.py:5-57)
    "q11_case_bucket_report" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val bucketed = c.withColumn("balance_band",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high"))
      bucketed.groupBy("c_mktsegment", "balance_band").agg(count(lit(1)).as("n"))
    }),

    // §2.5 self-join lookup (manager self-join, ceridian_admin.py:112-119)
    "q12_selfjoin_lookup" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val heads = sup.groupBy(col("s_nationkey"))
        .agg(min("s_suppkey").as("head_suppkey"))
      val h = sup.select(col("s_suppkey").as("head_suppkey"),
        col("s_name").as("head_name"))
      sup.join(broadcast(heads), Seq("s_nationkey"), "left")
        .join(broadcast(h), Seq("head_suppkey"), "left")
        .select(col("s_suppkey"), col("s_name"), col("head_name"))
    }),

    // §2.10 date/time functions: DATE_TRUNC partition expr + date math
    // (finance_tax_delinquency_gis_wprdc_airflow.py:80)
    "q13_date_ops_monthly" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("order_month", date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd"))
        .groupBy("order_month", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("month_total"))
    }),

    // §2.10 string scalar surface: CONCAT/LOWER/UPPER/LPAD/split/LEFT
    "q14_string_ops" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        lpad(col("p_partkey").cast(StringType), 10, "0").as("padded_key"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        substring(col("p_brand"), 1, 6).as("brand_prefix"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"))
    }),

    // §2.3 ChangeDataTypes semantics: try_cast, posint guard, nullstr
    // (dataflow_utils.py:158-205)
    "q15_change_types" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT)").as("prop_k"),
        when(floor(col("value")).between(0, Int.MaxValue.toLong),
          floor(col("value")).cast(LongType)).as("posint_value"),
        nullif(col("event_type"), lit("")).as("event_type_nullstr"))
    }),

    // §2.3 ConvertBooleans token vocabulary (dataflow_utils.py:226-263)
    "q16_convert_booleans" -> ((s, d) => {
      val tok = lower(trim(col("event_type")))
      Tables.events(s, d)
        .withColumn("is_engagement",
          when(tok.isin("click", "purchase", "view"), lit(true))
            .when(tok.isin("error", "logout"), lit(false))
            .otherwise(lit(false))) // default-for-missing, per ConvertBooleans
        .groupBy("is_engagement")
        .agg(count(lit(1)).as("n"))
    }),

    // §2.3 FilterOutliers: out-of-range → NULL, row kept
    // (dataflow_utils.py:364-381)
    "q17_filter_outliers" -> ((s, d) => {
      ColumnOps.filterOutliers(Tables.events(s, d), "value", 1.0, 50.0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_in_range"),
          round(sum("value"), 2).as("sum_in_range"))
    }),

    // §2.5 as-of/latest-record join (join-to-max,
    // condemned_dead_end_properties.py:66-85)
    "q18_asof_latest_event" -> ((s, d) => {
      val e = Tables.events(s, d)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"))
    }),

    // §2.4 interval predicate / active-flag (IdentifyActivePermits,
    // computronix_gis_street_closures_dataflow.py:66-79) with a fixed
    // probe instant for determinism
    "q19_interval_active" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("active",
          col("ts").between(lit("2024-01-10 00:00:00").cast(TimestampType),
            lit("2024-01-20 00:00:00").cast(TimestampType)))
        .groupBy("event_type", "active")
        .agg(count(lit(1)).as("n"))
    }),

    // events tumbling-window style aggregation (micro-batch analog of
    // §2.12; hourly cadence ≙ the reference's @hourly DAGs)
    "q20_events_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("hour", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2""".stripMargin,

    "q02_join_chain_customer_geo" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q03_topk_semijoin" ->
      """WITH joined AS (
        |  SELECT p_type, l_returnflag FROM lineitem JOIN part ON l_partkey = p_partkey
        |), top10 AS (
        |  SELECT p_type FROM joined GROUP BY p_type
        |  ORDER BY count(*) DESC, p_type ASC LIMIT 10
        |)
        |SELECT j.p_type, j.l_returnflag, count(*) AS n_items
        |FROM joined j JOIN top10 t ON j.p_type = t.p_type
        |GROUP BY 1, 2""".stripMargin,

    "q04_antijoin_new_records" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin,

    "q05_semijoin_open_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin,

    "q06_dedup_keep_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""".stripMargin,

    "q07_pct_of_total" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
        |FROM customer GROUP BY 1""".stripMargin,

    "q08_string_agg_names" ->
      """SELECT n_name AS nation_name, count(*) AS n_rich,
        |  string_agg(c_name, ', ' ORDER BY c_name) AS rich_names
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9000
        |GROUP BY 1""".stripMargin,

    "q09_child_array_agg" ->
      """SELECT o_custkey, count(*) AS num_orders,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_ids
        |FROM orders GROUP BY 1""".stripMargin,

    "q10_union_distinct" ->
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_nationkey FROM customer WHERE c_acctbal < 0""".stripMargin,

    "q11_case_bucket_report" ->
      """SELECT c_mktsegment,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 3000 THEN 'low'
        |       WHEN c_acctbal < 7000 THEN 'mid'
        |       ELSE 'high' END AS balance_band,
        |  count(*) AS n
        |FROM customer GROUP BY 1, 2""".stripMargin,

    "q12_selfjoin_lookup" ->
      """SELECT s.s_suppkey, s.s_name, h.s_name AS head_name
        |FROM supplier s
        |LEFT JOIN (SELECT s_nationkey, min(s_suppkey) AS head_suppkey
        |           FROM supplier GROUP BY 1) m
        |  ON s.s_nationkey = m.s_nationkey
        |LEFT JOIN supplier h ON h.s_suppkey = m.head_suppkey""".stripMargin,

    "q13_date_ops_monthly" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
        |  o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS month_total
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q14_string_ops" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  substr(p_brand, 1, 6) AS brand_prefix,
        |  concat(p_brand, '/', p_type) AS brand_type
        |FROM part""".stripMargin,

    "q15_change_types" ->
      """SELECT event_id,
        |  try_cast(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS prop_k,
        |  CASE WHEN floor(value) BETWEEN 0 AND 2147483647
        |       THEN CAST(floor(value) AS BIGINT) END AS posint_value,
        |  nullif(event_type, '') AS event_type_nullstr
        |FROM events""".stripMargin,

    "q16_convert_booleans" ->
      """SELECT CASE WHEN lower(trim(event_type)) IN ('click','purchase','view') THEN TRUE
        |            WHEN lower(trim(event_type)) IN ('error','logout') THEN FALSE
        |            ELSE FALSE
        |       END AS is_engagement, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q17_filter_outliers" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(CASE WHEN value BETWEEN 1.0 AND 50.0 THEN value END) AS n_in_range,
        |  round(sum(CASE WHEN value BETWEEN 1.0 AND 50.0 THEN value END), 2) AS sum_in_range
        |FROM events GROUP BY 1""".stripMargin,

    "q18_asof_latest_event" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "q19_interval_active" ->
      """SELECT event_type,
        |  ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00' AS active,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q20_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
