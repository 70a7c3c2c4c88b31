package graft.queries

import graft.Tables
import graft.operators.AddressOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third wave: reference idioms checked through literal-data oracles
  * (VALUES on both sides) and the remaining SQL-generator patterns —
  * diff joins, rounding-tolerance comparisons, CSV-membership LIKE
  * tests, LEFT-truncation.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The address-classification golden set (runs on literal rows — the
    * classification decision tree itself is the operator under test;
    * tests/test_dataflow_utils.py:73-116).
    */
  private val addressRows = Seq(
    (1L, "123", "Main St", "", "Pittsburgh", 40.44, -79.99),
    (2L, "", "Forbes Ave", "Murray Ave", "Pittsburgh", 40.43, -79.92),
    (3L, "55XX", "Fifth Ave", "", "Pittsburgh", 40.45, -79.93),
    (4L, "", "", "", "Pittsburgh", 40.46, -79.94),
    (5L, "", "", "", "Pittsburgh", 0.0, 0.0),
    (6L, "7", "Grant St", "Liberty Ave", "Pittsburgh", 40.44, -79.996))

  val queries: Map[String, Q] = Map(
    // §2.11 FormatAndClassifyAddress as an oracle-checked decision tree
    "q39_address_classify" -> ((s, _) => {
      import s.implicits._
      val df = addressRows.toDF("rid", "street_num", "street_name",
        "cross_street", "city", "lat", "long")
      AddressOps.formatAndClassifyAddress(df,
        "street_num", "street_name", "cross_street", "city", "lat", "long",
        containsPii = false)
        .select(col("rid"), col("address_type"), col("input_address"))
    }),

    // §2.5 diff/comparison join (ad_admin.py:21-36): null-safe
    // lowercase mismatch OR-chain between "staging" and "master" rows
    "q40_diff_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.select(col("c_custkey").as("k"),
        col("c_name").as("a_name"), col("c_mktsegment").as("a_seg"))
      val b = c.select((col("c_custkey") + 1).as("k"),
        col("c_name").as("b_name"), col("c_mktsegment").as("b_seg"))
      a.join(b, Seq("k"))
        .filter(
          coalesce(lower(col("a_seg")), lit("")) =!= coalesce(lower(col("b_seg")), lit("")))
        .select(col("k"), col("a_seg"), col("b_seg"))
    }),

    // §2.5 rounding-tolerance comparison (ceridian_admin.py:82-109):
    // ROUND(x,1) != ROUND(y,1) across joined systems
    "q41_rounding_tolerance" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      // e1 floor lattice, not round(_, 1): acctbal is SIGNED raw data,
      // so a balance in (−0.05, 0) would close round() to a ±0.0 whose
      // sign drifts across DuckDB releases (the q290 class, VERDICT
      // r15 #2); the lattice is the comparison key AND the displayed
      // value, identically on both legs
      def e1(col0: org.apache.spark.sql.Column) =
        floor(col0 * lit(10d) + lit(0.5d)) / lit(10d)
      c.join(sup, col("c_custkey") === col("s_suppkey"))
        .filter(e1(col("c_acctbal")) =!= e1(col("s_acctbal")))
        .select(col("c_custkey"),
          e1(col("c_acctbal")).as("cust_bal"),
          e1(col("s_acctbal")).as("supp_bal"))
    }),

    // §2.10 membership-in-CSV-string LIKE test
    // (integrate_new_requests.py:11-13: NOT LIKE CONCAT('%, ', x, '%'))
    "q42_csv_membership" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9990)
      val csv = c.groupBy(col("c_nationkey"))
        .agg(array_join(sort_array(collect_list(col("c_name"))), ", ").as("name_csv"))
      val probe = Tables.customer(s, d)
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
      probe.join(csv, Seq("c_nationkey"), "left")
        .withColumn("in_rich_list",
          coalesce(expr("concat(', ', name_csv, ', ') LIKE concat('%, ', c_name, ', %')"),
            lit(false)))
        .select("c_custkey", "in_rich_list")
    }),

    // §2.10 LEFT(x, LENGTH(x)-6) truncation
    // (transform_enrich_requests.py:129) + SAFE_CAST
    "q43_left_truncate" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        expr("substring(p_name, 1, greatest(length(p_name) - 6, 0))").as("name_trunc"),
        expr("try_cast(p_brand AS DOUBLE)").as("brand_as_num"))
    })
  )

  private def valuesClause: String = addressRows.map { case (id, num, name, cross, city, lat, long) =>
    s"($id, '$num', '$name', '$cross', '$city', $lat, $long)"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q39_address_classify" ->
      s"""WITH t(rid, street_num, street_name, cross_street, city, lat, long) AS (
         |  VALUES $valuesClause
         |)
         |SELECT CAST(rid AS BIGINT) AS rid,
         |  CASE WHEN street_name IS NOT NULL AND street_name != '' THEN
         |         CASE WHEN regexp_matches(street_num, '^[0-9]+$$') THEN 'Precise'
         |              WHEN street_num = '' AND cross_street != '' THEN 'Intersection'
         |              ELSE 'Underspecified' END
         |       WHEN lat != 0.0 AND long != 0.0 THEN 'Coordinates Only'
         |       ELSE 'Missing' END AS address_type,
         |  CASE WHEN street_name IS NOT NULL AND street_name != '' THEN
         |         CASE WHEN street_num = '' AND cross_street != ''
         |                   AND NOT regexp_matches(street_num, '^[0-9]+$$')
         |              THEN street_name || ' and ' || cross_street || ', ' || city
         |              ELSE street_num || ' ' || street_name || ', ' || city END
         |  END AS input_address
         |FROM t""".stripMargin,

    "q40_diff_join" ->
      """SELECT a.c_custkey AS k, a.c_mktsegment AS a_seg, b.c_mktsegment AS b_seg
        |FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey + 1
        |WHERE coalesce(lower(a.c_mktsegment), '') != coalesce(lower(b.c_mktsegment), '')""".stripMargin,

    "q41_rounding_tolerance" ->
      """SELECT c_custkey,
        |  floor(c_acctbal * 10 + 0.5) / 10 AS cust_bal,
        |  floor(s_acctbal * 10 + 0.5) / 10 AS supp_bal
        |FROM customer JOIN supplier ON c_custkey = s_suppkey
        |WHERE floor(c_acctbal * 10 + 0.5) / 10
        |   != floor(s_acctbal * 10 + 0.5) / 10""".stripMargin,

    "q42_csv_membership" ->
      """WITH csv AS (
        |  SELECT c_nationkey,
        |    string_agg(c_name, ', ' ORDER BY c_name) AS name_csv
        |  FROM customer WHERE c_acctbal > 9990 GROUP BY 1
        |)
        |SELECT p.c_custkey,
        |  coalesce((', ' || csv.name_csv || ', ') LIKE ('%, ' || p.c_name || ', %'), FALSE)
        |    AS in_rich_list
        |FROM (SELECT c_custkey, c_nationkey, c_name FROM customer WHERE c_custkey <= 200) p
        |LEFT JOIN csv USING (c_nationkey)""".stripMargin,

    "q43_left_truncate" ->
      """SELECT p_partkey,
        |  substring(p_name, 1, greatest(length(p_name) - 6, 0)) AS name_trunc,
        |  try_cast(p_brand AS DOUBLE) AS brand_as_num
        |FROM part""".stripMargin
  )
}
