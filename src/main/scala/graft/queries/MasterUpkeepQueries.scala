package graft.queries

import graft.pipelines.{ComputronixPliPipeline, QalertPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's master-table maintenance SQL as composed operators,
  * oracle-checked against the ORIGINAL query shapes run by DuckDB over
  * the same VALUES fixtures — the oracle is the reference SQL itself,
  * not a hand-computed golden. The `(VALUES ...) t(...)` subquery form
  * parses identically in Spark SQL and DuckDB, so each fixture is
  * declared once and fed verbatim to both engines.
  */
object MasterUpkeepQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // fixtures (shared Spark/DuckDB SQL text)
  // ------------------------------------------------------------------

  /** SCD2 dimension fixture: C1 carries a closed historical version
    * (must pass through untouched), C4's NULL name meets a staged ''
    * (the IFNULL rule says equal → unchanged).
    */
  private val scd2DimSql =
    """(VALUES
      |  ('C1', 'Ann', 'Oak',  '2024-01-01', CAST(NULL AS STRING), true),
      |  ('C1', 'Ann', 'Elm',  '2023-06-01', '2024-01-01', false),
      |  ('C2', 'Bob', 'Pine', '2024-01-01', CAST(NULL AS STRING), true),
      |  ('C3', 'Cy',  'Ash',  '2024-01-01', CAST(NULL AS STRING), true),
      |  ('C4', CAST(NULL AS STRING), 'Gum', '2024-01-01', CAST(NULL AS STRING), true)
      |) t(cust_id, name, city, valid_from, valid_to, is_current)""".stripMargin

  /** SCD2 staging snapshot: C1 unchanged, C2 changed (close + reopen),
    * C4 NULL-vs-'' unchanged, C9 brand new; C3 absent (untouched).
    */
  private val scd2StagingSql =
    """(VALUES
      |  ('C1', 'Ann', 'Oak'),
      |  ('C2', 'Bob', 'Birch'),
      |  ('C4', '', 'Gum'),
      |  ('C9', 'New', 'Fir')
      |) t(cust_id, name, city)""".stripMargin

  private val cdeIncomingSql =
    """(VALUES
      |  ('P1', 'Condemned Property', 'Active', '1 A St', 100),
      |  ('P1', 'Condemned Property', 'Active', '1 A St', 100),
      |  (NULL, 'Dead End Property', 'Active', '2 B St', 101),
      |  (NULL, 'Condemned Property', 'Active', '3 C St', 102),
      |  ('P2', 'Routine Inspection', 'Active', '4 D St', 103),
      |  ('P3', 'Dead End Property', 'Closed', '5 E St', 104)
      |) t(parc_num, insp_type_desc, insp_status, address, create_date_UNIX)""".stripMargin

  private val cdeExistingSql =
    """(VALUES
      |  ('P1', 'Condemned Property', 'Closed', '1 A St', 90),
      |  ('P9', 'Condemned Property', 'Active', '9 Z St', 80),
      |  ('P9', 'Condemned Property', 'Active', '9 Z St', 80)
      |) t(parc_num, insp_type_desc, insp_status, address, create_date_UNIX)""".stripMargin

  private val cdeMasterSql =
    """(VALUES
      |  ('P1', 'Condemned Property', 'Active', 90),
      |  ('P1', 'Condemned Property', 'Active', 100),
      |  ('P2', 'Dead End Property', 'Closed', 105),
      |  ('P2', 'Dead End Property', 'Active', 110),
      |  ('P3', 'Condemned Property', 'Closed', 120)
      |) t(parc_num, insp_type_desc, insp_status, create_date_UNIX)""".stripMargin

  private val submitterLatestSql =
    """(VALUES
      |  ('501', 'Pat', 'Kim', 'p@x', '412', '1 Elm', CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA', '15222', NULL, 5, 4),
      |  ('501', 'Pat', 'Kim', 'p@x', '412', '1 Elm', CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA', '15222', NULL, 7, 5),
      |  ('502', 'Sam', 'Cox', 's@x', NULL, '2 Oak', CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA', '15213', 'sam', 1, 0)
      |) t(submitter_id, first_name, last_name, email, phone, address, address_2,
      |    city, state, zip, twitter_name,
      |    curr_total_requests_made, curr_total_requests_closed)""".stripMargin

  private val submitterExistingSql =
    """(VALUES
      |  ('502', 'Sam', 'Cox', 's@x', NULL, '2 Oak', CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA', '15213', 'sam', 9, 9),
      |  ('777', 'Old', 'User', NULL, NULL, '3 Ash', CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA', '15219', NULL, 2, 2)
      |) t(submitter_id, first_name, last_name, email, phone, address, address_2,
      |    city, state, zip, twitter_name, total_requests_made, total_requests_closed)""".stripMargin

  private val lsSql =
    """(VALUES
      |  ('1111', '501', 'Pat', 'Kim', 'p@x', '412', '1 Elm',
      |   CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA',
      |   '15222', NULL, '2024-01-02', '2024-01-03', 5, 4, 'Very Satisfied', 'WEB'),
      |  ('1112', '502', 'Sam', 'Cox', 's@x', NULL, '2 Oak',
      |   CAST(NULL AS VARCHAR(32)), 'Pgh', 'PA',
      |   '15213', 'sam', NULL, NULL, 1, 0, NULL, 'PHONE')
      |) t(request_id, submitter_id, first_name, last_name, email, phone, address,
      |    address_2, city, state, zip, twitter_name, last_request_date,
      |    last_modified_date, curr_total_requests_made,
      |    curr_total_requests_closed, satisfaction_level, origin)""".stripMargin

  private val ticketsSql =
    """(VALUES
      |  ('1112', '2024-02-01 10:00:00', 'Potholes', '2 Oak St, Pittsburgh', 'Bloomfield')
      |) t(id, create_date_est, request_type_name, pii_google_formatted_address,
      |    neighborhood_name)""".stripMargin

  private val utilizersSql =
    """(VALUES ('1111', '501')) t(request_id, submitter_id)""".stripMargin

  private val summariesSql =
    """(VALUES
      |  ('0999', '2023-06-01 09:00:00', 'Graffiti', '9 Old St', '400', 'Leg',
      |   'Acy', NULL, NULL, NULL, CAST(NULL AS VARCHAR(32)), NULL, NULL, NULL,
      |   'Carrick', NULL,
      |   '2023-06-01', '2023-06-02', 3, 3, 'Unsatisfied', 'LEGACY')
      |) t(request_id, create_date_est, request_type_name, complaint_address,
      |    submitter_id, first_name, last_name, email, phone, address, address_2,
      |    city, state, zip, neighborhood_name, twitter_name, last_request_date,
      |    last_modified_date, curr_total_requests_made,
      |    curr_total_requests_closed, satisfaction_level, origin)""".stripMargin

  private val stagingUpdSql =
    """(VALUES
      |  (1, 'a', 10), (2, 'b', 20), (3, NULL, 30), (5, 'e', 50)
      |) t(id, name, qty)""".stripMargin

  private val stagingSrcSql =
    """(VALUES
      |  (1, 'a', 10), (2, 'bX', 20), (2, 'bX', 20), (3, '', 30), (4, 'd', 40),
      |  (5, 'e', 55)
      |) t(src_id, name, qty)""".stripMargin

  private def fromValues(s: SparkSession, valuesSql: String): DataFrame =
    s.sql(s"SELECT * FROM $valuesSql")

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // SCD Type 2 merge: history-preserving dimension upsert — close
    // changed current versions at the batch timestamp, open new ones,
    // insert brand-new keys, pass history and untouched keys through.
    // No windows: one current-slice join + one anti-join + unions.
    "q123_scd2_merge" -> ((s, _) =>
      graft.tables.MasterTables.scd2Merge(
        fromValues(s, scd2DimSql), fromValues(s, scd2StagingSql),
        keys = Seq("cust_id"), attrs = Seq("name", "city"),
        batchTs = lit("2024-06-01"))),

    "q68_cde_combine" -> ((s, _) =>
      ComputronixPliPipeline.combineCondemnedDeadEnd(
          fromValues(s, cdeIncomingSql), fromValues(s, cdeExistingSql))
        .select(col("parc_num"), col("insp_type_desc"), col("insp_status"),
          col("address"), col("create_date_UNIX").cast("int").as("create_unix"))),

    "q69_cde_latest_gis" -> ((s, _) =>
      ComputronixPliPipeline.latestUpdateActive(fromValues(s, cdeMasterSql))
        .select(col("parc_num"), col("insp_type_desc"), col("insp_status"),
          col("create_date_UNIX").cast("int").as("create_unix"),
          col("parc_unique_id").cast("int").as("parc_unique_id"))),

    "q70_submitter_rollup" -> ((s, _) =>
      QalertPipeline.submitterRollup(
          fromValues(s, submitterLatestSql), fromValues(s, submitterExistingSql))
        .select(col("submitter_id"), col("first_name"), col("last_name"),
          col("email"), col("phone"), col("address"), col("address_2"),
          col("city"), col("state"), col("zip"), col("twitter_name"),
          col("total_requests_made").cast("int").as("total_requests_made"),
          col("total_requests_closed").cast("int").as("total_requests_closed"))),

    "q71_utilizers_append" -> ((s, _) =>
      QalertPipeline.utilizersAppend(
          fromValues(s, lsSql), fromValues(s, ticketsSql),
          fromValues(s, utilizersSql), fromValues(s, summariesSql))
        .select(col("request_id"), col("submitter_id"), col("create_date_est"),
          col("request_type_name"), col("complaint_address"),
          col("first_name"), col("last_name"), col("email"), col("phone"),
          col("address"), col("address_2"), col("city"), col("state"),
          col("zip"), col("neighborhood_name"), col("twitter_name"),
          col("last_request_date"), col("last_modified_date"),
          col("curr_total_requests_made").cast("int").as("curr_total_requests_made"),
          col("curr_total_requests_closed").cast("int").as("curr_total_requests_closed"),
          col("satisfaction_level"), col("origin"))),

    "q74_changed_staging" -> ((s, _) =>
      graft.tables.MasterTables.changedRecordsStaging(
          fromValues(s, stagingUpdSql), fromValues(s, stagingSrcSql),
          "id", "src_id", Seq("name", "qty"), dedup = true)
        .select(col("id").cast("int").as("id"), col("name"),
          col("qty").cast("int").as("qty"))))

  // ------------------------------------------------------------------
  // oracles — the reference SQL shapes themselves, over the same VALUES
  // ------------------------------------------------------------------

  val oracle: Map[String, String] = Map(
    // independent SCD2 recomputation over the shared fixture: current
    // slice LEFT-joined to staging, the IFNULL('') change rule, close
    // + reopen + fresh-insert branches re-assembled with UNION ALL
    "q123_scd2_merge" ->
      s"""WITH dim AS (SELECT * FROM $scd2DimSql),
         |stg AS (SELECT * FROM $scd2StagingSql),
         |cur AS (SELECT * FROM dim WHERE is_current),
         |hist AS (SELECT * FROM dim WHERE NOT is_current),
         |j AS (
         |  SELECT c.cust_id, c.name, c.city, c.valid_from, c.valid_to,
         |    c.is_current, s.name AS s_name, s.city AS s_city,
         |    s.cust_id IS NOT NULL AND (
         |      coalesce(c.name, '') <> coalesce(s.name, '') OR
         |      coalesce(c.city, '') <> coalesce(s.city, '')) AS chg
         |  FROM cur c LEFT JOIN stg s USING (cust_id)
         |)
         |SELECT cust_id, name, city, valid_from, valid_to, is_current FROM hist
         |UNION ALL
         |SELECT cust_id, name, city, valid_from,
         |  CASE WHEN chg THEN '2024-06-01' ELSE valid_to END,
         |  CASE WHEN chg THEN false ELSE is_current END
         |FROM j
         |UNION ALL
         |SELECT cust_id, s_name, s_city, '2024-06-01', NULL, true
         |FROM j WHERE chg
         |UNION ALL
         |SELECT s.cust_id, s.name, s.city, '2024-06-01', NULL, true
         |FROM stg s LEFT JOIN cur c USING (cust_id)
         |WHERE c.cust_id IS NULL""".stripMargin,

    // condemned_dead_end_properties.py:5-47 verbatim (LIKE without
    // wildcards == equality)
    "q68_cde_combine" ->
      s"""WITH new_t AS (
         |  SELECT DISTINCT * FROM $cdeIncomingSql
         |  WHERE (parc_num IS NOT NULL AND insp_type_desc LIKE 'Condemned Property')
         |     OR (insp_type_desc LIKE 'Dead End Property')
         |),
         |missing_rec_t AS (
         |  SELECT DISTINCT old_t.* FROM (SELECT * FROM $cdeExistingSql) old_t
         |  LEFT OUTER JOIN new_t ON old_t.parc_num = new_t.parc_num
         |  WHERE new_t.parc_num IS NULL
         |)
         |SELECT DISTINCT parc_num, insp_type_desc, insp_status, address,
         |  CAST(create_date_UNIX AS INTEGER) AS create_unix
         |FROM (
         |  SELECT * FROM new_t WHERE parc_num IS NOT NULL
         |  UNION ALL
         |  SELECT * FROM missing_rec_t WHERE parc_num IS NOT NULL)""".stripMargin,

    // condemned_dead_end_properties.py:66-85 with the deterministic
    // (create_date_UNIX, parc_num) tiebreak applied on both sides
    "q69_cde_latest_gis" ->
      s"""SELECT cde.parc_num, cde.insp_type_desc, cde.insp_status,
         |  CAST(cde.create_date_UNIX AS INTEGER) AS create_unix,
         |  CAST(ROW_NUMBER() OVER (ORDER BY cde.create_date_UNIX, cde.parc_num)
         |       AS INTEGER) AS parc_unique_id
         |FROM (SELECT * FROM $cdeMasterSql) cde
         |JOIN (SELECT MAX(create_date_UNIX) AS max_date, parc_num
         |      FROM $cdeMasterSql GROUP BY parc_num) AS max_vals
         |  ON cde.create_date_UNIX = max_vals.max_date
         | AND cde.parc_num = max_vals.parc_num
         |WHERE cde.insp_status LIKE 'Active'""".stripMargin,

    // submitter_admin.py:26-40 verbatim
    "q70_submitter_rollup" ->
      s"""SELECT DISTINCT submitter_id, first_name, last_name, email, phone,
         |  address, address_2, city, state, zip, twitter_name,
         |  CAST(MAX(curr_total_requests_made) AS INTEGER) AS total_requests_made,
         |  CAST(MAX(curr_total_requests_closed) AS INTEGER) AS total_requests_closed
         |FROM $submitterLatestSql
         |GROUP BY submitter_id, first_name, last_name, email, phone, address,
         |  address_2, city, state, zip, twitter_name
         |UNION ALL
         |SELECT DISTINCT submitter_id, first_name, last_name, email, phone,
         |  address, address_2, city, state, zip, twitter_name,
         |  CAST(total_requests_made AS INTEGER),
         |  CAST(total_requests_closed AS INTEGER)
         |FROM $submitterExistingSql
         |WHERE submitter_id NOT IN (SELECT submitter_id FROM $submitterLatestSql)""".stripMargin,

    // submitter_admin.py:4-24 verbatim (CONCAT pair guard)
    "q71_utilizers_append" ->
      s"""SELECT request_id, submitter_id, create_date_est, request_type_name,
         |  pii_google_formatted_address AS complaint_address, first_name,
         |  last_name, email, phone, address, address_2, ls.city, state, zip,
         |  neighborhood_name, twitter_name, last_request_date,
         |  last_modified_date,
         |  CAST(curr_total_requests_made AS INTEGER) AS curr_total_requests_made,
         |  CAST(curr_total_requests_closed AS INTEGER) AS curr_total_requests_closed,
         |  satisfaction_level, origin
         |FROM (SELECT * FROM $lsSql) ls
         |LEFT OUTER JOIN (SELECT * FROM $ticketsSql) atcs ON ls.request_id = atcs.id
         |WHERE CONCAT(request_id, submitter_id) NOT IN
         |  (SELECT CONCAT(request_id, submitter_id) FROM $utilizersSql)
         |UNION ALL
         |SELECT request_id, submitter_id, create_date_est, request_type_name,
         |  complaint_address, first_name, last_name, email, phone, address,
         |  address_2, city, state, zip, neighborhood_name, twitter_name,
         |  last_request_date, last_modified_date,
         |  CAST(curr_total_requests_made AS INTEGER),
         |  CAST(curr_total_requests_closed AS INTEGER),
         |  satisfaction_level, origin
         |FROM $summariesSql""".stripMargin,

    // general_queries.py:101-129 verbatim: INNER JOIN on the id, source
    // values selected, IFNULL-compare change filter, DISTINCT (the
    // is_deduped=True form). NULL-vs-empty compares equal (id 3); an
    // unchanged row (id 1) and an unmatched source row (id 4) drop out.
    "q74_changed_staging" ->
      s"""SELECT DISTINCT CAST(id AS INTEGER) AS id, src.name,
         |  CAST(src.qty AS INTEGER) AS qty
         |FROM (SELECT * FROM $stagingUpdSql) upd
         |INNER JOIN (SELECT DISTINCT src_id, name, qty
         |            FROM (SELECT * FROM $stagingSrcSql)) src
         |  ON upd.id = src.src_id
         |WHERE IFNULL(CAST(upd.name AS VARCHAR), '') != IFNULL(CAST(src.name AS VARCHAR), '')
         |   OR IFNULL(CAST(upd.qty AS VARCHAR), '') != IFNULL(CAST(src.qty AS VARCHAR), '')""".stripMargin)
}
