package graft.queries

import graft.pipelines.{CherwellPipeline, ComputronixPliPipeline, EmployeeAdminPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed per-feed pipeline drivers as oracle-gated queries: each
  * runs a full reference dataflow composition (not an isolated
  * operator) over a deterministic literal fixture, so the DuckDB twin
  * is the hand-computed golden output.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // q53 — cherwell incidents (cherwell_incidents_dataflow.py:39-80)
  // ------------------------------------------------------------------

  private def cherwellDoc(kv: (String, String)*): String =
    kv.map { case (n, v) =>
      val vs = if (v == null) "null" else s""""$v""""
      s"""{"name": "$n", "value": $vs}"""
    }.mkString("""{"busObId": "6dd5", "fields": [""", ", ", "]}")

  private val cherwellFixture: Seq[String] = Seq(
    cherwellDoc(
      "IncidentID" -> "200", "CreatedDateTime" -> "06/15/2023 10:30:00 AM",
      "Status" -> "Closed", "AssignedTeam" -> "Network",
      "Stat_IncidentReopened" -> "True", "OnBehalfOf" -> "False"),
    cherwellDoc(
      "IncidentID" -> "201", "CreatedDateTime" -> "01/10/2023 08:00:00 AM",
      "Status" -> "Open", "AssignedTeam" -> "",
      "Stat_IncidentReopened" -> "False", "OnBehalfOf" -> "True"),
    cherwellDoc(
      "IncidentID" -> "202", "CreatedDateTime" -> "2023-07-04T12:00:00",
      "Status" -> "In Progress", "AssignedTeam" -> "Service Desk",
      "Stat_IncidentReopened" -> "False", "OnBehalfOf" -> "False"),
    cherwellDoc(
      "IncidentID" -> "203", "CreatedDateTime" -> "garbage",
      "Status" -> "New", "AssignedTeam" -> "Ops",
      "Stat_IncidentReopened" -> "True", "OnBehalfOf" -> "False"))

  // ------------------------------------------------------------------
  // q54 — computronix PLI xref flatten
  // (computronix_pli_permits_wprdc_dataflow.py:24-104)
  // ------------------------------------------------------------------

  private val cxFixture: Seq[String] = Seq(
    // full two-level nesting
    """{"EXTERNALFILENUM": "dc2021-01234", "permit_type": "electrical",
      |"ISSUEDATE": "03/01/2024", "ALLCONTRACTORSNAME": "acme electric",
      |"TYPEOFWORKDESCRIPTION": "new", "COMMERCIALORRESIDENTIAL": "commercial",
      |"WORKDESCRIPTION": "rewire", "TOTALPROJECTVALUE": 15000.0,
      |"JOBPARCELXREF": [{"PARCEL": {"FORMATTEDPARCELNUMBER": "1-X-1-1-1",
      |"ADDRESSABLEOBJEFORMATTEDADDRES": "123 main st",
      |"PARCELPARCELOWNERXREF": [{"PARCELOWNER": {"OWNERNAME": "jane roe"}}]}}]}""",
    // missing outer xref (the reference's IndexError branch)
    """{"EXTERNALFILENUM": "dc2021-09999", "permit_type": "building",
      |"ISSUEDATE": "bogus", "ALLCONTRACTORSNAME": null,
      |"TYPEOFWORKDESCRIPTION": "repair", "COMMERCIALORRESIDENTIAL": "residential",
      |"WORKDESCRIPTION": "roof", "TOTALPROJECTVALUE": 2000.0,
      |"JOBPARCELXREF": []}""",
    // outer xref present, inner owner xref missing
    """{"EXTERNALFILENUM": "dc2022-00007", "permit_type": "mechanical",
      |"ISSUEDATE": "07/15/2021", "ALLCONTRACTORSNAME": "hvac bros",
      |"TYPEOFWORKDESCRIPTION": "replace", "COMMERCIALORRESIDENTIAL": "residential",
      |"WORKDESCRIPTION": "furnace", "TOTALPROJECTVALUE": 800.5,
      |"JOBPARCELXREF": [{"PARCEL": {"FORMATTEDPARCELNUMBER": "0123-A-00045",
      |"ADDRESSABLEOBJEFORMATTEDADDRES": "9 oak ave",
      |"PARCELPARCELOWNERXREF": []}}]}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q55-q57 — employee-admin report family (ceridian_admin.py +
  // intime_admin.py) over literal rosters; the DuckDB oracle is the
  // reference SQL itself over the same VALUES
  // ------------------------------------------------------------------

  /** (employee_num, display_name, job_title, dept_desc, base_salary,
    * ethnicity, gender, status). base_salary < 0 encodes NULL (keeps
    * the tuple encoder simple).
    */
  private val employeeRows: Seq[(Long, String, String, String, Double, String, String, String)] = Seq(
    (1L, "Ann Lee", "Engineer", "DPW", 50000.0, "White", "M", "Active"),
    (2L, "Bo Chen", "Engineer", "DPW", 71000.0, "Black", "F", "Active"),
    (3L, "Cy Diaz", "Clerk", "Finance", 17000.0, "Asian", "F", "Active"),
    (4L, "Di Epps", "Analyst", "Finance", 30000.0, "White", "F", "Active"),
    (5L, "Ed Furr", "Community Liaison", "Office of the Mayor", 45000.0, "White", "M", "Active"),
    (6L, "Fay Gold", "Community Liaison", "DPW", 33000.0, "Black", "F", "Active"),
    (7L, "Gus Hart", "Engineer", "Historical", 60000.0, "White", "M", "Terminated"),
    (8L, "Ivy Jain", "Clerk", "Non-Employee Benefits", 18000.0, "Asian", "F", "Active"),
    (9L, "Kim Lund", "Clerk", "Finance", -1.0, "White", "M", "Active"),
    // duplicate employee_num 3: second position row (distinct-count vs
    // row-count divergence for the pct table)
    (3L, "Cy Diaz", "Clerk", "Finance", 17500.0, "Asian", "F", "Active"))

  private def employeesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    employeeRows.toDF("employee_num", "display_name", "job_title", "dept_desc",
        "__sal", "ethnicity", "gender", "status")
      .withColumn("base_salary", when(col("__sal") < 0, lit(null)).otherwise(col("__sal")))
      .drop("__sal")
  }

  private val employeeValuesSql: String = employeeRows.map { r =>
    val sal = if (r._5 < 0) "NULL" else r._5.toString
    s"(${r._1}, '${r._2}', '${r._3}', '${r._4}', $sal, '${r._6}', '${r._7}', '${r._8}')"
  }.mkString(", ")

  private val salaryCaseSql: String =
    """CASE
      |  WHEN base_salary <= 15999.89 THEN '$0.1 - $15.9'
      |  WHEN base_salary BETWEEN 16000.00 AND 19999.99 THEN '$16.0 - $19.9'
      |  WHEN base_salary BETWEEN 20000.00 AND 24999.99 THEN '$20.0 - $24.9'
      |  WHEN base_salary BETWEEN 25000.00 AND 32999.99 THEN '$25.0 - $32.9'
      |  WHEN base_salary BETWEEN 33000.00 AND 42999.99 THEN '$33.0 - $42.9'
      |  WHEN base_salary BETWEEN 43000.00 AND 54999.99 THEN '$43.0 - $54.9'
      |  WHEN base_salary BETWEEN 55000.00 AND 69999.99 THEN '$55.0 - $69.9'
      |  WHEN base_salary >= 70000.00 THEN '$70.0 PLUS'
      |  ELSE 'Unknown Range'
      |END""".stripMargin

  /** (assignment_id, parent_assignment_id [0 = NULL], employee_id,
    * permanent_rank, activity_name, start, end, unit, sub_assignment).
    */
  private val assignmentRows: Seq[(Long, Long, Long, String, String, String, String, String, Boolean)] = Seq(
    (101L, 0L, 11L, "Sergeant", "Acting Lieutenant",
      "2024-01-01 08:00:00", "2024-01-01 16:00:00", "Zone 1", false),
    (102L, 0L, 12L, "Officer", "Patrol",
      "2024-01-01 08:00:00", "2024-01-01 16:00:00", "Zone 2", false),
    (103L, 102L, 12L, "Officer", "Acting Sergeant",
      "2024-01-01 08:00:00", "2024-01-01 16:00:00", "Zone 2", true),
    (104L, 0L, 11L, "Sergeant", "Desk Officer",
      "2024-01-01 17:00:00", "2024-01-01 20:00:00", "Zone 1", false))

  private def assignmentsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    assignmentRows.toDF("assignment_id", "__parent", "employee_id",
        "permanent_rank", "activity_name", "__start", "__end", "unit", "sub_assignment")
      .withColumn("parent_assignment_id",
        when(col("__parent") === 0L, lit(null)).otherwise(col("__parent")))
      .withColumn("scheduled_start_time", col("__start").cast("timestamp"))
      .withColumn("scheduled_end_time", col("__end").cast("timestamp"))
      .drop("__parent", "__start", "__end")
  }

  private val assignmentValuesSql: String = assignmentRows.map { r =>
    val parent = if (r._2 == 0L) "NULL" else r._2.toString
    s"(${r._1}, $parent, ${r._3}, '${r._4}', '${r._5}', TIMESTAMP '${r._6}', TIMESTAMP '${r._7}', '${r._8}', ${r._9})"
  }.mkString(", ")

  val queries: Map[String, Q] = Map(
    // the full cherwell composition; booleans cast to INT for the
    // oracle hash (nullable booleans hash unreliably across engines)
    "q53_cherwell_extract" -> ((s, _) => {
      import s.implicits._
      val raw = s.read.schema(CherwellPipeline.rawSchema).json(cherwellFixture.toDS())
      CherwellPipeline.transform(raw)
        .select(col("id"), col("status"), col("assigned_team"),
          col("incident_reopened").cast("int").as("reopened"),
          col("on_behalf_of").cast("int").as("on_behalf"),
          col("created_date_UNIX").as("created_unix"),
          col("created_date_UTC").as("created_utc"),
          col("created_date_EST").as("created_est"))
    }),

    // the full computronix composition
    "q54_cx_xref_unnest" -> ((s, _) => {
      import s.implicits._
      val raw = s.read.schema(ComputronixPliPipeline.rawSchema).json(cxFixture.toDS())
      ComputronixPliPipeline.transform(raw)
        .select(col("ext_file_num"), col("permit_type"), col("owner_name"),
          col("parc_num"), col("obj_address"), col("total_proj_val"),
          col("commercial_or_residential"),
          col("issue_date_UNIX").as("issue_unix"))
    }),

    // EEO-4 over the persona roster: right-outer function lookup +
    // Community-Liaison split + salary banding + grouped counts
    "q55_eeo4_report" -> ((s, _) => {
      import s.implicits._
      val jobDetails = Seq(
        ("Engineer", "Professionals"), ("Clerk", "Administrative Support"),
        ("Laborer", "Skilled Craft")).toDF("job_title", "job_function")
      EmployeeAdminPipeline.eeo4Report(jobDetails, employeesDf(s))
    }),

    // pct-of-total demographics + hardcoded overall-city baselines
    "q56_pct_table" -> ((s, _) => {
      EmployeeAdminPipeline.percentageTable(employeesDf(s), "gender",
        Seq(("F", 0.52), ("M", 0.48)))
        .select(col("gender"), round(col("percentage"), 6).as("percentage"), col("type"))
    }),

    // InTime acting-rank assignment resolution (double left join +
    // sub-assignment self-join + CASE chain + as-of window)
    "q57_current_assignments" -> ((s, _) => {
      import s.implicits._
      val employeeData = Seq(
        (11L, "Jane Sgt", "Station 1"), (12L, "Bob Off", "Station 2"),
        (13L, "Idle Ida", "Station 3")).toDF("employee_id", "display_name", "unit")
      EmployeeAdminPipeline.currentAssignments(employeeData, assignmentsDf(s),
        asOf = "2024-01-01 12:00:00")
        .select("ceridian_id", "display_name", "permanent_rank", "current_rank",
          "current_activity", "sub_activity", "permanent_unit", "current_unit")
    }))

  val oracle: Map[String, String] = Map(
    "q53_cherwell_extract" ->
      """SELECT id, status, CASE WHEN assigned_team = '' THEN NULL ELSE assigned_team END AS assigned_team,
        |  CAST(reopened AS INTEGER) AS reopened,
        |  CAST(on_behalf AS INTEGER) AS on_behalf,
        |  CAST(created_unix AS BIGINT) AS created_unix, created_utc, created_est
        |FROM (VALUES
        |  ('200', 'Closed', 'Network', 1, 0, 1686839400,
        |   '06/15/2023 14:30:00+0000', '06/15/2023 10:30:00-0400'),
        |  ('201', 'Open', '', 0, 1, 1673355600,
        |   '01/10/2023 13:00:00+0000', '01/10/2023 08:00:00-0500'),
        |  ('202', 'In Progress', 'Service Desk', 0, 0, 1688486400,
        |   '07/04/2023 16:00:00+0000', '07/04/2023 12:00:00-0400'),
        |  ('203', 'New', 'Ops', 1, 0, NULL, NULL, NULL)
        |) t(id, status, assigned_team, reopened, on_behalf, created_unix, created_utc, created_est)""".stripMargin,

    "q54_cx_xref_unnest" ->
      """SELECT ext_file_num, permit_type, owner_name, parc_num, obj_address,
        |  CAST(total_proj_val AS DOUBLE) AS total_proj_val,
        |  commercial_or_residential,
        |  CAST(issue_unix AS BIGINT) AS issue_unix
        |FROM (VALUES
        |  ('DC2021-01234', 'ELECTRICAL', 'JANE ROE', '0001X00001000101',
        |   '123 MAIN ST', 15000.0, 'COMMERCIAL', 1709269200),
        |  ('DC2021-09999', 'BUILDING', NULL, 'invalid input',
        |   NULL, 2000.0, 'RESIDENTIAL', NULL),
        |  ('DC2022-00007', 'MECHANICAL', NULL, '0123A00045000000',
        |   '9 OAK AVE', 800.5, 'RESIDENTIAL', 1626321600)
        |) t(ext_file_num, permit_type, owner_name, parc_num, obj_address,
        |    total_proj_val, commercial_or_residential, issue_unix)""".stripMargin,

    // the reference's EEO-4 SQL (ceridian_admin.py:5-57) translated to
    // DuckDB over the same VALUES roster
    "q55_eeo4_report" ->
      s"""WITH employees AS (SELECT * FROM (VALUES $employeeValuesSql)
         |  t(employee_num, display_name, job_title, dept_desc, base_salary, ethnicity, gender, status)),
         |job_details AS (SELECT * FROM (VALUES
         |  ('Engineer', 'Professionals'), ('Clerk', 'Administrative Support'),
         |  ('Laborer', 'Skilled Craft')) t(job_title, job_function)),
         |general AS (
         |  SELECT j.job_function, e.base_salary, e.ethnicity, e.gender
         |  FROM job_details j RIGHT JOIN (
         |    SELECT job_title, base_salary, ethnicity, gender FROM employees
         |    WHERE dept_desc NOT IN ('Non-Employee Benefits', 'Historical')
         |      AND job_title <> 'Community Liaison') e USING (job_title)),
         |unioned AS (
         |  SELECT job_function, $salaryCaseSql AS salary_range, ethnicity, gender FROM general
         |  UNION ALL
         |  SELECT 'Officials and Administrators', $salaryCaseSql, ethnicity, gender FROM employees
         |  WHERE job_title = 'Community Liaison' AND dept_desc = 'Office of the Mayor'
         |  UNION ALL
         |  SELECT 'Professionals', $salaryCaseSql, ethnicity, gender FROM employees
         |  WHERE job_title = 'Community Liaison' AND dept_desc <> 'Office of the Mayor')
         |SELECT job_function, salary_range, ethnicity, gender, COUNT(*) AS counts
         |FROM unioned GROUP BY 1, 2, 3, 4""".stripMargin,

    // pct-of-total demographics (ceridian_admin.py:60-79)
    "q56_pct_table" ->
      s"""WITH employees AS (SELECT * FROM (VALUES $employeeValuesSql)
         |  t(employee_num, display_name, job_title, dept_desc, base_salary, ethnicity, gender, status)),
         |grouped AS (
         |  SELECT gender, COUNT(DISTINCT employee_num) AS cnt, COUNT(*) AS nrows
         |  FROM employees WHERE status = 'Active' GROUP BY gender),
         |city AS (
         |  SELECT gender, CAST(cnt AS DOUBLE) / SUM(nrows) OVER () AS percentage,
         |    'City Employee' AS type FROM grouped)
         |SELECT gender, ROUND(percentage, 6) AS percentage, type FROM city
         |UNION ALL
         |SELECT * FROM (VALUES ('F', CAST(0.52 AS DOUBLE), 'Overall City'),
         |  ('M', CAST(0.48 AS DOUBLE), 'Overall City')) t(gender, percentage, type)""".stripMargin,

    // InTime acting-rank resolution (intime_admin.py:4-31)
    "q57_current_assignments" ->
      s"""WITH employee_data AS (SELECT * FROM (VALUES
         |  (11, 'Jane Sgt', 'Station 1'), (12, 'Bob Off', 'Station 2'),
         |  (13, 'Idle Ida', 'Station 3')) t(employee_id, display_name, unit)),
         |assignments AS (SELECT * FROM (VALUES $assignmentValuesSql)
         |  t(assignment_id, parent_assignment_id, employee_id, permanent_rank,
         |    activity_name, scheduled_start_time, scheduled_end_time, unit, sub_assignment)),
         |sub AS (
         |  SELECT assignment_id AS sub_assignment_id, parent_assignment_id AS sub_parent,
         |    activity_name AS sub_activity
         |  FROM assignments WHERE sub_assignment),
         |joined AS (
         |  SELECT e.employee_id, e.display_name, e.unit AS permanent_unit,
         |    a.permanent_rank, a.activity_name, a.unit AS current_unit,
         |    a.scheduled_start_time, a.scheduled_end_time, s.sub_activity
         |  FROM employee_data e
         |  LEFT JOIN assignments a ON e.employee_id = a.employee_id
         |  LEFT JOIN sub s ON a.assignment_id = s.sub_parent)
         |SELECT CAST(employee_id AS BIGINT) AS ceridian_id, display_name, permanent_rank,
         |  CASE WHEN activity_name LIKE 'Acting%' THEN activity_name
         |       WHEN activity_name = 'Desk Officer' THEN activity_name
         |       WHEN COALESCE(activity_name, '') <> sub_activity
         |         AND sub_activity LIKE 'Acting%' THEN sub_activity
         |       ELSE permanent_rank END AS current_rank,
         |  activity_name AS current_activity, sub_activity,
         |  permanent_unit, current_unit
         |FROM joined
         |WHERE (activity_name IS NOT NULL OR sub_activity IS NOT NULL)
         |  AND TIMESTAMP '2024-01-01 12:00:00'
         |    BETWEEN scheduled_start_time AND scheduled_end_time""".stripMargin)
}
