package graft.queries

import graft.pipelines.FeedPipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated drivers for the remaining per-feed pipelines
  * (ceridian employees / job codes / timekeeping / accruals, intime
  * assignments, active-directory users, chargepoint sessions): each
  * runs the full reference dataflow composition over a deterministic
  * literal ndjson fixture, and the DuckDB twin is the hand-computed
  * golden output.
  */
object FeedQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // q59 — ceridian employees (ceridian_employees_dataflow.py:45-90)
  // ------------------------------------------------------------------

  private val ceridianFixture: Seq[String] = Seq(
    """{"EmployeeEmploymentStatus_EmployeeNumber": 1001, "Employee_FirstName": "Ann",
      |"Employee_LastName": "Lee", "Employee_DisplayName": "Ann Lee",
      |"Department_LongName": "Public Works", "Department_ShortName": "50-DPW",
      |"Job_ShortName": "Engineer", "EmployeeEmploymentStatus_BaseSalary": "50000.50",
      |"Employee_HireDate": "2020-01-15T00:00:00", "Employee_TerminationDate": null,
      |"EmployeeWorkAssignment_EffectiveStart": "2021-06-01T08:00:00",
      |"EmployeeEmploymentStatus_CreatedTimestamp": "2021-06-02T09:30:00",
      |"EmploymentStatusReason_LongName": "Hired", "DFUnion_ShortName": "AFSCME",
      |"EmploymentStatus_LongName": "Active", "PayClass_LongName": "Full Time",
      |"EmployeeManager_ManagerDisplayName": "Zoe Q",
      |"DFEthnicity_ShortName": "White (Not Hispanic or Latino)",
      |"Employee_Gender": "F", "SSOLogin": "alee", "Employee_CommonName": "Ann",
      |"EmploymentStatus_ShortName": "ACT"}""",
    """{"EmployeeEmploymentStatus_EmployeeNumber": 731, "Employee_FirstName": "Bo",
      |"Employee_LastName": "Chen", "Employee_DisplayName": "Bo Chen",
      |"Department_LongName": "Finance Dept", "Department_ShortName": "Finance",
      |"Job_ShortName": "Clerk", "EmployeeEmploymentStatus_BaseSalary": "junk",
      |"Employee_HireDate": null, "Employee_TerminationDate": "2024-02-01T00:00:00",
      |"EmployeeWorkAssignment_EffectiveStart": null,
      |"EmployeeEmploymentStatus_CreatedTimestamp": null,
      |"EmploymentStatusReason_LongName": "Resigned", "DFUnion_ShortName": null,
      |"EmploymentStatus_LongName": "Terminated", "PayClass_LongName": "Part Time",
      |"EmployeeManager_ManagerDisplayName": null, "DFEthnicity_ShortName": null,
      |"Employee_Gender": "M", "SSOLogin": "bchen", "Employee_CommonName": "Bo",
      |"EmploymentStatus_ShortName": "TER"}""",
    """{"EmployeeEmploymentStatus_EmployeeNumber": 88, "Employee_FirstName": "Cy",
      |"Employee_LastName": "Diaz", "Employee_DisplayName": "Cy Diaz",
      |"Department_LongName": "Parks and Recreation",
      |"Department_ShortName": "10-Parks-East", "Job_ShortName": "Ranger",
      |"EmployeeEmploymentStatus_BaseSalary": "NaN",
      |"Employee_HireDate": "2018-03-02T08:30:00", "Employee_TerminationDate": null,
      |"EmployeeWorkAssignment_EffectiveStart": "2018-03-02T08:30:00",
      |"EmployeeEmploymentStatus_CreatedTimestamp": "2018-03-03T00:00:00",
      |"EmploymentStatusReason_LongName": "Hired", "DFUnion_ShortName": "Teamsters",
      |"EmploymentStatus_LongName": "Active", "PayClass_LongName": "Full Time",
      |"EmployeeManager_ManagerDisplayName": "Ann Lee",
      |"DFEthnicity_ShortName": "Black or African American (Not Hispanic)",
      |"Employee_Gender": null, "SSOLogin": "cdiaz", "Employee_CommonName": "Cy",
      |"EmploymentStatus_ShortName": "ACT"}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q60 — intime assignments (intime_assignments_dataflow.py:24-90)
  // ------------------------------------------------------------------

  private val intimeFixture: Seq[String] = Seq(
    """{"assignmentId": 9001, "parentAssignmentId": null, "employeeId": 77,
      |"date": "2024-03-04T00:00:00", "employeeFullName": "Jane Doe",
      |"customerName": "Court A", "locationName": "HQ", "rankName": "Officer",
      |"unitName": "Zone 1", "timeBankCode": "SICK", "subAssignment": "true",
      |"hoursSchedMinHours": "8.0", "timeBankHours": "4.5",
      |"scheduledStartTime": "2024-03-04T08:00:00",
      |"scheduledEndTime": "2024-03-04T16:00:00",
      |"customerCode": "CC1", "note": "drop me", "origin": "api"}""",
    """{"assignmentId": 9002, "parentAssignmentId": 9001, "employeeId": 78,
      |"date": "2024-03-05T00:00:00", "employeeFullName": "Sam Cox",
      |"customerName": null, "locationName": "South", "rankName": "Sergeant",
      |"unitName": "Zone 2", "timeBankCode": null, "subAssignment": "False",
      |"hoursSchedMinHours": "", "timeBankHours": null,
      |"scheduledStartTime": null,
      |"scheduledEndTime": "2024-03-05T12:30:00",
      |"customerCode": null, "note": null, "origin": null}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q61 — active directory users (active_directory_users_dataflow.py)
  // ------------------------------------------------------------------

  private val adFixture: Seq[String] = Seq(
    """{"givenName": "Al", "sn": "Po", "cn": "Al Po", "sAMAccountName": "apo",
      |"mail": "apo@x.gov", "userAccountControl": "512",
      |"department": "PS - Police", "employeeId": 77}""",
    """{"givenName": "Bea", "sn": "Ng", "cn": "Bea Ng", "sAMAccountName": "bng",
      |"mail": null, "userAccountControl": "514",
      |"department": "Unknown Dept", "employeeId": "A12"}""",
    """{"givenName": "Cal", "sn": "Ott", "cn": "Cal Ott", "sAMAccountName": "cott",
      |"mail": "cott@x.gov", "userAccountControl": null,
      |"department": "PW Ops", "employeeId": 5}""")
    .map(_.stripMargin.replace("\n", " "))

  private val adDeptMapping =
    Map("PS - Police" -> "Police", "PW Ops" -> "Public Works")

  // ------------------------------------------------------------------
  // q62 — chargepoint sessions (chargepoint_dataflow.py:36-58)
  // ------------------------------------------------------------------

  private val chargepointFixture: Seq[String] = Seq(
    """{"sessionId": 555, "stationName": "STATION 1", "portNumber": 2,
      |"postalCode": 15222, "Energy": "6.25", "recordNumber": 1,
      |"startTime": "2023-05-01 10:00:00", "endTime": "2023-05-01T11:30:00"}""",
    """{"sessionId": 556, "stationName": "STATION 2", "portNumber": 1,
      |"postalCode": null, "Energy": null, "recordNumber": 2,
      |"startTime": "garbage", "endTime": null}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q63 — ceridian job codes (ceridian_job_codes_dataflow.py:24-90)
  // ------------------------------------------------------------------

  private val jobCodesFixture: Seq[String] = Seq(
    """{"Job_ShortName": "Engineer", "Job_JobUDFString1": "Professionals:02",
      |"JobFunction_ShortName": "ENG:Engineering",
      |"FLSAStatus_ShortName": "Exempt", "JobFamily_ShortName": "Technical",
      |"Job_IsUnionJob": "True", "DFUnion_ShortName": "AFSCME",
      |"Job_XrefCode": "X1", "Job_LongName": "Engineer II"}""",
    // exact duplicate of the first record: the reference's seen-set
    // Deduplicate DoFn drops it
    """{"Job_ShortName": "Engineer", "Job_JobUDFString1": "Professionals:02",
      |"JobFunction_ShortName": "ENG:Engineering",
      |"FLSAStatus_ShortName": "Exempt", "JobFamily_ShortName": "Technical",
      |"Job_IsUnionJob": "True", "DFUnion_ShortName": "AFSCME",
      |"Job_XrefCode": "X1", "Job_LongName": "Engineer II"}""",
    """{"Job_ShortName": "Laborer", "Job_JobUDFString1": "",
      |"JobFunction_ShortName": "OPS",
      |"FLSAStatus_ShortName": "Non-Exempt", "JobFamily_ShortName": "Operations",
      |"Job_IsUnionJob": "False", "DFUnion_ShortName": null,
      |"Job_XrefCode": "X2", "Job_LongName": "Laborer I"}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q64 — ceridian timekeeping (ceridian_timekeeping_dataflow.py)
  // ------------------------------------------------------------------

  private val timekeepingFixture: Seq[String] = Seq(
    """{"EmployeeEmploymentStatus_EmployeeNumber": 1001,
      |"Employee_DisplayName": "Ann Lee", "Department_LongName": "Public Works",
      |"Job_ShortName": "Engineer",
      |"EmployeePaySummary_BusinessDate": "2023-05-01T00:00:00",
      |"PayAdjCode_ShortName": "REG", "PayCategory_CodeName": "REG",
      |"PayCategory_LongName": "Regular",
      |"EmployeePaySummary_NetHoursSum": "8.0",
      |"LaborMetricsCode0_XRefCode": "LM1",
      |"EmployeePaySummary_PayAmountSum": "200.0", "OrgUnit_ShortName": "PW"}""",
    """{"EmployeeEmploymentStatus_EmployeeNumber": 731,
      |"Employee_DisplayName": "Bo Chen", "Department_LongName": "Finance Dept",
      |"Job_ShortName": "Clerk",
      |"EmployeePaySummary_BusinessDate": null,
      |"PayAdjCode_ShortName": "OT", "PayCategory_CodeName": "OT",
      |"PayCategory_LongName": "Overtime",
      |"EmployeePaySummary_NetHoursSum": "",
      |"LaborMetricsCode0_XRefCode": null,
      |"EmployeePaySummary_PayAmountSum": null, "OrgUnit_ShortName": "FIN"}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q65 — ceridian accruals (ceridian_accruals_dataflow.py:22-50)
  // ------------------------------------------------------------------

  private val accrualsFixture: Seq[String] = Seq(
    """{"Employee_XRefCode": 77, "Balance_ShortName": "Vacation",
      |"EntitlementBalance_CurrentValue": "40.5", "Employee_NameNumber": "n1",
      |"DeptJob_LongName": "PW - Engineer"}""",
    """{"Employee_XRefCode": 78, "Balance_ShortName": "Comp Time",
      |"EntitlementBalance_CurrentValue": "junk", "Employee_NameNumber": "n2",
      |"DeptJob_LongName": "FIN - Clerk"}""",
    """{"Employee_XRefCode": 79, "Balance_ShortName": null,
      |"EntitlementBalance_CurrentValue": "0", "Employee_NameNumber": "n3",
      |"DeptJob_LongName": null}""")
    .map(_.stripMargin.replace("\n", " "))

  private val accrualCodeMapping = Map("Vacation" -> "VAC", "Sick" -> "SICK")

  private def readFixture(s: SparkSession, lines: Seq[String]): DataFrame = {
    import s.implicits._
    s.read.json(lines.toDS())
  }

  val queries: Map[String, Q] = Map(
    "q59_ceridian_employees" -> ((s, _) =>
      FeedPipelines.ceridianEmployees(readFixture(s, ceridianFixture))
        .select(col("employee_num"), col("first_name"), col("last_name"),
          col("dept_desc"), col("office"), col("job_title"),
          col("base_salary"), col("hire_date"), col("ethnicity"),
          col("gender"), col("status"), col("manager_name"))),

    "q60_intime_assignments" -> ((s, _) =>
      FeedPipelines.intimeAssignments(readFixture(s, intimeFixture))
        .select(col("assignment_id"), col("employee_id"), col("display_name"),
          col("court_assignment"), col("location_group"),
          col("permanent_rank"), col("unit"), col("time_bank_type"),
          col("assignment_date"), col("sub_assignment").cast("int").as("sub_flag"),
          col("hours_sched_min_hours"), col("time_bank_hours"),
          col("scheduled_start_time"), col("scheduled_end_time"))),

    "q61_ad_users" -> ((s, _) =>
      FeedPipelines.adUsers(readFixture(s, adFixture), adDeptMapping)
        .select(col("employee_id"), col("first_name"), col("last_name"),
          col("published_name"), col("sam_account_name"), col("email"),
          col("department"), col("enabled").cast("int").as("enabled_flag"))),

    "q62_chargepoint" -> ((s, _) =>
      FeedPipelines.chargepoint(readFixture(s, chargepointFixture))
        .select(col("session_id"), col("station_name"), col("port_number"),
          col("zip"), col("energy_kwh"),
          col("start_time_UTC").as("start_utc"),
          col("start_time_EST").as("start_est"),
          col("start_time_UNIX").as("start_unix"),
          col("end_time_UNIX").as("end_unix"))),

    "q63_ceridian_jobs" -> ((s, _) =>
      FeedPipelines.ceridianJobCodes(readFixture(s, jobCodesFixture))
        .select(col("job_title"), col("eeo4_category"), col("job_function"),
          col("flsa_status"), col("classification"),
          col("is_union_job").cast("int").as("union_flag"), col("union_name"))),

    "q64_ceridian_timekeeping" -> ((s, _) =>
      FeedPipelines.ceridianTimekeeping(readFixture(s, timekeepingFixture))
        .select(col("employee_num"), col("display_name"), col("dept_desc"),
          col("job_title"), col("work_period"), col("pay_code"),
          col("pay_category"), col("pay_category_description"),
          col("net_hours"), col("labor_metrics_code"))),

    "q65_ceridian_accruals" -> ((s, _) =>
      FeedPipelines.ceridianAccruals(readFixture(s, accrualsFixture), accrualCodeMapping)
        .select(col("employee_id"), col("time_bank"), col("code"), col("balance"))))

  val oracle: Map[String, String] = Map(
    "q59_ceridian_employees" ->
      """SELECT employee_num, first_name, last_name, dept_desc, office, job_title,
        |  CAST(base_salary AS DOUBLE) AS base_salary, hire_date, ethnicity, gender,
        |  status, manager_name
        |FROM (VALUES
        |  ('1001', 'Ann', 'Lee', 'Public Works', 'DPW', 'Engineer', 50000.5,
        |   '2020-01-15', 'White', 'F', 'Active', 'Zoe Q'),
        |  ('731', 'Bo', 'Chen', 'Finance Dept', NULL, 'Clerk', NULL,
        |   NULL, 'Decline to Answer', 'M', 'Terminated', NULL),
        |  ('88', 'Cy', 'Diaz', 'Parks and Recreation', 'Parks', 'Ranger', NULL,
        |   '2018-03-02', 'Black or African American', NULL, 'Active', 'Ann Lee')
        |) t(employee_num, first_name, last_name, dept_desc, office, job_title,
        |    base_salary, hire_date, ethnicity, gender, status, manager_name)""".stripMargin,

    "q60_intime_assignments" ->
      """SELECT assignment_id, employee_id, display_name, court_assignment,
        |  location_group, permanent_rank, unit, time_bank_type, assignment_date,
        |  CAST(sub_flag AS INTEGER) AS sub_flag,
        |  CAST(hours_sched_min_hours AS DOUBLE) AS hours_sched_min_hours,
        |  CAST(time_bank_hours AS DOUBLE) AS time_bank_hours,
        |  scheduled_start_time, scheduled_end_time
        |FROM (VALUES
        |  ('9001', '77', 'Jane Doe', 'Court A', 'HQ', 'Officer', 'Zone 1', 'SICK',
        |   '2024-03-04', 1, 8.0, 4.5, '2024-03-04 08:00:00', '2024-03-04 16:00:00'),
        |  ('9002', '78', 'Sam Cox', NULL, 'South', 'Sergeant', 'Zone 2', NULL,
        |   '2024-03-05', 0, NULL, NULL, NULL, '2024-03-05 12:30:00')
        |) t(assignment_id, employee_id, display_name, court_assignment,
        |    location_group, permanent_rank, unit, time_bank_type, assignment_date,
        |    sub_flag, hours_sched_min_hours, time_bank_hours,
        |    scheduled_start_time, scheduled_end_time)""".stripMargin,

    "q61_ad_users" ->
      """SELECT employee_id, first_name, last_name, published_name,
        |  sam_account_name, email, department,
        |  CAST(enabled_flag AS INTEGER) AS enabled_flag
        |FROM (VALUES
        |  ('000077', 'Al', 'Po', 'Al Po', 'apo', 'apo@x.gov', 'Police', 1),
        |  ('A12', 'Bea', 'Ng', 'Bea Ng', 'bng', NULL, 'Unknown Dept', 0),
        |  ('000005', 'Cal', 'Ott', 'Cal Ott', 'cott', 'cott@x.gov',
        |   'Public Works', NULL)
        |) t(employee_id, first_name, last_name, published_name,
        |    sam_account_name, email, department, enabled_flag)""".stripMargin,

    "q62_chargepoint" ->
      """SELECT session_id, station_name, port_number, zip,
        |  CAST(energy_kwh AS DOUBLE) AS energy_kwh, start_utc, start_est,
        |  CAST(start_unix AS BIGINT) AS start_unix,
        |  CAST(end_unix AS BIGINT) AS end_unix
        |FROM (VALUES
        |  ('555', 'STATION 1', '2', '15222', 6.25,
        |   '05/01/2023 10:00:00+0000', '05/01/2023 06:00:00-0400',
        |   1682935200, 1682940600),
        |  ('556', 'STATION 2', '1', NULL, NULL, NULL, NULL, NULL, NULL)
        |) t(session_id, station_name, port_number, zip, energy_kwh,
        |    start_utc, start_est, start_unix, end_unix)""".stripMargin,

    "q63_ceridian_jobs" ->
      """SELECT job_title, eeo4_category, job_function, flsa_status,
        |  classification, CAST(union_flag AS INTEGER) AS union_flag, union_name
        |FROM (VALUES
        |  ('Engineer', 'Professionals', 'Engineering', 'Exempt', 'Technical',
        |   1, 'AFSCME'),
        |  ('Laborer', NULL, NULL, 'Non-Exempt', 'Operations', 0, NULL)
        |) t(job_title, eeo4_category, job_function, flsa_status, classification,
        |    union_flag, union_name)""".stripMargin,

    "q64_ceridian_timekeeping" ->
      """SELECT employee_num, display_name, dept_desc, job_title, work_period,
        |  pay_code, pay_category, pay_category_description,
        |  CAST(net_hours AS DOUBLE) AS net_hours, labor_metrics_code
        |FROM (VALUES
        |  ('1001', 'Ann Lee', 'Public Works', 'Engineer', '05/01/2023', 'REG',
        |   'REG', 'Regular', 8.0, 'LM1'),
        |  ('731', 'Bo Chen', 'Finance Dept', 'Clerk', NULL, 'OT', 'OT',
        |   'Overtime', NULL, NULL)
        |) t(employee_num, display_name, dept_desc, job_title, work_period,
        |    pay_code, pay_category, pay_category_description, net_hours,
        |    labor_metrics_code)""".stripMargin,

    "q65_ceridian_accruals" ->
      """SELECT employee_id, time_bank, code, CAST(balance AS DOUBLE) AS balance
        |FROM (VALUES
        |  ('77', 'Vacation', 'VAC', 40.5),
        |  ('78', 'Comp Time', 'Comp Time', NULL),
        |  ('79', NULL, NULL, 0.0)
        |) t(employee_id, time_bank, code, balance)""".stripMargin)
}
