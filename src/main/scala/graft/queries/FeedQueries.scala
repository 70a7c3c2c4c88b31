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

  // ------------------------------------------------------------------
  // q66 — cartegraph tasks (cartegraph_tasks_dataflow.py:35-66)
  // ------------------------------------------------------------------

  private val cartegraphFixture: Seq[String] = Seq(
    """{"Oid": 3001, "EntryDateField": "2023-05-01 10:00:00",
      |"StartDateActualField": "2023-05-01 11:00:00", "StopDateActualField": "",
      |"LaborCostActualField": "120.5", "EquipmentCostActualField": "10",
      |"MaterialCostActualField": "junk", "LaborHoursActualField": "4.0",
      |"CgAssetIdField": "BR-7", "CgAssetTypeField": "Bridge",
      |"NotesField": "fixed", "RequestIssueField": "pothole",
      |"RequestDepartmentField": "DPW", "RequestLocationField": "",
      |"TaskDescriptionField": "patch",
      |"CgShape": {"Center": {"Lat": 40.44, "Lng": -79.99}}}""",
    """{"Oid": 3002, "EntryDateField": null,
      |"StartDateActualField": "1960-01-01 00:00:00", "StopDateActualField": null,
      |"LaborCostActualField": null, "EquipmentCostActualField": "",
      |"MaterialCostActualField": "5.5", "LaborHoursActualField": null,
      |"CgAssetIdField": "", "CgAssetTypeField": "Playground",
      |"NotesField": null, "RequestIssueField": null,
      |"RequestDepartmentField": "Parks", "RequestLocationField": "Park X",
      |"TaskDescriptionField": "",
      |"CgShape": null}""")
    .map(_.stripMargin.replace("\n", " "))

  // ------------------------------------------------------------------
  // q67 — qalert submitters (qalert_submitters_dataflow.py:38-70)
  // ------------------------------------------------------------------

  private val submittersFixture: Seq[String] = Seq(
    """{"id": 1111, "submitter": 501, "firstName": "Pat", "lastName": "Kim",
      |"address": "1 Elm St", "address2": "", "city": "Pittsburgh",
      |"state": "PA", "zip": 15222, "email": "p@x.org", "phone": "4125551234",
      |"twitterScreenName": "", "lastRequest": "2024-01-02",
      |"lastModified": "2024-01-03", "totalClosed": 4, "totalRequests": 5,
      |"text": "Very Satisfied", "dropMe": "x"}""",
    """{"id": 1112, "submitter": null, "firstName": "", "lastName": null,
      |"address": null, "address2": null, "city": "", "state": null,
      |"zip": null, "email": "", "phone": null, "twitterScreenName": "tw_user",
      |"lastRequest": null, "lastModified": null, "totalClosed": 0,
      |"totalRequests": 1, "text": null}""")
    .map(_.stripMargin.replace("\n", " "))

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
        .select(col("employee_id"), col("time_bank"), col("code"), col("balance"))),

    "q66_cartegraph_tasks" -> ((s, _) =>
      FeedPipelines.cartegraphTasks(readFixture(s, cartegraphFixture))
        .select(col("id"), col("asset_id"), col("asset_type"),
          col("task_description"), col("task_notes"), col("request_issue"),
          col("request_department"), col("request_location"),
          col("lat"), col("long").as("lng"),
          col("labor_cost"), col("equipment_cost"), col("material_cost"),
          col("labor_hours"),
          col("entry_date_UNIX").as("entry_unix"),
          col("entry_date_UTC").as("entry_utc"),
          col("entry_date_EST").as("entry_est"),
          col("actual_start_date_UNIX").as("start_unix"),
          col("actual_start_date_UTC").as("start_utc"),
          col("actual_start_date_EST").as("start_est"),
          col("actual_stop_date_UNIX").as("stop_unix"))),

    "q67_qalert_submitters" -> ((s, _) =>
      FeedPipelines.qalertSubmitters(readFixture(s, submittersFixture))
        .select(col("request_id"), col("submitter_id"), col("first_name"),
          col("last_name"), col("address"), col("address_2"), col("city"),
          col("state"), col("zip"), col("email"), col("phone"),
          col("twitter_name"), col("last_request_date"),
          col("curr_total_requests_closed"), col("curr_total_requests_made"),
          col("satisfaction_level"))))

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
        |) t(employee_id, time_bank, code, balance)""".stripMargin,

    "q66_cartegraph_tasks" ->
      """SELECT id, asset_id, asset_type, task_description, task_notes,
        |  request_issue, request_department, request_location, lat, lng,
        |  CAST(labor_cost AS DOUBLE) AS labor_cost,
        |  CAST(equipment_cost AS DOUBLE) AS equipment_cost,
        |  CAST(material_cost AS DOUBLE) AS material_cost,
        |  CAST(labor_hours AS DOUBLE) AS labor_hours,
        |  CAST(entry_unix AS INTEGER) AS entry_unix, entry_utc, entry_est,
        |  CAST(start_unix AS INTEGER) AS start_unix, start_utc, start_est,
        |  CAST(stop_unix AS INTEGER) AS stop_unix
        |FROM (VALUES
        |  ('3001', 'BR-7', 'Bridge', 'patch', 'fixed', 'pothole', 'DPW', NULL,
        |   '40.44', '-79.99', 120.5, 10.0, NULL, 4.0,
        |   1682949600, '2023-05-01 14:00:00+0000', '2023-05-01 10:00:00-0400',
        |   1682953200, '2023-05-01 15:00:00+0000', '2023-05-01 11:00:00-0400',
        |   NULL),
        |  ('3002', NULL, 'Playground', NULL, NULL, NULL, 'Parks', 'Park X',
        |   NULL, NULL, NULL, NULL, 5.5, NULL,
        |   NULL, NULL, NULL,
        |   NULL, '1960-01-01 05:00:00+0000', '1960-01-01 00:00:00-0500',
        |   NULL)
        |) t(id, asset_id, asset_type, task_description, task_notes,
        |    request_issue, request_department, request_location, lat, lng,
        |    labor_cost, equipment_cost, material_cost, labor_hours,
        |    entry_unix, entry_utc, entry_est, start_unix, start_utc, start_est,
        |    stop_unix)""".stripMargin,

    "q67_qalert_submitters" ->
      """SELECT request_id, submitter_id, first_name, last_name, address,
        |  CAST(address_2 AS VARCHAR) AS address_2, city, state, zip, email,
        |  phone, twitter_name,
        |  last_request_date,
        |  CAST(curr_total_requests_closed AS BIGINT) AS curr_total_requests_closed,
        |  CAST(curr_total_requests_made AS BIGINT) AS curr_total_requests_made,
        |  satisfaction_level
        |FROM (VALUES
        |  ('1111', '501', 'Pat', 'Kim', '1 Elm St', NULL, 'Pittsburgh', 'PA',
        |   '15222', 'p@x.org', '4125551234', NULL, '2024-01-02', 4, 5,
        |   'Very Satisfied'),
        |  ('1112', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   'tw_user', NULL, 0, 1, NULL)
        |) t(request_id, submitter_id, first_name, last_name, address, address_2,
        |    city, state, zip, email, phone, twitter_name, last_request_date,
        |    curr_total_requests_closed, curr_total_requests_made,
        |    satisfaction_level)""".stripMargin)
}
