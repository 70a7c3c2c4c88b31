package graft.pipelines

import graft.operators.{ColumnOps, TimeOps}
import graft.operators.ColumnOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The remaining per-feed transform drivers: each composes the §2.3
  * operator vocabulary in exactly the order the reference dataflow
  * script chains its DoFns. Every driver here is a pure appended
  * projection over one scan — zero shuffles, fully inside whole-stage
  * codegen — so at 100 TB each is a single embarrassingly-parallel
  * map stage whose cost is the parquet/ndjson scan itself.
  *
  * Where the reference chain has a latent no-op (a drop list naming a
  * pre-rename/pre-snake-case column that no longer exists at drop
  * time), the no-op is reproduced faithfully and commented, so our
  * output columns match what the reference actually emits.
  */
object FeedPipelines {

  // ------------------------------------------------------------------
  // ceridian employees (ceridian_employees_dataflow.py:45-90)
  // ------------------------------------------------------------------

  /** StandardizeEthnicityNames (ceridian_employees_dataflow.py:23-29):
    * keep the text before ' (' ; NULL/empty → 'Decline to Answer'.
    * (Defined in the employees feed script; applied here so downstream
    * EEO-4 reporting sees the clean short names.)
    */
  def standardizeEthnicity(
      df: DataFrame, field: String = "DFEthnicity_ShortName"): DataFrame =
    df.withColumn(field,
      when(col(field).isNull || col(field) === "", lit("Decline to Answer"))
        .otherwise(split(col(field), " \\(").getItem(0)))

  private val ceridianEmployeeSwaps = Seq(
    "EmployeeEmploymentStatus_EmployeeNumber" -> "employee_num",
    "Employee_FirstName" -> "first_name",
    "Employee_LastName" -> "last_name",
    "Employee_DisplayName" -> "display_name",
    "Department_LongName" -> "dept_desc",
    "Department_ShortName" -> "office",
    "Job_ShortName" -> "job_title",
    "EmployeeEmploymentStatus_BaseSalary" -> "base_salary",
    "Employee_HireDate" -> "hire_date",
    "Employee_TerminationDate" -> "termination_date",
    "EmployeeWorkAssignment_EffectiveStart" -> "work_assignment_date",
    "EmploymentStatusReason_LongName" -> "account_modified_reason",
    "EmployeeEmploymentStatus_CreatedTimestamp" -> "account_modified_date",
    "DFUnion_ShortName" -> "union",
    "EmploymentStatus_LongName" -> "status",
    "PayClass_LongName" -> "pay_class",
    "EmployeeManager_ManagerDisplayName" -> "manager_name",
    "DFEthnicity_ShortName" -> "ethnicity",
    "Employee_Gender" -> "gender",
    "SSOLogin" -> "sso_login",
    "Employee_CommonName" -> "common_name",
    "Employee_PreferredLastName" -> "preferred_last_name")

  def ceridianEmployees(raw: DataFrame): DataFrame = {
    val strips = Seq(
      ("Employee_HireDate", "T", 0), ("Employee_TerminationDate", "T", 0),
      ("EmployeeWorkAssignment_EffectiveStart", "T", 0),
      ("EmployeeEmploymentStatus_CreatedTimestamp", "T", 0),
      ("Department_ShortName", "-", 1))
    val stripped = strips.foldLeft(raw) { case (d, (f, del, k)) =>
      stripBeforeDelim(d, f, del, k)
    }
    val renamed = renameFields(standardizeEthnicity(stripped), ceridianEmployeeSwaps)
    val typed = changeTypes(renamed,
      Seq("employee_num" -> RStr, "base_salary" -> RFloat))
    // Employee_PreferredLastName and the Denorm contact columns were
    // renamed/absent by drop time in the reference too — only
    // EmploymentStatus_ShortName and DeptJob_ShortName actually drop
    filterFields(typed, Seq("EmploymentStatus_ShortName", "DeptJob_ShortName",
      "Employee_PreferredLastName", "DenormEmployeeContact_BusinessPhone",
      "DenormEmployeeContact_HomePhone", "DenormEmployeeContact_MobilePhone"))
  }

  // ------------------------------------------------------------------
  // intime assignments (intime_assignments_dataflow.py:24-90)
  // ------------------------------------------------------------------

  def intimeAssignments(raw: DataFrame): DataFrame = {
    val d0 = stripBeforeDelim(raw, "date", "T", 0)
    val d1 = columnsCamelToSnake(d0)
    // ReplaceChar catches KeyError per-field in the reference — skip
    // columns the batch doesn't carry
    val d2 = Seq("scheduled_start_time", "scheduled_end_time",
        "actual_start_time", "actual_end_time")
      .foldLeft(d1)((d, f) =>
        if (d.columns.contains(f)) replaceChar(d, f, "T", " ") else d)
    val d3 = renameFields(d2, Seq(
      "employee_full_name" -> "display_name",
      "customer_name" -> "court_assignment",
      "location_name" -> "location_group",
      "rank_name" -> "permanent_rank",
      "unit_name" -> "unit",
      "time_bank_code" -> "time_bank_type",
      "date" -> "assignment_date"))
    val d4 = changeTypes(d3, Seq(
      "assignment_id" -> RStr, "employee_id" -> RStr,
      "sub_assignment" -> RBool, "hours_sched_min_hours" -> RFloat,
      "time_bank_hours" -> RFloat))
    // 'time_bank_short_name' 'branch_name' are adjacent string
    // literals in the reference (implicit concat) — reproduced: both
    // columns survive
    filterFields(d4, Seq("customer_code", "location_reference",
      "location_code", "activity_reference", "activity_code",
      "sub_location_reference", "sub_location_code", "note",
      "hours_modifier_short_name", "hours_modifier_reference",
      "hours_modifier_code", "hours_actual_minimum",
      "time_bank_reference", "rank_reference", "unit_reference",
      "employee_assets", "time_bank_short_namebranch_name",
      "branch_reference", "origin"))
  }

  // ------------------------------------------------------------------
  // active directory users (active_directory_users_dataflow.py:29-78)
  // ------------------------------------------------------------------

  /** userAccountControl codes that mean "enabled"
    * (active_directory_users_dataflow.py:23-40).
    */
  val adEnabledCodes: Seq[String] = Seq("512", "4194818", "4194816", "544")

  def adUsers(raw: DataFrame, deptMapping: Map[String, String]): DataFrame = {
    val uac = col("userAccountControl").cast(StringType)
    // missing/NULL code → enabled stays NULL (the reference's except)
    val d0 = raw.withColumn("enabled",
      when(uac.isNull, lit(null).cast("boolean"))
        .otherwise(uac.isin(adEnabledCodes: _*)))
    val d1 = crosswalkMap(d0, "department", deptMapping)
    val d2 = renameFields(d1, Seq(
      "givenName" -> "first_name", "sn" -> "last_name",
      "cn" -> "published_name", "sAMAccountName" -> "sam_account_name",
      "mail" -> "email"))
    val d3 = columnsCamelToSnake(d2)
    val d4 = changeTypes(d3, Seq("employee_id" -> RStr))
    val d5 = prependCharacters(d4, "employee_id", 6, "0", numericOnly = true)
    // post-snake the column is user_account_control: the reference's
    // drop of 'userAccountControl' is a no-op and the column survives
    filterFields(d5, Seq("userAccountControl"))
  }

  // ------------------------------------------------------------------
  // chargepoint sessions (chargepoint_dataflow.py:36-58)
  // ------------------------------------------------------------------

  def chargepoint(raw: DataFrame): DataFrame = {
    val d0 = renameFields(raw,
      Seq("postalCode" -> "zip", "Energy" -> "energy_kwh"))
    val d1 = columnsCamelToSnake(d0)
    val d2 = TimeOps.standardizeTimes(d1,
      Seq("start_time" -> "UTC", "end_time" -> "UTC"))
    val d3 = changeTypes(d2, Seq(
      "port_number" -> RStr, "session_id" -> RStr,
      "zip" -> RStr, "energy_kwh" -> RFloat))
    // recordNumber is record_number post-snake (reference no-op);
    // start_time/end_time do drop — StandardizeTimes emitted the triple
    filterFields(d3, Seq("recordNumber", "start_time", "end_time"))
  }

  // ------------------------------------------------------------------
  // ceridian job codes (ceridian_job_codes_dataflow.py:24-90)
  // ------------------------------------------------------------------

  def ceridianJobCodes(raw: DataFrame): DataFrame = {
    val d0 = stripBeforeDelim(raw, "Job_JobUDFString1", ":", 0)
    val d1 = stripBeforeDelim(d0, "JobFunction_ShortName", ":", 1)
    val d2 = renameFields(d1, Seq(
      "Job_ShortName" -> "job_title",
      "Job_JobUDFString1" -> "eeo4_category",
      "JobFunction_ShortName" -> "job_function",
      "FLSAStatus_ShortName" -> "flsa_status",
      "JobFamily_ShortName" -> "classification",
      "Job_IsUnionJob" -> "is_union_job",
      "DFUnion_ShortName" -> "union_name"))
    val d3 = changeTypes(d2,
      Seq("is_union_job" -> RBool, "eeo4_category" -> RNullStr))
    // the reference's Deduplicate DoFn (seen-set over frozenset rows)
    // is a full-row distinct
    filterFields(d3, Seq("Job_XrefCode", "PRWCBCode_WCBCode", "test",
      "Job_LongName", "Job_JobUDFString2", "Job_JobUDFString3")).distinct()
  }

  // ------------------------------------------------------------------
  // ceridian timekeeping (ceridian_timekeeping_dataflow.py:30-70)
  // ------------------------------------------------------------------

  def ceridianTimekeeping(raw: DataFrame): DataFrame = {
    val d0 = stripBeforeDelim(raw, "EmployeePaySummary_BusinessDate", "T", 0)
    val d1 = TimeOps.standardizeTimes(d0,
      Seq("EmployeePaySummary_BusinessDate" -> "US/Eastern"),
      tFormat = "%m/%d/%Y")
    val d2 = renameFields(d1, Seq(
      "EmployeeEmploymentStatus_EmployeeNumber" -> "employee_num",
      "Employee_DisplayName" -> "display_name",
      "Department_LongName" -> "dept_desc",
      "Job_ShortName" -> "job_title",
      "EmployeePaySummary_BusinessDate_EST" -> "work_period",
      "PayAdjCode_ShortName" -> "pay_code",
      "PayCategory_CodeName" -> "pay_category",
      "PayCategory_LongName" -> "pay_category_description",
      "EmployeePaySummary_NetHoursSum" -> "net_hours",
      "LaborMetricsCode0_XRefCode" -> "labor_metrics_code"))
    val d3 = changeTypes(d2,
      Seq("employee_num" -> RStr, "net_hours" -> RFloat))
    // Department_LongName was already renamed to dept_desc (reference
    // no-op drop); the _UTC/_UNIX standardize outputs do drop
    filterFields(d3, Seq("EmployeePaySummary_PayAmountSum",
      "EmployeePaySummary_Rate", "OrgUnit_ShortName",
      "LaborMetricsCode0_LedgerCode", "Department_LongName",
      "EmployeePaySummary_BusinessDate_UTC",
      "EmployeePaySummary_BusinessDate_UNIX"))
  }

  // ------------------------------------------------------------------
  // ceridian accruals + intime timebank (ceridian_accruals_dataflow.py:
  // 22-50, intime_timebank_dataflow.py:20-40) — the two feeds that
  // land in the shared timebank_accruals schema
  // ------------------------------------------------------------------

  def ceridianAccruals(
      raw: DataFrame, codeMapping: Map[String, String]): DataFrame = {
    val d0 = renameFields(raw, Seq(
      "Employee_XRefCode" -> "employee_id",
      "Balance_ShortName" -> "time_bank",
      "EntitlementBalance_CurrentValue" -> "balance"))
    val d1 = crosswalkMapTo(d0, "time_bank", "code", codeMapping)
    val d2 = changeTypes(d1,
      Seq("employee_id" -> RStr, "balance" -> RFloat))
    filterFields(d2, Seq("Employee_NameNumber",
      "EmployeeEmploymentStatus_BaseRate", "EntitlementPolicy_LongName",
      "DeptJob_LongName"))
  }

  def intimeTimebank(raw: DataFrame): DataFrame = {
    val d0 = changeTypes(raw,
      Seq("employee_id" -> RStr, "balance" -> RFloat))
    prependCharacters(d0, "employee_id", 6, "0", numericOnly = true)
  }

  // ------------------------------------------------------------------
  // cartegraph tasks (cartegraph_tasks_dataflow.py:35-66; the bridges /
  // facilities / playground-equipment feeds are the same chain with
  // different field tables)
  // ------------------------------------------------------------------

  def cartegraphTasks(raw: DataFrame): DataFrame = {
    val d0 = graft.operators.NestedOps.extractField(
      graft.operators.NestedOps.extractField(
        raw, "CgShape", "Center", "lat", "Lat"),
      "CgShape", "Center", "long", "Lng")
    val d1 = columnsCamelToSnake(d0, strip = Some("Field"))
    val d2 = renameFields(d1, Seq(
      "oid" -> "id", "start_date_actual" -> "actual_start_date",
      "stop_date_actual" -> "actual_stop_date",
      "labor_cost_actual" -> "labor_cost",
      "equipment_cost_actual" -> "equipment_cost",
      "material_cost_actual" -> "material_cost",
      "labor_hours_actual" -> "labor_hours",
      "cg_asset_id" -> "asset_id", "cg_asset_type" -> "asset_type",
      "notes" -> "task_notes"))
    // post-snake the shape column is cg_shape: the reference's drop of
    // 'CgShape' is a no-op and the struct survives
    val d3 = filterFields(d2, Seq("CgShape"))
    val d4 = TimeOps.standardizeTimes(d3, Seq(
      "entry_date" -> "US/Eastern", "actual_start_date" -> "US/Eastern",
      "actual_stop_date" -> "US/Eastern"), tFormat = "%Y-%m-%d %H:%M:%S%z")
    changeTypes(d4, Seq(
      "id" -> RStr, "labor_cost" -> RFloat, "equipment_cost" -> RFloat,
      "material_cost" -> RFloat, "labor_hours" -> RFloat,
      "request_issue" -> RNullStr, "request_department" -> RNullStr,
      "request_location" -> RNullStr, "asset_id" -> RNullStr,
      "task_description" -> RNullStr, "task_notes" -> RNullStr,
      "actual_start_date_UNIX" -> RPosInt,
      "actual_stop_date_UNIX" -> RPosInt, "entry_date_UNIX" -> RPosInt))
  }

  // ------------------------------------------------------------------
  // qalert submitters (qalert_submitters_dataflow.py:38-70)
  // ------------------------------------------------------------------

  def qalertSubmitters(raw: DataFrame): DataFrame = {
    val d0 = filterFields(raw, Seq("id", "submitter", "firstName",
      "lastName", "address", "address2", "city", "state", "zip", "email",
      "phone", "twitterScreenName", "lastRequest", "lastModified",
      "totalClosed", "totalRequests", "text"), exclude = false)
    val d1 = renameFields(d0, Seq(
      "id" -> "request_id", "submitter" -> "submitter_id",
      "firstName" -> "first_name", "lastName" -> "last_name",
      "address2" -> "address_2", "twitterScreenName" -> "twitter_name",
      "lastRequest" -> "last_request_date",
      "lastModified" -> "last_modified_date",
      "totalClosed" -> "curr_total_requests_closed",
      "totalRequests" -> "curr_total_requests_made",
      "text" -> "satisfaction_level"))
    changeTypes(d1, Seq(
      "request_id" -> RStr, "submitter_id" -> RStr,
      "first_name" -> RNullStr, "last_name" -> RNullStr,
      "address" -> RNullStr, "address_2" -> RNullStr, "city" -> RNullStr,
      "state" -> RNullStr, "zip" -> RNullStr, "email" -> RNullStr,
      "phone" -> RNullStr, "twitter_name" -> RNullStr))
  }
}
