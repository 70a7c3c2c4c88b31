package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Employee-administration report family
  * (bq_queries/employee_admin/ceridian_admin.py + intime_admin.py):
  * EEO-4 equal-opportunity report, pct-of-total demographics tables,
  * timebank-balance comparison, manager self-join, new-hire /
  * termination windows, and the InTime acting-rank assignment
  * resolution — composed over the persona-join employee base.
  *
  * Scale notes: the dimension side of every join here (job_details,
  * hardcoded overall-city rows, sub-assignments) is tiny → broadcast;
  * the employee/assignment fact side never shuffles except for the
  * final grouped reports. The pct-of-total window runs over the
  * post-aggregate frame (one row per group), not the fact table.
  */
object EmployeeAdminPipeline {

  /** The EEO-4 salary banding CASE (ceridian_admin.py:8-17). */
  def salaryRange(c: Column): Column =
    when(c <= 15999.89, "$0.1 - $15.9")
      .when(c.between(16000.00, 19999.99), "$16.0 - $19.9")
      .when(c.between(20000.00, 24999.99), "$20.0 - $24.9")
      .when(c.between(25000.00, 32999.99), "$25.0 - $32.9")
      .when(c.between(33000.00, 42999.99), "$33.0 - $42.9")
      .when(c.between(43000.00, 54999.99), "$43.0 - $54.9")
      .when(c.between(55000.00, 69999.99), "$55.0 - $69.9")
      .when(c >= 70000.00, "$70.0 PLUS")
      .otherwise("Unknown Range")

  /** build_eeo4_report (ceridian_admin.py:5-57): job-function lookup
    * via RIGHT OUTER join (employees kept even without a job_details
    * row), with the Community-Liaison split — Mayor's-office liaisons
    * are 'Officials and Administrators', the rest 'Professionals'.
    */
  def eeo4Report(jobDetails: DataFrame, employees: DataFrame): DataFrame = {
    val cols = Seq("job_title", "base_salary", "ethnicity", "gender").map(col)
    val general = employees
      .filter(!col("dept_desc").isin("Non-Employee Benefits", "Historical")
        && col("job_title") =!= "Community Liaison")
      .select(cols: _*)
    val joined = broadcast(jobDetails.select("job_title", "job_function"))
      .join(general, Seq("job_title"), "right")
      .select(col("job_function"), salaryRange(col("base_salary")).as("salary_range"),
        col("ethnicity"), col("gender"))
    def liaison(deptPred: Column, function: String) = employees
      .filter(col("job_title") === "Community Liaison" && deptPred)
      .select(lit(function).as("job_function"),
        salaryRange(col("base_salary")).as("salary_range"),
        col("ethnicity"), col("gender"))
    joined
      .unionByName(liaison(col("dept_desc") === "Office of the Mayor",
        "Officials and Administrators"))
      .unionByName(liaison(col("dept_desc") =!= "Office of the Mayor",
        "Professionals"))
      .groupBy("job_function", "salary_range", "ethnicity", "gender")
      .agg(count(lit(1)).as("counts"))
  }

  /** build_percentage_table_query (ceridian_admin.py:60-79): share of
    * active employees per `pctField` value (COUNT(DISTINCT employee)
    * over SUM(COUNT(*)) OVER()), unioned with hardcoded overall-city
    * baselines. The empty-frame window runs on the post-aggregate
    * frame — one row per group — so the single-partition warning is
    * benign at any corpus size.
    */
  def percentageTable(employees: DataFrame, pctField: String,
                      overallCity: Seq[(String, Double)]): DataFrame = {
    val grouped = employees.filter(col("status") === "Active")
      .groupBy(pctField)
      .agg(countDistinct("employee_num").as("__cnt"), count(lit(1)).as("__rows"))
    val withTotal = grouped
      .withColumn("__total", sum("__rows").over(Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(pctField), (col("__cnt") / col("__total")).as("percentage"),
        lit("City Employee").as("type"))
    val spark = employees.sparkSession
    import spark.implicits._
    val hardcoded = overallCity.toDF(pctField, "percentage")
      .withColumn("type", lit("Overall City"))
    withTotal.unionByName(hardcoded)
  }

  /** compare_timebank_balances (ceridian_admin.py:82-109): 3-way join
    * of the two balance systems plus the employee roster, rounding
    * tolerance at 1 decimal.
    */
  def compareTimebankBalances(
      ceridian: DataFrame, intime: DataFrame, employees: DataFrame,
      ceridianDate: String, intimeDate: String,
      codes: Seq[String] = Nil): DataFrame = {
    val c = ceridian.filter(col("retrieval_date") === ceridianDate)
      .withColumnRenamed("balance", "ceridian_balance")
    val i = intime.filter(col("retrieval_date") === intimeDate)
      .select(col("employee_id"), col("time_bank"), col("code"),
        col("balance").as("intime_balance"))
    val joined = c.join(i, Seq("employee_id", "time_bank", "code"))
    val codeFiltered =
      if (codes.isEmpty) joined
      else joined.filter(col("code").isin(codes: _*))
    codeFiltered
      .join(employees.select(col("employee_num").as("employee_id"), col("display_name")),
        Seq("employee_id"))
      .filter(round(col("ceridian_balance"), 1) =!= round(col("intime_balance"), 1))
      .select("employee_id", "display_name", "retrieval_date", "code",
        "ceridian_balance", "intime_balance")
  }

  /** extract_employee_manager_info (ceridian_admin.py:112-120):
    * manager-email self-join over the roster.
    */
  def employeeManagerInfo(employees: DataFrame): DataFrame = {
    val m = employees.select(col("display_name").as("manager_name"),
      col("sso_login").as("manager_email")).distinct()
    employees.filter(col("status").isin("Active", "Pre-Start"))
      .join(m, Seq("manager_name"), "left")
      .select(col("display_name"), col("sso_login").as("email"), col("dept_desc"),
        col("manager_name"), col("manager_email"), col("status"))
  }

  /** extract_new_hires (ceridian_admin.py:123-143), `today` injected
    * for determinism: Pre-Start rows plus Active rows inside the
    * hire/modification windows.
    */
  def newHires(employees: DataFrame, today: String): DataFrame = {
    val t = to_date(lit(today))
    val hire = to_date(col("hire_date"))
    val modified = to_date(col("account_modified_date"))
    employees.filter(
      col("status") === "Pre-Start" ||
        (col("status") === "Active" && (
          (hire > modified && datediff(t, modified) <= 1) ||
            datediff(t, hire) <= 1 ||
            (datediff(t, hire) <= 14 && col("sso_login").isNull))))
      .select(col("employee_num"), col("first_name"), col("last_name"),
        col("display_name"), col("sso_login"), col("job_title"),
        col("manager_name"), col("dept_desc"), col("hire_date"),
        col("account_modified_date"), col("pay_class"),
        when(col("job_title").like("%Unpaid%"), "Unpaid").otherwise("Paid").as("pay_status"),
        col("status").as("employment_status"))
  }

  /** extract_recent_terminations (ceridian_admin.py:146-152). */
  def recentTerminations(employees: DataFrame, today: String): DataFrame =
    employees.filter(col("status") === "Terminated"
        && datediff(to_date(lit(today)), to_date(col("termination_date"))) <= 30)
      .select("employee_num", "sso_login", "first_name", "last_name",
        "dept_desc", "status", "termination_date", "pay_class")

  /** pmo_export_query (ceridian_admin.py:164-172). */
  def pmoExport(employees: DataFrame): DataFrame =
    employees.filter(col("status").isin("Active", "Pre-Start")
        && !col("dept_desc").isin("Bureau of Police",
          "Bureau of Emergency Medical Services", "Bureau of Fire",
          "Bureau of School Crossing Guards"))
      .select("employee_num", "first_name", "last_name", "sso_login",
        "dept_desc", "office", "job_title", "hire_date", "union",
        "manager_name", "status")

  /** update_time_accruals_table / update_timebank_table
    * (ceridian_admin.py:175-187, intime_admin.py:46-58): append-only
    * history keyed on (employee_id, retrieval_date) — incoming wins,
    * prior rows for re-arriving keys are dropped.
    */
  def updateBalanceHistory(history: DataFrame, incoming: DataFrame): DataFrame = {
    val inc = incoming.select(col("employee_id"),
      to_date(col("date")).as("retrieval_date"),
      col("time_bank"), col("code"), col("balance")).distinct()
    val kept = history.distinct()
      .join(inc.select("employee_id", "retrieval_date").distinct(),
        Seq("employee_id", "retrieval_date"), "left_anti")
    inc.unionByName(kept)
  }

  /** extract_current_intime_details (intime_admin.py:4-31): assignment
    * + sub-assignment resolution with the acting-rank CASE chain,
    * windowed on the `asOf` instant. Sub-assignments are a filtered
    * self-join on parent_assignment_id.
    */
  def currentAssignments(employeeData: DataFrame, assignments: DataFrame,
                         asOf: String): DataFrame = {
    val a = assignments.alias("a")
    // the parent-id key is renamed so it can't collide with `a`'s own
    // parent_assignment_id column in the join condition
    val sub = assignments.filter(col("sub_assignment") === true)
      .select(col("assignment_id").as("sub_assignment_id"),
        col("parent_assignment_id").as("__sub_parent"),
        col("activity_name").as("sub_activity"),
        col("scheduled_start_time").as("sub_activity_start_time"),
        col("scheduled_end_time").as("sub_activity_end_time"))
    val joined = employeeData.alias("e")
      .join(a, col("e.employee_id") === col("a.employee_id"), "left")
      .join(broadcast(sub), col("a.assignment_id") === col("__sub_parent"), "left")
    val currentRank =
      when(col("a.activity_name").like("Acting%"), col("a.activity_name"))
        .when(col("a.activity_name") === "Desk Officer", col("a.activity_name"))
        .when(coalesce(col("a.activity_name"), lit("")) =!= col("sub_activity")
          && col("sub_activity").like("Acting%"), col("sub_activity"))
        .otherwise(col("a.permanent_rank"))
    joined.select(
      col("e.employee_id").as("ceridian_id"), col("e.display_name"),
      col("a.permanent_rank"), currentRank.as("current_rank"),
      col("a.activity_name").as("current_activity"),
      col("a.scheduled_start_time"), col("a.scheduled_end_time"),
      col("sub_assignment_id"), col("sub_activity"),
      col("sub_activity_start_time"), col("sub_activity_end_time"),
      col("e.unit").as("permanent_unit"), col("a.unit").as("current_unit"))
      // PARITY NOTE: the reference's WHERE checks only the PARENT
      // assignment's window (intime_admin.py:29) — a sub-assignment
      // whose own window has ended can still supply current_rank while
      // the parent shift runs; reproduced faithfully, not an oversight
      .filter((col("current_activity").isNotNull || col("sub_activity").isNotNull)
        && lit(asOf).cast("timestamp")
          .between(col("scheduled_start_time"), col("scheduled_end_time")))
  }

  /** export_active_officers (intime_admin.py:34-43): officer roster
    * restricted to employees Active in ceridian.
    */
  def activeOfficers(intimeEmployees: DataFrame, ceridianEmployees: DataFrame): DataFrame =
    intimeEmployees
      .join(ceridianEmployees.filter(col("status") === "Active")
          .select(col("employee_num").as("employee_id")),
        Seq("employee_id"), "left_semi")
      .distinct()
}
