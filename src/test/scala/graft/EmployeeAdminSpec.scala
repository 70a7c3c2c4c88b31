package graft

import graft.pipelines.EmployeeAdminPipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Employee-admin report family (ceridian_admin.py + intime_admin.py
  * semantics). The q55–q57 oracle queries cover the EEO-4 / pct-table /
  * current-assignments compositions end to end; this spec pins the
  * branch behavior that's easy to regress: the acting-rank CASE chain,
  * the sub-assignment self-join (whose join key must not collide with
  * the assignment table's own parent_assignment_id), and the
  * append-only balance-history merge.
  */
class EmployeeAdminSpec extends SparkSpec {

  import spark.implicits._

  private def assignments = Seq(
    // (id, parent, emp, rank, activity, start, end, unit, sub)
    (101L, None: Option[Long], 11L, "Sergeant", "Acting Lieutenant",
      "2024-01-01 08:00:00", "2024-01-01 16:00:00", "Zone 1", false),
    (102L, None: Option[Long], 12L, "Officer", "Patrol",
      "2024-01-01 08:00:00", "2024-01-01 16:00:00", "Zone 2", false),
    (103L, Some(102L), 12L, "Officer", "Acting Sergeant",
      "2024-01-01 08:00:00", "2024-01-01 16:00:00", "Zone 2", true),
    (104L, None: Option[Long], 11L, "Sergeant", "Desk Officer",
      "2024-01-01 17:00:00", "2024-01-01 20:00:00", "Zone 1", false))
    .toDF("assignment_id", "parent_assignment_id", "employee_id",
      "permanent_rank", "activity_name", "s", "e", "unit", "sub_assignment")
    .withColumn("scheduled_start_time", col("s").cast("timestamp"))
    .withColumn("scheduled_end_time", col("e").cast("timestamp"))
    .drop("s", "e")

  private def employees = Seq(
    (11L, "Jane Sgt", "Station 1"), (12L, "Bob Off", "Station 2"),
    (13L, "Idle Ida", "Station 3"))
    .toDF("employee_id", "display_name", "unit")

  test("currentAssignments resolves acting ranks through the sub-assignment join") {
    val out = EmployeeAdminPipeline
      .currentAssignments(employees, assignments, asOf = "2024-01-01 12:00:00")
      .select("ceridian_id", "current_rank", "sub_activity")
      .collect().toSet
    // 101: own activity is Acting% → acting rank from the parent row;
    // 102: rank comes from the joined sub-assignment; 103: the
    // sub-assignment row itself also resolves via its own activity;
    // 104 is outside the as-of window; Ida has no assignment at all.
    assert(out === Set(
      Row(11L, "Acting Lieutenant", null),
      Row(12L, "Acting Sergeant", "Acting Sergeant"),
      Row(12L, "Acting Sergeant", null)))
  }

  test("currentAssignments window excludes out-of-range and unassigned employees") {
    val late = EmployeeAdminPipeline
      .currentAssignments(employees, assignments, asOf = "2024-01-01 18:00:00")
      .select("ceridian_id", "current_rank").collect().toSet
    assert(late === Set(Row(11L, "Desk Officer")))
  }

  test("updateBalanceHistory keeps incoming rows over re-arriving keys") {
    val history = Seq(
      (11L, "2024-01-01", "vacation", "VAC", 10.0),
      (12L, "2024-01-01", "vacation", "VAC", 5.0))
      .toDF("employee_id", "d", "time_bank", "code", "balance")
      .withColumn("retrieval_date", to_date(col("d"))).drop("d")
    val incoming = Seq((11L, "2024-01-01", "vacation", "VAC", 12.5))
      .toDF("employee_id", "date", "time_bank", "code", "balance")
    val out = EmployeeAdminPipeline.updateBalanceHistory(history, incoming)
      .select("employee_id", "balance").collect().toSet
    assert(out === Set(Row(11L, 12.5), Row(12L, 5.0)))
  }
}
