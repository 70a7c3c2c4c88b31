package graft

import graft.operators.{ColumnOps, TimeOps}
import graft.pipelines.FeedPipelines
import org.apache.spark.sql.functions._

/** Specs for the remaining per-feed drivers and the operator-fidelity
  * details their compositions depend on. The full-feed goldens live in
  * the oracle gate (q59-q65); these cover the edge semantics directly.
  */
class FeedPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("stripBeforeDelim keep=1: second split element, IndexError -> NULL " +
    "(dataflow_utils.py:676-685)") {
    val df = Seq("10-Parks-East", "Finance", "50-DPW", null, "")
      .toDF("dept")
    val out = ColumnOps.stripBeforeDelim(df, "dept", "-", keep = 1)
      .collect().map(r => Option(r.getString(0))).toSeq
    // split('-')[1] is the SECOND element (not the last); a value with
    // no delimiter raises IndexError in the reference -> None; NULL and
    // empty pass through the truthiness guard unchanged
    assert(out === Seq(Some("Parks"), None, Some("DPW"), None, Some("")))
  }

  test("standardizeEthnicity: split at ' (', NULL/empty -> Decline to Answer " +
    "(ceridian_employees_dataflow.py:23-29)") {
    val df = Seq("White (Not Hispanic or Latino)", "Two or More Races", null, "")
      .toDF("DFEthnicity_ShortName")
    val out = FeedPipelines.standardizeEthnicity(df)
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("White", "Two or More Races",
      "Decline to Answer", "Decline to Answer"))
  }

  test("crosswalkMapTo: tracked maps, untracked and NULL pass through " +
    "(dataflow_utils.py:462-477)") {
    val df = Seq(Some("Vacation"), Some("Comp Time"), None).toDF("time_bank")
    val out = ColumnOps.crosswalkMapTo(df, "time_bank", "code",
        Map("Vacation" -> "VAC"))
      .select("code").collect().map(r => Option(r.getString(0))).toSeq
    assert(out === Seq(Some("VAC"), Some("Comp Time"), None))
  }

  test("standardizeTimes tFormat=%m/%d/%Y: date-only strings, no offset " +
    "(ceridian_timekeeping_dataflow.py:52)") {
    val df  = Seq("2023-05-01", "2023-12-15").toDF("d")
    val out = TimeOps.standardizeTimes(df, Seq("d" -> "US/Eastern"),
        tFormat = "%m/%d/%Y")
      .select("d_EST", "d_UNIX").collect()
    assert(out(0).getString(0) === "05/01/2023")
    assert(out(0).getLong(1) === 1682913600L) // midnight EDT = 04:00 UTC
    assert(out(1).getString(0) === "12/15/2023")
    assert(out(1).getLong(1) === 1702616400L) // midnight EST = 05:00 UTC
  }

  test("adUsers: enabled from code whitelist, NULL code -> NULL; " +
    "non-numeric id skips zero-pad") {
    val raw = spark.read.json(Seq(
      """{"givenName":"Al","sn":"Po","cn":"Al Po","sAMAccountName":"apo",
        |"mail":"a@x.gov","userAccountControl":"4194816",
        |"department":"X","employeeId":"9"}""",
      """{"givenName":"Bea","sn":"Ng","cn":"Bea Ng","sAMAccountName":"bng",
        |"mail":null,"userAccountControl":null,
        |"department":"X","employeeId":"A1"}""")
      .map(_.stripMargin.replace("\n", " ")).toDS())
    val out = FeedPipelines.adUsers(raw, Map.empty)
      .select("employee_id", "enabled").orderBy("employee_id").collect()
    assert(out(0).getString(0) === "000009" && out(0).getBoolean(1))
    assert(out(1).getString(0) === "A1" && out(1).isNullAt(1))
  }

  test("intimeTimebank: type cast + zero-pad composition " +
    "(intime_timebank_dataflow.py:20-40)") {
    val raw = spark.read.json(Seq(
      """{"employee_id": 42, "time_bank": "SICK", "balance": "12.5"}""").toDS())
    val r = FeedPipelines.intimeTimebank(raw)
      .select("employee_id", "balance").head()
    assert(r.getString(0) === "000042" && r.getDouble(1) === 12.5)
  }
}
