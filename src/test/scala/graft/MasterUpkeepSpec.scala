package graft

import graft.pipelines.{ComputronixPliPipeline, QalertPipeline}
import graft.tables.MasterTables
import org.apache.spark.sql.functions._

/** Idempotency / steady-state properties of the master-table
  * maintenance compositions (the reference runs these hourly/daily —
  * re-running against an already-merged state must be a no-op).
  */
class MasterUpkeepSpec extends SparkSpec {
  import spark.implicits._

  private def cde(rows: (String, String, String, Int)*) =
    rows.toDF("parc_num", "insp_type_desc", "insp_status", "create_date_UNIX")

  test("combineCondemnedDeadEnd is idempotent: re-merging the merged state " +
    "with the same snapshot changes nothing") {
    val incoming = cde(
      ("P1", "Condemned Property", "Active", 100),
      ("P3", "Dead End Property", "Closed", 104))
    val existing = cde(("P9", "Condemned Property", "Active", 80))
    val once  = ComputronixPliPipeline.combineCondemnedDeadEnd(incoming, existing)
    val twice = ComputronixPliPipeline.combineCondemnedDeadEnd(incoming, once)
    assert(twice.exceptAll(once).count() === 0)
    assert(once.exceptAll(twice).count() === 0)
    assert(once.count() === 3)
  }

  test("utilizersAppend re-run against the grown ledger appends nothing new") {
    val ls = Seq(("1112", "502", "Sam", 1, 0))
      .toDF("request_id", "submitter_id", "first_name",
        "curr_total_requests_made", "curr_total_requests_closed")
      .withColumn("last_name", lit(null).cast("string"))
      .withColumn("email", lit(null).cast("string"))
      .withColumn("phone", lit(null).cast("string"))
      .withColumn("address", lit(null).cast("string"))
      .withColumn("address_2", lit(null).cast("string"))
      .withColumn("city", lit(null).cast("string"))
      .withColumn("state", lit(null).cast("string"))
      .withColumn("zip", lit(null).cast("string"))
      .withColumn("twitter_name", lit(null).cast("string"))
      .withColumn("last_request_date", lit(null).cast("string"))
      .withColumn("last_modified_date", lit(null).cast("string"))
      .withColumn("satisfaction_level", lit(null).cast("string"))
      .withColumn("origin", lit("WEB"))
    val tickets = Seq(("1112", "2024-02-01", "Potholes", "2 Oak St", "Bloomfield"))
      .toDF("id", "create_date_est", "request_type_name",
        "pii_google_formatted_address", "neighborhood_name")
    val emptyLedger = ls.select(col("request_id"), col("submitter_id")).limit(0)
    val summariesNone = ls
      .withColumn("create_date_est", lit(null).cast("string"))
      .withColumn("request_type_name", lit(null).cast("string"))
      .withColumn("complaint_address", lit(null).cast("string"))
      .withColumn("neighborhood_name", lit(null).cast("string"))
      .limit(0)
    // first run: the (1112, 502) pair lands
    val first = QalertPipeline.utilizersAppend(ls, tickets, emptyLedger, summariesNone)
    assert(first.count() === 1)
    // second run with the pair now in the ledger: nothing appended
    val second = QalertPipeline.utilizersAppend(
      ls, tickets, first.select("request_id", "submitter_id"), summariesNone)
    assert(second.count() === 0)
  }

  test("changedRecordsStaging: no changes -> empty staging; applying the " +
    "staged values then re-staging is empty (fixpoint)") {
    val src = Seq((1, "a", 10), (2, "bX", 20)).toDF("src_id", "name", "qty")
    val upd = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "name", "qty")
    val staged = MasterTables.changedRecordsStaging(
      upd, src, "id", "src_id", Seq("name", "qty"))
    assert(staged.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((2, "bX")))
    // apply the staged values to upd, restage: empty
    val applied = MasterTables.syncUpdate(upd, staged, Seq("id"), Seq("name", "qty"))
    val restaged = MasterTables.changedRecordsStaging(
      applied, src, "id", "src_id", Seq("name", "qty"))
    assert(restaged.count() === 0)
  }
}
