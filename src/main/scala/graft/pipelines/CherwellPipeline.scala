package graft.pipelines

import graft.operators.ColumnOps.{RBool, RNullStr, RefType}
import graft.operators.{ColumnOps, NestedOps, TimeOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Cherwell service-incidents feed driver
  * (cherwell_incidents_dataflow.py:39-80): each raw incident carries a
  * `fields` array of {name, value} structs; 29 named fields are pulled
  * out by searching the array (`ExtractFieldWithComplexity`), then the
  * 7 timestamp columns get the UTC/EST/UNIX triple (declared
  * US/Eastern) and the nullable-string / boolean type vocabulary is
  * applied.
  *
  * Spark shape: the 29 searches are independent column expressions
  * over the same small array — one projection, no UDFs, no shuffle;
  * the whole transform is a single narrow map stage at any scale.
  */
object CherwellPipeline {

  /** (search name in `fields`, output column) — the 29 pulls of
    * cherwell_incidents_dataflow.py:42-58.
    */
  val fieldSpecs: Seq[(String, String)] = Seq(
    "IncidentID" -> "id", "CreatedDateTime" -> "created_date",
    "Status" -> "status", "Service" -> "service", "Category" -> "category",
    "Subcategory" -> "subcategory", "Description" -> "description",
    "Priority" -> "priority", "LastModifiedDateTime" -> "last_modified_date",
    "ClosedDateTime" -> "closed_date", "AssignedTeam" -> "assigned_team",
    "AssignedTo" -> "assigned_to", "AssignedToManager" -> "assigned_to_manager",
    "IncidentType" -> "incident_type", "SLARespondByDeadline" -> "respond_by_deadline",
    "SLAResolveByDeadline" -> "resolve_by_deadline", "CallSource" -> "call_source",
    "Stat_IncidentReopened" -> "incident_reopened",
    "Stat_DateTimeResponded" -> "responded_date",
    "Stat_DateTimeResolved" -> "resolved_date",
    "Stat_NumberOfTouches" -> "number_of_touches",
    "Stat_NumberOfEscalations" -> "number_of_escalations",
    "RequesterDepartment" -> "requester_department", "Requester" -> "requester",
    "OnBehalfOf" -> "on_behalf_of", "CustomerDisplayName" -> "customer",
    "InitialAssignedTeam" -> "initial_assigned_team", "Comments" -> "comments",
    "CloseDescription" -> "close_description")

  /** cherwell_incidents_dataflow.py:59-62 — all declared US/Eastern. */
  val timeSpecs: Seq[(String, String)] = Seq(
    "created_date", "last_modified_date", "closed_date", "responded_date",
    "resolved_date", "respond_by_deadline", "resolve_by_deadline")
    .map(_ -> "US/Eastern")

  /** cherwell_incidents_dataflow.py:63-66. */
  val typeSpecs: Seq[(String, RefType)] = Seq(
    "assigned_team" -> RNullStr, "assigned_to" -> RNullStr,
    "assigned_to_manager" -> RNullStr, "incident_type" -> RNullStr,
    "incident_reopened" -> RBool, "requester_department" -> RNullStr,
    "requester" -> RNullStr, "on_behalf_of" -> RBool, "customer" -> RNullStr,
    "comments" -> RNullStr, "close_description" -> RNullStr,
    "initial_assigned_team" -> RNullStr)

  /** Raw Cherwell API payload shape consumed by the reference. */
  val rawSchema: StructType = StructType(Seq(
    StructField("busObId", StringType),
    StructField("fields", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("value", StringType)))))))

  /** The full transform: 29 struct-list searches → time triple → type
    * vocabulary.
    */
  def transform(raw: DataFrame): DataFrame = {
    val extracted = NestedOps.extractAllFromStructList(
      raw, "fields", "name", "value", fieldSpecs).drop("fields")
    ColumnOps.changeTypes(TimeOps.standardizeTimes(extracted, timeSpecs), typeSpecs)
  }

  /** End-to-end batch: dirty-ndjson read (parse-gated repair +
    * quarantine) → transform. Returns (incidents, quarantine).
    */
  def runBatch(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val (raw, quarantine) = graft.sources.JsonSource.readRepaired(spark, path, rawSchema)
    (transform(raw), quarantine)
  }
}
