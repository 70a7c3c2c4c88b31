package graft.queries

import graft.pipelines.{CherwellPipeline, ComputronixPliPipeline}
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
        |    total_proj_val, commercial_or_residential, issue_unix)""".stripMargin)
}
