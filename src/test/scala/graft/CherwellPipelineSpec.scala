package graft

import graft.pipelines.CherwellPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end cherwell incidents feed
  * (cherwell_incidents_dataflow.py:39-80): 29 struct-list pulls +
  * time triple + type vocabulary over dirty ndjson.
  */
class CherwellPipelineSpec extends SparkSpec {

  private def fields(kv: (String, String)*): String =
    kv.map { case (n, v) =>
      val vs = if (v == null) "null" else s""""$v""""
      s"""{"name": "$n", "value": $vs}"""
    }.mkString("""{"busObId": "6dd5", "fields": [""", ", ", "]}")

  test("full batch: extraction, AM/PM time triple, bool + nullstr types, quarantine") {
    val inc1 = fields(
      "IncidentID" -> "100", "CreatedDateTime" -> "06/15/2023 10:30:00 AM",
      "Status" -> "Closed", "ClosedDateTime" -> "06/15/2023 02:00:00 PM",
      "AssignedTeam" -> "Network", "Stat_IncidentReopened" -> "True",
      "OnBehalfOf" -> "False", "Stat_NumberOfTouches" -> "4",
      "Comments" -> "")
    val inc2 = fields(
      "IncidentID" -> "101", "CreatedDateTime" -> "01/10/2023 08:00:00 AM",
      "Status" -> "Open", "AssignedTeam" -> "", "Stat_IncidentReopened" -> "False",
      "OnBehalfOf" -> "True")
    val dir = tempDir("cherwell").toFile
    val f = new java.io.File(dir, "in.json")
    Files.write(f.toPath, (inc1 + "\n" + inc2 + "\nnot json at all {{{").getBytes)

    val (out, quarantine) = CherwellPipeline.runBatch(spark, f.getPath)
    assert(quarantine.count() === 1)
    val rows = out.orderBy("id").collect()
    assert(rows.length === 2)

    val r1 = rows(0)
    assert(r1.getAs[String]("id") === "100")
    assert(r1.getAs[String]("status") === "Closed")
    assert(r1.getAs[String]("assigned_team") === "Network")
    assert(r1.getAs[Boolean]("incident_reopened") === true)
    assert(r1.getAs[Boolean]("on_behalf_of") === false)
    assert(r1.getAs[String]("number_of_touches") === "4")
    assert(r1.getAs[String]("comments") === null, "empty string -> NULL (nullstr)")
    // 10:30 AM US/Eastern (EDT, -0400) == 14:30 UTC
    assert(r1.getAs[Long]("created_date_UNIX") === 1686839400L)
    assert(r1.getAs[String]("created_date_UTC") === "06/15/2023 14:30:00+0000")
    assert(r1.getAs[String]("created_date_EST") === "06/15/2023 10:30:00-0400")
    assert(r1.getAs[Long]("closed_date_UNIX") === 1686852000L, "02:00 PM parsed as 14:00")

    val r2 = rows(1)
    assert(r2.getAs[String]("assigned_team") === null, "'' -> NULL")
    assert(r2.getAs[Boolean]("incident_reopened") === false)
    // winter date: EST offset -0500
    assert(r2.getAs[Long]("created_date_UNIX") === 1673355600L)
    // ClosedDateTime absent from the fields array: search-miss fallback
    // yields some value per the reference's max-fallback contract, but
    // the unparseable text nulls the time triple
    assert(r2.isNullAt(r2.fieldIndex("closed_date_UNIX")))
  }

  test("all 29 output columns exist after transform") {
    import spark.implicits._
    val raw = spark.read.schema(CherwellPipeline.rawSchema)
      .json(Seq(fields("IncidentID" -> "1")).toDS())
    val out = CherwellPipeline.transform(raw)
    CherwellPipeline.fieldSpecs.map(_._2).foreach { c =>
      assert(out.columns.contains(c), s"missing $c")
    }
    // 7 time fields x 3 rendered columns
    CherwellPipeline.timeSpecs.map(_._1).foreach { f =>
      Seq("UTC", "EST", "UNIX").foreach { sfx =>
        assert(out.columns.contains(s"${f}_$sfx"))
      }
    }
  }
}
