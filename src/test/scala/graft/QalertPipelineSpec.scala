package graft

import graft.pipelines.QalertPipeline
import graft.pipelines.QalertPipeline.Masters
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end slice (SURVEY §7.2): raw dirty ndjson → transform chain →
  * city-limits + revgeo enrichment → master integration over two
  * batches → scrubbed export. One of everything.
  */
class QalertPipelineSpec extends SparkSpec {

  private val cityWkt    = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"
  private val enclaveWkt = "POLYGON((8 8, 9 8, 9 9, 8 9, 8 8))"
  private val zones = Map(
    "neighborhood" -> Seq(
      ("southside", "POLYGON((0 0, 10 0, 10 5, 0 5, 0 0))", 0L, None: Option[Long]),
      ("northside", "POLYGON((0 5, 10 5, 10 10, 0 10, 0 5))", 0L, None: Option[Long])),
    "council_district" -> Seq(
      ("d1", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))", 0L, None: Option[Long])))

  private def j(id: Long, master: Long, status: Int, sNum: String, sName: String,
                lat: Double, long: Double, comments: String, tpe: String = "Pothole"): String =
    s"""{"id": $id, "master": $master, "status": $status, "typeId": 1, "typeName": "$tpe", """ +
      s""""addDateUnix": 1600000000, "lastActionUnix": 1600001000, "closeDate": null, """ +
      s""""streetNum": ${if (sNum == null) "null" else "\"" + sNum + "\""}, """ +
      s""""streetName": ${if (sName == null) "null" else "\"" + sName + "\""}, """ +
      s""""crossStreetName": null, "streetId": 7, "crossStreetId": 8, "cityName": "Pittsburgh", """ +
      s""""latitude": $lat, "longitude": $long, "comments": "$comments", "privateNotes": "note", """ +
      s""""origin": "Call Center", "dept": "DPW", "addDate": "x", "lastAction": "x", """ +
      s""""displayDate": "x", "displayLastAction": "x", "district": "x", "submitter": "x", """ +
      s""""priorityValue": 1, "aggregatorId": 2, "priorityToDisplay": "x", "aggregatorInfo": "x", """ +
      s""""resumeDate": null, "cityId": 1}"""

  test("full batch + incremental second batch") {
    val dir = tempDir("qalert").toFile
    val batch1 = Seq(
      j(1, 0, 0, "123", "Main St", 2.0, 2.0, "John Doe dumped trash"), // parent, southside
      j(2, 0, 1, "456", "Oak Ave", 7.0, 7.0, "pothole here"),          // closed parent, northside
      j(3, 1, 0, "123", "Main St", 2.0, 2.0, "child of 1"),            // child of 1
      j(4, 0, 0, null, null, 0.0, 0.0, "no location"),                 // Missing
      j(5, 0, 0, "1", "Far St", 50.0, 50.0, "outside city"),           // outside city
      // dirty line: two objects concatenated
      j(6, 0, 0, "9", "Edge St", 3.0, 3.0, "first of pair") +
        j(7, 0, 3, "10", "Edge St", 3.0, 3.0, "second of pair")
    )
    val f1 = new java.io.File(dir, "batch1.json")
    Files.write(f1.toPath, batch1.mkString("\n").getBytes)

    val empty = {
      val (raw, _) = graft.sources.JsonSource.readRepaired(spark, f1.getPath, QalertPipeline.rawSchema)
      val shaped = QalertPipeline.enrich(
        QalertPipeline.formatDedupe(QalertPipeline.transform(raw)),
        cityWkt, enclaveWkt, zones)
      QalertPipeline.emptyMasters(spark, shaped)
    }

    val (m1, export1, quarantine1) = QalertPipeline.runBatch(
      spark, f1.getPath, empty, cityWkt, enclaveWkt, zones)
    val linked1 = m1.allLinked.cache()

    // 7 rows, 6 parents (ids 1,2,4,5,6,7) + 1 child
    assert(m1.currentStatus.count() === 7)
    assert(quarantine1.count() === 0, "repaired dirty line should parse")
    assert(linked1.count() === 6)

    // address classification
    val types = m1.currentStatus.select("id", "address_type")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("1") === "Precise")
    assert(types("4") === "Missing")
    assert(types("5") === "Outside of City")

    // geo enrichment
    val hoods = m1.currentStatus.select("id", "neighborhood")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(hoods("1") === Some("southside"))
    assert(hoods("2") === Some("northside"))
    assert(hoods("5") === None)

    // child aggregation onto parent 1
    val p1 = linked1.filter(col("id") === "1").head()
    assert(p1.getAs[Seq[_]]("child_tickets").length === 1)
    assert(p1.getAs[Long]("num_requests") === 2L)

    // closed parent got closed_* copied from last_action
    val p2 = linked1.filter(col("id") === "2").head()
    assert(p2.getAs[String]("status_name") === "closed")
    assert(p2.getAs[Long]("closed_date_unix") === 1600001000L)

    // PII contract on export
    val exportCols = export1.columns.toSet
    assert(!exportCols.exists(_.startsWith("pii_")), "no pii_ columns exported")
    val e1 = export1.filter(col("id") === "1").head()
    assert(e1.getAs[String]("anon_comments") === "[PERSON_NAME] dumped trash")
    assert(e1.getAs[String]("anon_input_address").startsWith("1XX Main St"))

    // ---- batch 2: ticket 6 re-arrives as child of 2; ticket 2 closes out; new ticket 8
    val batch2 = Seq(
      j(6, 2, 0, "9", "Edge St", 3.0, 3.0, "was parent now child"), // false parent repair
      j(2, 0, 1, "456", "Oak Ave", 7.0, 7.0, "update"),
      j(8, 0, 0, "77", "New St", 4.0, 4.0, "fresh ticket"))
    val f2 = new java.io.File(dir, "batch2.json")
    Files.write(f2.toPath, batch2.mkString("\n").getBytes)

    val (m2, export2, _) = QalertPipeline.runBatch(
      spark, f2.getPath, m1, cityWkt, enclaveWkt, zones)
    val linked2 = m2.allLinked.cache()

    // false parent 6 removed from master parents
    assert(linked2.filter(col("id") === "6").count() === 0)
    // re-arrived as child of 2
    val p2b = linked2.filter(col("id") === "2").head()
    assert(p2b.getAs[Seq[_]]("child_tickets").length === 1)
    // new parent 8 inserted
    assert(linked2.filter(col("id") === "8").count() === 1)
    // current status upserted: still one row per id
    assert(m2.currentStatus.filter(col("id") === "2").count() === 1)
    assert(m2.currentStatus.count() === 8) // ids 1..8

    assert(export2.filter(col("id") === "8").count() === 1)
  }

  test("integrate is idempotent: re-running the same batch leaves masters unchanged") {
    val dir = tempDir("qalert3").toFile
    val lines = Seq(
      j(1, 0, 0, "123", "Main St", 2.0, 2.0, "parent one"),
      j(2, 0, 1, "456", "Oak Ave", 7.0, 7.0, "closed parent"),
      j(3, 1, 0, "123", "Main St", 2.0, 2.0, "child of 1"),
      j(4, 1, 0, "124", "Main St", 2.0, 2.0, "second child of 1"))
    val f = new java.io.File(dir, "b.json")
    Files.write(f.toPath, lines.mkString("\n").getBytes)

    val (raw, _) = graft.sources.JsonSource.readRepaired(spark, f.getPath, QalertPipeline.rawSchema)
    val shaped = QalertPipeline.enrich(
      QalertPipeline.formatDedupe(QalertPipeline.transform(raw)), cityWkt, enclaveWkt, zones)
    val m1 = QalertPipeline.integrate(QalertPipeline.emptyMasters(spark, shaped), shaped)
    val m2 = QalertPipeline.integrate(m1, shaped) // re-run, same batch

    // child arrays must not grow on the re-run
    val p1 = m2.allLinked.filter(col("id") === "1").head()
    assert(p1.getAs[Seq[_]]("child_tickets").length === 2)
    assert(p1.getAs[Long]("num_requests") === 3L)
    // whole master frames unchanged (unordered compare, both ways)
    assert(m2.allLinked.exceptAll(m1.allLinked).count() === 0)
    assert(m1.allLinked.exceptAll(m2.allLinked).count() === 0)
    assert(m2.currentStatus.exceptAll(m1.currentStatus).count() === 0)
    assert(m1.currentStatus.exceptAll(m2.currentStatus).count() === 0)
  }

  test("private request types filtered from export (drop_pii row filter)") {
    val dir = tempDir("qalert2").toFile
    val lines = Seq(
      j(1, 0, 0, "1", "A St", 2.0, 2.0, "ok", tpe = "Pothole"),
      j(2, 0, 0, "2", "B St", 2.0, 2.0, "hidden", tpe = "Private Violation"))
    val f = new java.io.File(dir, "b.json")
    Files.write(f.toPath, lines.mkString("\n").getBytes)
    val (raw, _) = graft.sources.JsonSource.readRepaired(spark, f.getPath, QalertPipeline.rawSchema)
    val shaped = QalertPipeline.enrich(
      QalertPipeline.formatDedupe(QalertPipeline.transform(raw)), cityWkt, enclaveWkt, zones)
    val m = QalertPipeline.integrate(QalertPipeline.emptyMasters(spark, shaped), shaped)
    val export = QalertPipeline.dropPiiForExport(m.allLinked, Seq("Private Violation"))
    assert(export.count() === 1)
    assert(export.head().getAs[String]("id") === "1")
  }

  test("NULL parent_ticket_id is a child (reference parity: Python " +
    "`parent != \"0\"` is True for None) — the row reaches the " +
    "current-status master instead of vanishing from both branches") {
    val dir = tempDir("qalert3").toFile
    // id=7 has NO master key at all -> parent_ticket_id NULL
    val noMaster =
      """{"id": 7, "status": 0, "typeId": 1, "typeName": "Pothole", """ +
        """"addDateUnix": 1600000000, "lastActionUnix": 1600001000, """ +
        """"streetNum": "1", "streetName": "A St", "cityName": "Pgh", """ +
        """"latitude": 2.0, "longitude": 2.0, "comments": "x", "privateNotes": "y"}"""
    val f = new java.io.File(dir, "b.json")
    Files.write(f.toPath, (Seq(j(1, 0, 0, "1", "A St", 2.0, 2.0, "ok")) :+ noMaster)
      .mkString("\n").getBytes)
    val (raw, _) = graft.sources.JsonSource.readRepaired(spark, f.getPath, QalertPipeline.rawSchema)
    val shaped = QalertPipeline.enrich(
      QalertPipeline.formatDedupe(QalertPipeline.transform(raw)), cityWkt, enclaveWkt, zones)
    assert(shaped.filter(col("id") === "7").head().getAs[Boolean]("child_ticket") === true)
    val m = QalertPipeline.integrate(QalertPipeline.emptyMasters(spark, shaped), shaped)
    // parent-less child: absent from all_linked (reference's IN guard),
    // present in the current-status snapshot — the two masters agree
    assert(m.currentStatus.filter(col("id") === "7").count() === 1)
    assert(m.allLinked.filter(col("id") === "7").count() === 0)
  }

  test("export JSON drops null-id child structs (reference's WHERE " +
    "child_id IS NOT NULL) and NOT IN excludes NULL request types") {
    import spark.implicits._
    val master = Seq(
      ("1", "0", false, "open", "Pothole", 1L, "u", "e", 2L, null.asInstanceOf[java.lang.Long],
        "Precise", "a", 1.0, 1.0, "c", 2L,
        Seq(("c1", "cc", "cn"), (null, "xx", "yy"))),
      ("2", "0", false, "open", null, 1L, "u", "e", 2L, null.asInstanceOf[java.lang.Long],
        "Precise", "a", 1.0, 1.0, "c", 1L, Seq.empty[(String, String, String)]))
      .toDF("id", "parent_ticket_id", "child_ticket", "status_name", "request_type_name",
        "create_date_unix", "create_date_unix_utc", "create_date_unix_est",
        "last_action_unix", "closed_date_unix", "address_type", "anon_input_address",
        "anon_lat", "anon_long", "anon_comments", "num_requests", "kids")
      .withColumn("child_tickets", expr(
        "transform(kids, k -> struct(k._1 as child_id, k._2 as child_comments, k._3 as child_notes))"))
      .drop("kids")
    val out = QalertPipeline.dropPiiForExport(master, Seq("Private Violation"))
    val rows = out.collect()
    assert(rows.length === 1, "NULL request_type_name excluded like SQL NOT IN")
    val json = rows(0).getAs[String]("child_tickets_json")
    assert(json.contains("c1") && !json.contains("yy"),
      "null-id child struct filtered from the export JSON")
  }
}
