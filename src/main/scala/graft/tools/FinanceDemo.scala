package graft.tools

import graft.operators.NestedOps
import graft.pipelines.FinancePipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Consumer-style driver for the finance pipeline + nested-payload
  * operators: JDBC-shaped extract → cleanup → centroid join → revgeo →
  * partitioned publish + CSV, and a Computronix/Cherwell-style nested
  * extraction.
  */
object FinanceDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- finance: extract (as a JDBC query would hand it over) → publish
    val extracted = Seq(
      ("0001X00001000101", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"),
        "0 MAIN ST", "PGH, PA", "ALLENTOWN SLOPES", 1700000000L),
      ("0084J00123000000", java.sql.Timestamp.valueOf("2024-02-20 00:00:00"),
        "45 OAK AVE", ", ", "DOWNTOWN", 1700000000L))
      .toDF("PIN", "MODIFY_DATE", "ADDRESS", "BILLING_CITY", "NEIGHBORHOOD", "MOD_UNIX")
    val parcels = Seq(
      ("0001X00001000101", "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"),
      ("0084J00123000000", "POLYGON((4 4, 6 4, 6 6, 4 6, 4 4))")).toDF("zone", "geometry")
    val zones = Map("neighborhood_geo" -> Seq(
      ("central", "POLYGON((0 0, 3 0, 3 3, 0 3, 0 0))", 0L, None: Option[Long]),
      ("east", "POLYGON((3 3, 9 3, 9 9, 3 9, 3 3))", 0L, None: Option[Long])))

    val cleaned  = FinancePipeline.cleanup(extracted)
    val enriched = FinancePipeline.enrich(cleaned, parcels, zones, "mod_unix")
    println("=== finance enriched ===")
    enriched.select("parc_num", "address", "billing_city", "neighborhood",
      "latitude", "longitude", "neighborhood_name").show(false)
    val dir = Files.createTempDirectory("findemo").toFile
    FinancePipeline.publish(enriched, s"$dir/table", s"$dir/csv",
      Seq("parc_num", "address", "neighborhood_name"))
    println("=== published partitions ===")
    new java.io.File(s"$dir/table").listFiles().map(_.getName)
      .filter(_.startsWith("__part=")).sorted.foreach(println)
    println("=== csv head ===")
    scala.io.Source.fromFile(
      new java.io.File(s"$dir/csv").listFiles().filter(_.getName.endsWith(".csv")).head)
      .getLines().take(3).foreach(println)

    // --- nested extraction (Cherwell/Computronix shapes)
    val nested = spark.read.json(spark.createDataset(Seq(
      """{"id": 1, "fields": [{"name": "Status", "value": "Open", "updated": 3}, {"name": "Owner", "value": "DPW", "updated": 5}], "XREF": [{"TABLE": {"PERMITTYPE": "solar", "XREF2": [{"TABLE2": {"PARCEL": "0001X00001000101"}}]}}]}""",
      """{"id": 2, "fields": [{"name": "Owner", "value": "DOMI", "updated": 9}], "XREF": []}"""
    ))(org.apache.spark.sql.Encoders.STRING))
    val extractedNested = NestedOps.unNestXref(
      NestedOps.extractFromStructList(nested, "fields", "name", "Status", "value", "status"),
      "XREF", "TABLE", Seq("PERMITTYPE"), "XREF2", "TABLE2", Seq("PARCEL"))
    println("=== nested extraction ===")
    extractedNested.select("id", "status", "PERMITTYPE", "PARCEL").show(false)

    // --- twilio pandas-layer cleanup + incremental window
    val rawConvs = Seq(
      ("c1", "2024-01-01", "Inbound", "Yes", 4125551234L),
      ("c2", "", "Outbound", "No", 4125555678L))
      .toDF("conversation_id", "date", "kind", "abandoned", "phone")
    println("=== twilio transform ===")
    graft.pipelines.TwilioPipeline.transform(rawConvs).show(false)
    val log = Files.createTempDirectory("tw").resolve("log.json").toString
    println("first window:  " + graft.pipelines.TwilioPipeline.runWindow(log, 1000L))
    graft.state.Watermark.recordSuccess(log, 1000L, 2L)
    println("second window: " + graft.pipelines.TwilioPipeline.runWindow(log, 2000L))

    spark.stop()
  }
}
