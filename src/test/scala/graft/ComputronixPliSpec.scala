package graft

import graft.pipelines.ComputronixPliPipeline
import java.nio.file.Files

/** End-to-end Computronix PLI permits (WPRDC)
  * (computronix_pli_permits_wprdc_dataflow.py:24-104): two-level xref
  * flatten, rename, upper-case, time triple, parcel standardization.
  */
class ComputronixPliSpec extends SparkSpec {

  private val full =
    """{"EXTERNALFILENUM": "dc2021-01234", "permit_type": "electrical",
      |"ISSUEDATE": "03/01/2024", "ALLCONTRACTORSNAME": "acme electric",
      |"TYPEOFWORKDESCRIPTION": "new", "COMMERCIALORRESIDENTIAL": "commercial",
      |"WORKDESCRIPTION": "rewire", "TOTALPROJECTVALUE": 15000.0,
      |"JOBPARCELXREF": [{"PARCEL": {"FORMATTEDPARCELNUMBER": "1-X-1-1-1",
      |"ADDRESSABLEOBJEFORMATTEDADDRES": "123 main st",
      |"PARCELPARCELOWNERXREF": [{"PARCELOWNER": {"OWNERNAME": "jane roe"}}]}}]}"""
      .stripMargin.replace("\n", " ")

  private val noXref =
    """{"EXTERNALFILENUM": "dc2021-09999", "permit_type": "building",
      |"ISSUEDATE": "bogus", "ALLCONTRACTORSNAME": null,
      |"TYPEOFWORKDESCRIPTION": "repair", "COMMERCIALORRESIDENTIAL": "residential",
      |"WORKDESCRIPTION": "roof", "TOTALPROJECTVALUE": 2000.0,
      |"JOBPARCELXREF": []}"""
      .stripMargin.replace("\n", " ")

  test("two-level xref flatten + rename + upper + time triple + parcel standardize") {
    val dir = tempDir("cx").toFile
    val f = new java.io.File(dir, "in.json")
    Files.write(f.toPath, (full + "\n" + noXref).getBytes)
    val (out, quarantine) = ComputronixPliPipeline.runBatch(spark, f.getPath)
    assert(quarantine.count() === 0)
    val rows = out.orderBy("ext_file_num").collect()
    assert(rows.length === 2)

    val r1 = rows(0)
    assert(r1.getAs[String]("ext_file_num") === "DC2021-01234")
    assert(r1.getAs[String]("permit_type") === "ELECTRICAL")
    assert(r1.getAs[String]("owner_name") === "JANE ROE")
    assert(r1.getAs[String]("obj_address") === "123 MAIN ST")
    assert(r1.getAs[String]("parc_num") === "0001X00001000101",
      "upper then standardized to county 16-char")
    assert(r1.getAs[String]("contractor_name") === "ACME ELECTRIC")
    // 03/01/2024 midnight US/Eastern (EST -0500) == 05:00 UTC
    assert(r1.getAs[Long]("issue_date_UNIX") === 1709269200L)

    val r2 = rows(1)
    assert(r2.getAs[String]("parc_num") === "invalid input",
      "missing xref level -> NULL parcel -> standardizer's invalid marker")
    assert(r2.getAs[String]("owner_name") === null)
    assert(r2.getAs[String]("obj_address") === null)
    assert(r2.isNullAt(r2.fieldIndex("issue_date_UNIX")), "unparseable date")
  }

  test("globalSurrogateId == naive global row_number: bucket boundaries, " +
    "ties, negatives, NULLs-first") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // orderCol values straddle bucket edges (bucketWidth=10), repeat
    // (tie-break on k2), go negative (truncating-div bucket), and
    // include NULL (must sort first)
    val rows = Seq[(java.lang.Long, String)](
      (25L, "b"), (25L, "a"), (9L, "z"), (10L, "m"), (11L, "m"),
      (-3L, "n"), (-13L, "n"), (0L, "q"), (null, "x"), (null, "w"),
      (19L, "k"), (20L, "k"), (21L, "k"))
      .toDF("ord", "k2")
    val got = graft.operators.DedupOps
      .globalSurrogateId(rows, "ord", Seq("k2"), "sid", bucketWidth = 10L)
      .select("ord", "k2", "sid")
    val want = rows.withColumn("sid",
      row_number().over(Window.orderBy(col("ord").asc_nulls_first, col("k2").asc))
        .cast("long"))
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0,
      "two-level surrogate must reproduce the single-window numbering exactly")
    // dense 1..N
    val ids = got.select("sid").as[Long].collect().sorted
    assert(ids === (1L to rows.count()).toArray)
  }
}
