package graft

import graft.operators.AddressOps
import org.apache.spark.sql.functions._

class GeocodeSpec extends SparkSpec {
  import spark.implicits._

  test("geocodeFromLookup: offline broadcast geocode + Unmappable rule (dataflow_utils.py:482-511)") {
    val classified = Seq(
      (1L, "123 Main St, Pittsburgh", "Precise"),
      (2L, "999 Nowhere Ln, Pittsburgh", "Precise"),
      (3L, null.asInstanceOf[String], "Missing"))
      .toDF("id", "input_address", "address_type")
    val lookup = Seq(
      ("123 main st, pittsburgh", "123 Main St, Pittsburgh, PA 15213", 40.44, -79.99))
      .toDF("address", "formatted_address", "lat", "long")
    val out = AddressOps.geocodeFromLookup(classified, lookup).orderBy("id").collect()
    assert(out(0).getAs[String]("google_formatted_address") === "123 Main St, Pittsburgh, PA 15213")
    assert(out(0).getAs[Double]("google_lat") === 40.44)
    assert(out(0).getAs[String]("address_type") === "Precise")
    assert(out(1).getAs[String]("address_type") === "Unmappable",
      "classified but not geocodable => Unmappable")
    assert(out(2).getAs[String]("address_type") === "Missing",
      "Missing stays Missing — never Unmappable")
  }
}
