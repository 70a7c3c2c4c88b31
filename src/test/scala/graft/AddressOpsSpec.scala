package graft

import graft.operators.AddressOps
import org.apache.spark.sql.functions._

class AddressOpsSpec extends SparkSpec {
  import spark.implicits._

  test("formatAndClassifyAddress: malformed STRING coordinates degrade " +
    "to 0.0/Missing instead of throwing under ANSI mode") {
    val df = Seq(
      ("1", null, null, "N/A", "garbage"),
      ("2", null, null, "40.4", "-79.9"))
      .toDF("id", "streetNum", "streetName", "lat", "long")
      .withColumn("crossStreet", lit(null).cast("string"))
      .withColumn("city", lit("Pgh"))
    val out = AddressOps.formatAndClassifyAddress(df,
      streetNum = "streetNum", streetName = "streetName",
      crossStreet = "crossStreet", city = "city",
      lat = "lat", long = "long", containsPii = false)
      .select("id", "address_type", "lat", "long").orderBy("id").collect()
    assert(out(0).getString(1) === "Missing")
    assert(out(0).getDouble(2) === 0.0 && out(0).getDouble(3) === 0.0)
    assert(out(1).getString(1) === "Coordinates Only")
    assert(out(1).getDouble(2) === 40.4)
  }
}
