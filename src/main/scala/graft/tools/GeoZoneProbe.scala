package graft.tools

import graft.Tables
import graft.geo.Geo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Repeated timing of the q47/q76 revGeoZone bench shapes to separate
  * plan cost from environment noise (the q76 bench sample once read
  * 36 s where adjacent runs read 0.5 s).
  */
object GeoZoneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pts = Tables.events(spark, sfDir).select(
      col("event_id"),
      ((col("user_id") % 10).cast(DoubleType) + 0.5).as("lat"),
      (pmod(col("value").cast("decimal(10,2)") * 100, lit(1000)).cast(DoubleType) / 100.0 + 0.001).as("long"),
      unix_timestamp(col("ts")).as("create_date_unix"))
    val zones47 = Seq(
      ("west_old", "POLYGON((0 0, 5 0, 5 10, 0 10, 0 0))", 0L, Some(1705000000L)),
      ("west_new", "POLYGON((0 0, 5 0, 5 10, 0 10, 0 0))", 1705000001L, None),
      ("east", "POLYGON((5 0, 10 0, 10 10, 5 10, 5 0))", 0L, None))
    val zones76 = Seq(
      ("donut", "POLYGON((0 0, 6 0, 6 10, 0 10, 0 0), (2 2, 4 2, 4 8, 2 8, 2 2))", 0L, None),
      ("east",  "POLYGON((6 0, 10 0, 10 10, 6 10, 6 0))", 0L, None))
    def run(zs: Seq[(String, String, Long, Option[Long])]): Double = {
      val t0 = System.nanoTime()
      Geo.revGeoZone(pts, zs, outCol = "zone",
          latCol = "lat", longCol = "long", eventUnixCol = "create_date_unix")
        .groupBy("zone").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to 4)
      println(f"[geozone] iter=$i q47=${run(zones47)}%6.2f s q76=${run(zones76)}%6.2f s")
    spark.stop()
  }
}
