package graft.pipelines

import graft.geo.Geo
import graft.operators.ColumnOps
import graft.sources.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Finance tax-delinquency GIS/WPRDC pipeline (SURVEY §3.2;
  * af2_dags/finance_tax_delinquency_gis_wprdc_airflow.py): JDBC
  * extract → pandas-style cleanup → parcel-centroid join → revgeo →
  * month-partitioned table + CSV export. One driver program.
  *
  * The JDBC fetch itself is `spark.read.format("jdbc")` in production
  * (built-in); the pipeline body below starts from the extracted
  * DataFrame, which is what the reference's loader hands to BQ.
  */
object FinancePipeline {

  /** WPRDC neighborhood-name crosswalk
    * (finance_tax_delinquency_gis_wprdc_extract.py:38-46).
    */
  val NeighborhoodConvs: Map[String, String] = Map(
    "BANKSVILLE CITY" -> "BANKSVILLE",
    "ALLENTOWN SLOPES" -> "ALLENTOWN",
    "ARLINGTON FLATS" -> "ARLINGTON",
    "ARLINGTON SLOPES" -> "ARLINGTON",
    "BLOOMFIELD BUSINESS DISTR" -> "BLOOMFIELD",
    "SHADYSIDE BUSINESS DISTR" -> "SHADYSIDE",
    "DOWNTOWN" -> "CENTRAL BUSINESS DISTRICT")

  /** Cleanup stage (extract.py:36-55): lowercase column names,
    * neighborhood crosswalk + title case, pin→parc_num rename, strip
    * leading "0 " from addresses, null out the "', '" empty
    * billing-city artifact.
    */
  def cleanup(extracted: DataFrame): DataFrame = {
    val lowered = ColumnOps.columnsToLowerCase(extracted)
    val crosswalked = ColumnOps.convertStringCase(
      ColumnOps.crosswalkMap(lowered, "neighborhood", NeighborhoodConvs),
      "neighborhood", "title")
    ColumnOps.renameFields(crosswalked, Seq("pin" -> "parc_num"))
      .withColumn("address", regexp_replace(col("address"), "^0\\s", ""))
      .withColumn("billing_city",
        when(col("billing_city") === ", ", lit(null)).otherwise(col("billing_city")))
  }

  /** Coordinates + revgeo enrichment (airflow steps 2-3): broadcast
    * parcel-centroid join (`ST_Y/ST_X(ST_CENTROID(geometry))`,
    * geo_queries.py:111-120), then the zone-family joins.
    */
  def enrich(df: DataFrame, parcels: DataFrame,
             zoneFamilies: Map[String, Seq[(String, String, Long, Option[Long])]],
             eventUnixCol: String): DataFrame = {
    val withCoords = Geo.parcelCentroidJoin(df, parcels, "parc_num")
    val geoed = Geo.revGeoTimeBound(withCoords, zoneFamilies,
      latCol = "latitude", longCol = "longitude", eventUnixCol = eventUnixCol)
    // COALESCE(neighborhood_name, neighborhood) parity
    // (finance_tax_delinquency_gis_wprdc_airflow.py:78-93)
    if (geoed.columns.contains("neighborhood_geo"))
      geoed.withColumn("neighborhood_name",
        coalesce(col("neighborhood_geo"), col("neighborhood")))
    else geoed
  }

  /** Partitioned publish + CSV export (airflow steps 4-6):
    * month-partitioned parquet (DATE_TRUNC(modify_date, MONTH) parity)
    * and a headered CSV export of the WPRDC projection.
    */
  def publish(df: DataFrame, tablePath: String, csvPath: String,
              exportCols: Seq[String]): Unit = {
    Sinks.writePartitioned(df, tablePath, "modify_date", "month")
    Sinks.writeCsv(df.select(exportCols.map(col): _*), csvPath)
  }
}
