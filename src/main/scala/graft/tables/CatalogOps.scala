package graft.tables

import org.apache.spark.sql.SparkSession

/** Catalog / orchestration helpers (the driver-side analogs of the
  * reference's Airflow-level operations).
  */
object CatalogOps {

  /** ShortCircuitOperator + check_blob_exists
    * (qalert_monthly_backfill_airflow.py:63-68, airflow_utils.py:
    * 244-247): gate a pipeline stage on input presence.
    */
  def inputPresent(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && (fs.getFileStatus(p).isFile || fs.listStatus(p).nonEmpty)
  }

  /** delete_table_group (transform_enrich_requests.py:71-85): the
    * FORMAT + EXECUTE IMMEDIATE dynamic DROP loop becomes a driver-side
    * catalog iteration. Returns the dropped table names.
    */
  def dropTablesMatching(spark: SparkSession, namePrefix: String): Seq[String] = {
    // listTables includes session temp VIEWS; DROP TABLE on one throws
    // (WRONG_COMMAND_FOR_OBJECT_TYPE) mid-loop — only real tables match
    // the reference's dataset-scoped drop anyway
    val victims = spark.catalog.listTables().collect()
      .filterNot(_.isTemporary)
      .map(_.name).filter(_.startsWith(namePrefix)).toSeq
    victims.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    victims
  }

  /** build_split_table_query (airflow_utils.py:130-160): manual N-way
    * time-range sharding to bound per-query size. Spark partitions
    * natively, so this is `repartitionByRange` — kept as the explicit
    * analog for when a downstream sink needs bounded files.
    */
  def splitByTimeRange(df: org.apache.spark.sql.DataFrame, timeCol: String,
                       shards: Int): org.apache.spark.sql.DataFrame =
    df.repartitionByRange(shards, org.apache.spark.sql.functions.col(timeCol))

  /** Bulk per-table CSV export of a whole dataset (the reference's
    * shell loop over `bq ls` + `bq extract`,
    * export_timebound_geo_tables_wprdc.sh:6-13): iterate the catalog,
    * export each matching table. Returns the exported table names.
    */
  def exportAllTables(spark: SparkSession, namePrefix: String, outDir: String): Seq[String] = {
    val tables = spark.catalog.listTables().collect()
      .filterNot(_.isTemporary) // bq ls lists dataset tables, not session views
      .map(_.name).filter(_.startsWith(namePrefix)).toSeq
    tables.foreach { t =>
      graft.sources.Sinks.writeCsv(spark.table(t), s"$outDir/$t")
    }
    tables
  }

  /** Schema-on-read autodetect (qalert_airflow.py:104 autodetect=True /
    * gen_schema_from_df gcs_utils.py:378-400): infer a StructType from
    * sample data.
    */
  def inferSchema(spark: SparkSession, jsonPath: String): org.apache.spark.sql.types.StructType =
    spark.read.json(jsonPath).schema
}
