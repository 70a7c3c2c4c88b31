package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY §2.2): schema-validated columnar writes,
  * partitioned managed tables, CSV/ndjson exports, quarantine.
  */
object Sinks {

  /** Schema-validated columnar stage write. The reference validates
    * each stage output against the feed's .avsc before writing Avro;
    * here `conformToSchema` is the validation, and parquet is the
    * DEFAULT stage format per the SURVEY §1.1 design mapping (Avro's
    * role between stages is a schema'd batch hand-off, which parquet
    * serves with columnar pruning as a bonus). When genuine `.avro`
    * container files are required — an external consumer of the
    * reference's drops — use [[AvroSink.writeAvro]], the faithful
    * WriteToAvro: real Avro object-container files via avro-core/
    * avro-mapred (no spark-avro needed), same schema validation.
    */
  def writeStage(df: DataFrame, path: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val out = schema.fold(df)(SchemaRegistry.conformToSchema(df, _))
    out.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Partitioned managed-table write (create_partitioned_bq_table /
    * pandas_utils.py:83-106: DAY or MONTH partitioning on a date
    * column, truncate or append).
    *
    * Small-files control: without a partition-aligned shuffle, EVERY
    * writing task emits a file into every partition directory it holds
    * rows for — tasks × partitions files (at 1000 executors × daily
    * partitions, millions of KB-sized parquet files). The write is
    * preceded by `repartition(__part, salt)` so each partition value
    * gets at most `filesPerPartition` writing tasks → that many files;
    * `maxRecordsPerFile` (> 0) additionally caps rows per file so a
    * hot partition still splits into scannable units.
    *
    * The default (1) serializes each partition's write through one
    * task — right for the reference's feed-sized tables. For large
    * fact tables raise `filesPerPartition` toward the per-partition
    * write parallelism you want; the file-count bound scales with it.
    */
  def writePartitioned(df: DataFrame, path: String, dateCol: String,
                       granularity: String = "month",
                       append: Boolean = false,
                       filesPerPartition: Int = 1,
                       maxRecordsPerFile: Long = 0L): Unit = {
    require(filesPerPartition > 0, s"filesPerPartition: $filesPerPartition")
    val part = granularity match {
      case "day"   => date_format(col(dateCol), "yyyy-MM-dd")
      case "month" => date_format(date_trunc("month", col(dateCol)), "yyyy-MM")
      case g       => throw new IllegalArgumentException(s"granularity $g")
    }
    // salt over hashable columns only (hash expressions reject
    // MapType anywhere in the tree); the salt needs per-row spread,
    // not full row identity
    val saltCols = graft.operators.SkewOps.hashableColumns(df)
    val salt = pmod(xxhash64(saltCols: _*), lit(filesPerPartition))
    df.withColumn(PartCol, part)
      .repartition(col(PartCol), salt)
      .write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(PartCol).parquet(path)
  }

  /** Partition-discovery column written by [[writePartitioned]] — the
    * stored layout carries it; [[readPartitioned]] strips it.
    */
  val PartCol = "__part"

  /** Read a [[writePartitioned]] table back WITHOUT the synthetic
    * partition column (readers of the managed table should see the
    * original schema; filter on `__part` BEFORE this drop when
    * partition-pruning manually).
    */
  def readPartitioned(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(PartCol)

  /** CSV export with header — BQ→GCS export parity
    * (qalert_airflow.py:231-237, general_queries.py:151-162). The
    * reference exports a single file; `singleFile` coalesces (only for
    * export-sized results — never coalesce(1) a big table).
    */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ",",
               singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("delimiter", delimiter)
      .csv(path)
  }

  /** ndjson write (json_to_gcs, gcs_utils.py:570-594). The reference
    * additionally retries the write through its JSON LINTER — needed
    * there because hand-assembled Python strings can be malformed;
    * Spark's JSON writer serializes from typed rows, so every emitted
    * line is well-formed by construction and the lint-retry loop has
    * nothing to catch. Deliberately omitted, not overlooked.
    */
  def writeNdjson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Quarantine sink for malformed payloads (`slag_metal` bucket,
    * gcs_utils.py:209-246): raw lines + load metadata.
    */
  def writeQuarantine(bad: DataFrame, path: String, feedName: String): Unit =
    bad.withColumn("feed", lit(feedName))
      .withColumn("quarantined_at", current_timestamp())
      .write.mode(SaveMode.Append).json(path)

  /** Bucketed master-table write: repeated hourly merges join on the
    * master key every run — bucketing by that key lets the sort-merge
    * join skip the master-side exchange entirely (SCALE.md). Requires
    * a saveAsTable catalog target.
    */
  def writeBucketedMaster(df: DataFrame, table: String, keyCol: String,
                          buckets: Int = 64): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)
}
