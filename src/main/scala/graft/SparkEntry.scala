package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage surface: one entry per implemented
  * operator family from SURVEY.md §2 (plus the training-data-pipeline
  * extensions). `oracleSql` holds the DuckDB twin for every
  * SQL-expressible query; column names match exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      ExtendedQueries.queries ++ ParityQueries.queries ++
      UdfParityQueries.queries ++ PipelineQueries.queries ++
      FeedQueries.queries ++ MasterUpkeepQueries.queries ++
      CorpusQueries.queries ++ ProbeQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++
      ExtendedQueries.oracle ++ ParityQueries.oracle ++
      UdfParityQueries.oracle ++ PipelineQueries.oracle ++
      FeedQueries.oracle ++ MasterUpkeepQueries.oracle ++
      CorpusQueries.oracle ++ ProbeQueries.oracle
}
