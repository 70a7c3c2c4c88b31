package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape utilities for the 100 TB paths (SCALE.md): the
  * bucketed-master merge pattern. (Skew salting lives in
  * `operators.SkewOps.saltedJoin` — an earlier variant here salted on
  * `monotonically_increasing_id()`, which is not stable across task
  * retries; the consolidated form hashes row content instead and
  * validates the join type.)
  */
object ScaleJoins {

  /** Merge an incoming batch into a BUCKETED master table: when the
    * master was written with `Sinks.writeBucketedMaster` (bucketed +
    * sorted by the merge key), the sort-merge join reads the master
    * with NO exchange and NO sort on its side — only the (small)
    * incoming batch shuffles. This is the steady-state shape for the
    * reference's hourly `incoming_* → all_*` merges.
    *
    * Writes the merged snapshot back bucketed, to a new table name
    * (Spark cannot overwrite the table being read); callers alternate
    * A/B table names between runs.
    */
  def mergeIntoBucketedMaster(
      spark: org.apache.spark.sql.SparkSession,
      masterTable: String, outTable: String,
      incoming: DataFrame, key: String, buckets: Int = 64): Unit = {
    val master = spark.table(masterTable)
    val merged = MasterTables.deleteOldInsertNew(master, incoming, Seq(key))
    graft.sources.Sinks.writeBucketedMaster(merged, outTable, key, buckets)
  }
}
