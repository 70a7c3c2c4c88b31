package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape utilities for the 100 TB paths (SCALE.md): skew salting
  * and the bucketed-master merge pattern.
  */
object ScaleJoins {

  /** Salted join for skewed keys: replicate the small side `salt`
    * ways, scatter the big side's hot keys uniformly across the
    * replicas. Use when AQE's skew-join split isn't enough (e.g. one
    * key is >50% of the table). Costs `salt`× the small side — keep
    * the small side genuinely small or pre-filter to the hot keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

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
