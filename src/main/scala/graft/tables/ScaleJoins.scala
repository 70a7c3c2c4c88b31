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

  /** Point-in-interval join WITHOUT a cross product — the 1-D sibling
    * of the geo grid join (`Geo.gridRevGeoZone`): every interval
    * explodes to the integer buckets it covers (`bucketWidth` units
    * each), every point keys on its single bucket, and the equi-join
    * on the bucket is refined by the exact half-open predicate
    * `start <= p < end`. A point has exactly ONE bucket, so each
    * qualifying (point, interval) pair emerges exactly once — no
    * post-join dedup.
    *
    * Columns are LONGs in any unit (epoch micros, day numbers …);
    * callers convert dates up front. Intervals with NULL or empty
    * ranges (`end <= start`) and NULL points drop out. Pick
    * `bucketWidth` near the typical interval length: an interval
    * emits `len/bucketWidth + 1` rows (its replication factor), while
    * a too-wide bucket makes the equi-join coarser (more refine-side
    * discards). Both sides hash-partition on the bucket — interval
    * count and point count move shuffle volume, but nothing
    * serializes through one task unless the DATA concentrates in one
    * bucket (then: smaller buckets).
    *
    * Column names must be disjoint across the two frames (checked).
    */
  def pointInIntervalJoin(points: DataFrame, pointCol: String,
                          intervals: DataFrame, startCol: String,
                          endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(
        expr(s"`$startCol` div ${bucketWidth}L"),
        expr(s"(`$endCol` - 1) div ${bucketWidth}L"))))
    val pt = points.filter(col(pointCol).isNotNull)
      .withColumn("__b", expr(s"`$pointCol` div ${bucketWidth}L"))
    pt.join(iv, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }
}
