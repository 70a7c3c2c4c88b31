package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational dedup vocabulary.
  *
  * The reference deduplicates with `SELECT DISTINCT` (~20 sites, e.g.
  * general_queries.py:145-148) and the keep-latest window
  * `ROW_NUMBER() OVER (PARTITION BY id ORDER BY last_upd DESC)`
  * (general_queries.py:31-43) — the canonical Spark idioms below.
  */
object DedupOps {

  /** dedup_table (general_queries.py:145-148): SELECT DISTINCT *. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** build_dedup_old_updates (general_queries.py:31-43): keep the single
    * latest row per key. `orderCols` are (column, descending) pairs; a
    * deterministic tie-break should always be included by the caller.
    *
    * Scale note: one shuffle on `keys`; Spark plans a partial
    * sort + single window pass, no driver involvement. For 100 TB this
    * is the right shape — the alternative join-to-max scans twice.
    */
  def dedupKeepLatest(df: DataFrame, keys: Seq[String], orderCols: Seq[(String, Boolean)]): DataFrame = {
    val ordering = orderCols.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Beam-side stateful seen-set dedup (ceridian_job_codes_dataflow.py:
    * 24-45) ≡ dropDuplicates on the chosen key subset (first-seen row is
    * arbitrary in both systems).
    */
  def dropDuplicatesOn(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Global sequential surrogate id in `(orderCol, tieBreaks…)` order
    * WITHOUT a single-partition window (the naive
    * `row_number() OVER (ORDER BY …)` moves the whole table to one
    * task — the reference can afford it on municipal-sized tables,
    * 100 TB cannot).
    *
    * Two-level, same shape as the token-budget cumsum: rows bucket on
    * the monotone prefix `floor(orderCol / bucketWidth)` (bucket order
    * = orderCol order, ties stay within one bucket), per-bucket counts
    * roll into cumulative offsets over the TINY bucket table (the only
    * unpartitioned window, #buckets rows), and each row's id is its
    * within-bucket row_number plus the bucket offset. Two shuffles on
    * `__b` + one broadcast; wall-clock bounded by the hottest bucket —
    * pick `bucketWidth` so one bucket's rows fit a task comfortably
    * (e.g. one day of unix seconds for daily-arriving feeds).
    *
    * `orderCol` must be integral (unix time, epoch days, a numeric
    * key). NULL `orderCol` rows sort first (SQL NULLS FIRST) via a
    * dedicated minimum bucket. Output ids are 1-based, dense, LongType.
    *
    * The input is consumed TWICE (bucket-count aggregation + the final
    * join) — callers whose input is an expensive unpersisted lineage
    * should materialize it first (persist/localCheckpoint), as the PLI
    * latest-update feed does.
    */
  def globalSurrogateId(df: DataFrame, orderCol: String, tieBreaks: Seq[String],
                        outCol: String, bucketWidth: Long = 86400L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth: $bucketWidth")
    // integer `div` keeps full 64-bit precision (double division would
    // round past 2^53) and truncating division is monotone
    // non-decreasing, which is all bucketing needs; NULL orderCol rows
    // get a dedicated minimum bucket (SQL NULLS FIRST)
    val bucket = coalesce(
      expr(s"`$orderCol` div ${bucketWidth}L").cast("long"),
      lit(Long.MinValue))
    val (bucketed, wi) = TwoLevelCumsum.withOffsets(
      df, bucket, lit(1L),
      col(orderCol).asc_nulls_first +: tieBreaks.map(col(_).asc))
    // sum-of-ones instead of row_number: same numbering, and a single
    // bucket holding more than 2^31 rows cannot overflow it
    bucketed
      .withColumn(outCol, col("__off") + sum("__w").over(wi))
      .drop("__b", "__w", "__off")
  }
}
