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
}
