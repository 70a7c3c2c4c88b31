package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk reporting over quasi-identifier
  * combinations — the governance complement of the PII redaction /
  * anonymization family (`RefFunctions.redactPii`,
  * `AnonymizeAddressBlock`): those operators TRANSFORM records, this
  * one MEASURES whether the released shape still identifies people.
  *
  *  - k-anonymity (Sweeney 2002, "k-Anonymity: A Model for Protecting
  *    Privacy"): an equivalence class — the rows sharing one
  *    combination of quasi-identifier values — re-identifies its
  *    members when it holds fewer than k rows.
  *  - l-diversity (Machanavalli et al. 2007): a class that is
  *    k-large can still leak when every member shares the same
  *    SENSITIVE value; the class needs at least l distinct sensitive
  *    values.
  *
  * Scale shape: one (quasi..., sensitive) cell count with map-side
  * combine, then a second aggregation to class level — the q07
  * two-level discipline, so no Expand and no distinct aggregate; the
  * output is class-sized (the cross product of observed quasi values),
  * never row-sized. NULL is a class value (a NULL quasi column defines
  * its own equivalence class — releases carry NULLs too) and a
  * sensitive value (distinct-including-NULL, counted by the cell
  * rows).
  */
object PrivacyOps {

  /** Per-equivalence-class risk report: the quasi columns, `n_rows`
    * (class size), `n_sensitive_values` (distinct sensitive values in
    * the class, NULL counted as a value), `k_risk` (class smaller
    * than k), `l_risk` (fewer than l distinct sensitive values).
    */
  def privacyRisk(df: DataFrame, quasiCols: Seq[String],
                  sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be >= 1: k=$k l=$l")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    val cells = df
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    cells
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__n").as("n_rows"),
        count(lit(1)).as("n_sensitive_values"))
      .withColumn("k_risk", col("n_rows") < k)
      .withColumn("l_risk", col("n_sensitive_values") < l)
  }
}
