package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: edit-distance join WITHOUT a cross product — the
  * entity-resolution primitive behind the reference's crosswalk /
  * address-normalization family when the keys don't match exactly
  * (typos, OCR noise, transcription variants).
  *
  * Blocking is the SymSpell deletion neighborhood (Garbe's symmetric
  * delete algorithm, the public-knowledge spell-join trick): each side
  * emits its string plus every single-character deletion, and two
  * strings within Levenshtein distance 1 are GUARANTEED to share a
  * neighborhood key (either equal, or one IS a deletion of the other,
  * or both delete to the same string on a substitution) — so the
  * equi-join on the key is COMPLETE, and the exact `levenshtein`
  * verify keeps precision. No distance-≤1 pair can be missed, unlike
  * heuristic first-letter/length blocking.
  *
  * Scale shape: each row explodes to len+1 keys (map-side), the join
  * is a plain hash equi-join on the key, duplicate key collisions of
  * the same pair collapse with one distinct on the (id, id) pair
  * BEFORE the verify fetch, and the verify computes levenshtein on
  * candidate pairs only. Skew note: a deletion key shared by many
  * strings ("smith"-family clusters) is data skew on the join key —
  * AQE's skew-join split applies, and the verify bound keeps the
  * output honest regardless.
  */
object FuzzyJoin {

  /** All single-character deletions of `s`, plus `s` itself —
    * pure expressions, no UDF.
    */
  private def delNeighborhood(s: Column): Column =
    // sequence(1, 0) would generate DESCENDING [1, 0] — guard the
    // empty string explicitly
    when(length(s) === 0, array(s)).otherwise(
      array_union(array(s),
        array_distinct(transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))))

  /** Join rows of `left` and `right` whose string keys are within
    * Levenshtein distance 1 (equality included, reported distance 0).
    * Column sets must be disjoint; emits every column of both sides
    * plus `edit_distance`. Row MULTIPLICITY is preserved: candidate
    * dedup happens on the DISTINCT VALUE pairs (several shared
    * deletion keys per true pair), never on full rows — duplicate
    * input rows each produce their own linkage row, and non-set-safe
    * column types (maps) pass through untouched.
    */
  def editDistanceJoin(left: DataFrame, leftCol: String,
                       right: DataFrame, rightCol: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    val lv = left.select(col(leftCol).as("__lv")).filter(col("__lv").isNotNull)
      .distinct().withColumn("__k", explode(delNeighborhood(col("__lv"))))
    val rv = right.select(col(rightCol).as("__rv")).filter(col("__rv").isNotNull)
      .distinct().withColumn("__k", explode(delNeighborhood(col("__rv"))))
    val cand = lv.join(rv, "__k")
      .select("__lv", "__rv").distinct()
      .withColumn("edit_distance", levenshtein(col("__lv"), col("__rv")))
      .filter(col("edit_distance") <= 1)
    left.join(cand, col(leftCol) === col("__lv"))
      .join(right, col(rightCol) === col("__rv"))
      .drop("__lv", "__rv")
  }
}
