package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when (a) the join degenerates to a few
  * straggler tasks inside an exchange AQE will not re-split (e.g. a
  * shuffled hash join), or (b) one probe-side key holds a double-digit
  * percentage of all rows — the classic hot-key shape of 100 TB fact
  * tables (null-ish defaults, "unknown" codes, megacity geographies).
  * Salting pre-splits the hot key N ways at plan time instead.
  */
object SkewOps {

  /** Equi-join `skewed ⋈ dim` on `keys`, with the skewed side salted
    * `saltFactor` ways and the (smaller) `dim` side replicated once per
    * salt — every hot key's rows spread across `saltFactor` shuffle
    * partitions instead of one straggler task. Result is exactly the
    * plain join (the salt column is internal and dropped).
    *
    * The salt is DETERMINISTIC — `xxhash64` of the skewed row's
    * columns — so repeated runs produce identical task placement (no
    * `rand()`: nondeterministic expressions break retry semantics and
    * plan caching). Distinct rows of a hot key spread uniformly;
    * byte-identical duplicate rows co-locate, which is harmless (they
    * carry identical join results).
    *
    * Supported joinTypes: inner, left / left_outer, left_semi,
    * left_anti — the shapes where the dim side is replicated exactly
    * once per salt and row multiplicity is preserved. (right/full
    * would multiply unmatched dim rows per salt; rejected.)
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports $ok, got $joinType")
    // hash expressions reject MapType (anywhere in the tree): salt
    // from the hashable columns only — the salt just needs per-row
    // spread, not full row identity; keys are always hashable
    val hashCols = hashableColumns(skewed)
    val saltSrc  = if (hashCols.isEmpty) keys.map(col) else hashCols
    val saltExpr: Column = pmod(
      xxhash64(saltSrc: _*), lit(saltFactor)).cast("int")
    val s = skewed.withColumn("__salt", saltExpr)
    val d = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    s.join(d, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Columns whose type xxhash64 accepts (MapType anywhere in the
    * tree is rejected by hash expressions) — shared by every salted
    * shuffle in the engine.
    */
  /** Skew DIAGNOSTIC: the log2 histogram of per-key row counts — the
    * number that tells you whether a join/aggregation key needs
    * salting BEFORE the 100 TB run melts a task (pair with
    * [[saltedJoin]]). One row per occupied power-of-two bucket:
    * (bucket = ⌊log2(rows_for_key)⌋, n_keys, n_rows). The bucket is
    * computed as `length(bin(n)) − 1` — pure INTEGER arithmetic on
    * the binary string, so the boundary is engine-exact (a float
    * log2 could round 2^k−ulp either way). NULL keys count as a key.
    *
    * Scale shape: one map-side-combined count per key, then a
    * #keys-bounded aggregation onto ≤ 64 bucket rows.
    */
  def keyHistogram(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .withColumn("bucket", (length(bin(col("__n"))) - 1).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum("__n").as("n_rows"))

  def hashableColumns(df: DataFrame): Seq[Column] = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case st: org.apache.spark.sql.types.StructType => st.fields.forall(f => hashable(f.dataType))
      case at: org.apache.spark.sql.types.ArrayType => hashable(at.elementType)
      case _ => true
    }
    df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
  }
}
