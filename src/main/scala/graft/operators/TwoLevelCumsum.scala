package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Shared scaffold for global running totals WITHOUT a single-partition
  * window — the pattern behind token budgeting, sequence packing, and
  * the global surrogate id: rows bucket on a monotone integer prefix of
  * the global order, per-bucket totals roll into cumulative offsets
  * over the TINY bucket table (the only unpartitioned window, #buckets
  * rows), and the offsets broadcast back so each row's global value is
  * its bucket offset plus a within-bucket windowed sum. Wall-clock is
  * bounded by the hottest bucket, never the whole table.
  *
  * Bucket expressions should use integer `div` (full 64-bit precision;
  * a double `floor(x / w)` rounds past the 2^53 mantissa limit) —
  * truncating division is monotone non-decreasing, which is all
  * bucketing needs.
  */
object TwoLevelCumsum {

  /** Attach `__b` (bucket) and `__off` (sum of `weight` over all
    * earlier buckets) to `df`, and return the within-bucket running
    * window ordered by `orderCols`. The caller computes its global
    * running value as `col("__off") + sum(<weight col>).over(window)`
    * and drops `__b`/`__off` when done.
    */
  def withOffsets(df: DataFrame, bucket: Column, weight: Column,
                  orderCols: Seq[Column]): (DataFrame, WindowSpec) =
    withGroupedOffsets(df, Seq.empty, bucket, weight, orderCols)

  /** The grouped form: an INDEPENDENT running total per distinct value
    * of `groupCols` (per-language token budgets, per-source packing),
    * still without any corpus-sized window partition. Each offset is
    * now "sum of `weight` over earlier buckets OF THE SAME GROUP": the
    * per-(group, bucket) totals table gets its cumulative offsets from
    * a window partitioned by group over that tiny aggregate (#groups ×
    * #buckets rows, each group's bucket list in one partition), and
    * the data-side window partitions by (group, bucket) — so a group
    * holding 90% of a 100 TB corpus still fans out across all of its
    * id-buckets instead of serializing through one task (the r7
    * hot-partition finding on tokenBudgetByGroup).
    *
    * NULL group values are legal and form their own group, and a NULL
    * bucket (a NULL order key, e.g. a NULL document id) is legal and
    * forms its own FIRST bucket (matching SQL's default NULLS FIRST
    * ordering): the offset join is built with null-safe equality
    * (`<=>`) on the bucket AND the group columns — a plain equi-join
    * would silently drop every NULL-keyed row at the inner join
    * (review r8: the bucket key originally used `===` and NULL-id
    * rows vanished from the grouped token budget).
    */
  def withGroupedOffsets(df: DataFrame, groupCols: Seq[String], bucket: Column,
                         weight: Column, orderCols: Seq[Column]): (DataFrame, WindowSpec) = {
    val withB = df.withColumn("__b", bucket).withColumn("__w", weight)
    val offWin = (if (groupCols.isEmpty) Window.orderBy("__b")
                  else Window.partitionBy(groupCols.map(col): _*).orderBy("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(("__b" +: groupCols).map(col): _*)
      .agg(sum("__w").as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(offWin), lit(0L)))
    // the offset side's join keys are renamed so the join condition can
    // name both sides without exprId ambiguity (offsets derives from
    // withB), then dropped after the join
    val offFlat = offsets.select(
      (col("__b").as("__ob") +:
        groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__g$i") }) :+
        col("__off"): _*)
    val cond = ((col("__b") <=> col("__ob")) +:
      groupCols.zipWithIndex.map { case (g, i) => col(g) <=> col(s"__g$i") })
      .reduce(_ && _)
    val joined = withB.join(broadcast(offFlat), cond)
      .drop("__ob" +: groupCols.indices.map(i => s"__g$i"): _*)
    val wi = Window.partitionBy((groupCols :+ "__b").map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (joined, wi)
  }
}
