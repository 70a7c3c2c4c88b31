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
                  orderCols: Seq[Column]): (DataFrame, WindowSpec) = {
    val withB = df.withColumn("__b", bucket).withColumn("__w", weight)
    val wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy("__b").agg(sum("__w").as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(wb), lit(0L)))
      .select("__b", "__off")
    val wi = Window.partitionBy("__b").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (withB.join(broadcast(offsets), Seq("__b")), wi)
  }
}
