package graft.operators

import graft.expressions.TopKAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable sketches for approximate analytics at 100 TB. The KMV
  * (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream") is chosen over
  * HLL because its state — the k lexicographically-smallest hashes —
  * is a pure deterministic function of the input SET, so the estimate
  * is bit-identical across engines, partitionings, and retries
  * (HLL register layouts are implementation-defined; Spark's and
  * DuckDB's approx_count_distinct answers differ by construction).
  */
object SketchOps {

  /** Hex prefix length used for the numeric view of a hash: 13 hex
    * chars = 52 bits, exact in a Double (< 2^53) AND roomy in a Long
    * ((k−1)·2^52 stays under 2^63 for k ≤ 2048).
    */
  private val PrefixHex = 13
  private val PrefixBits = 4 * PrefixHex // 52

  /** Per-group approximate distinct count of `valueCol` via a KMV
    * sketch of size k. Estimator: with v_k = the k-th smallest hash
    * mapped to [0, 2^52), distinct ≈ (k−1) · 2^52 / v_k — integer
    * division, so the reported estimate is engine-exact. Groups with
    * fewer than k distinct hashes report their exact count (the
    * sketch IS the value set there). `exact_distinct` rides along for
    * error inspection; callers at 100 TB drop that column (it is the
    * expensive thing the sketch replaces).
    *
    * Scale shape: the (group, hash) dedup partial-aggregates map-side
    * (duplicate values collapse per partition before the shuffle);
    * the k-minimum selection is the bounded-heap TopKAgg — ≤ k rows
    * per group cross the final exchange, never a per-group window
    * sort. Hash order is the FULL 32-hex-char md5 string in UTF-8
    * byte order (ties in the 52-bit numeric prefix break on the full
    * hash), the ordering both Spark's sort and DuckDB's ORDER BY give
    * fixed-width lowercase hex.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64, includeExact: Boolean = true): DataFrame = {
    require(k >= 2 && k <= 2048, s"kmvDistinct needs 2 <= k <= 2048, got $k")
    // NULL values are excluded BEFORE hashing: md5(NULL) is NULL and
    // would crash the bounded-heap encoder (non-nullable score field),
    // and count_distinct in the exact branch excludes NULL anyway —
    // filtering keeps the two branches counting the same set
    val hashed = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        md5(col(valueCol).cast(StringType)).as("__h"))
      .distinct()
    // 52-bit numeric prefix — exact as a Double, so TopKAgg's score
    // ordering equals numeric-prefix order; id tie-break = full hash
    val v = conv(substring(col("__h"), 1, PrefixHex), 16, 10).cast(LongType)
    val mins = hashed
      .groupBy("__g")
      .agg(TopKAgg.topKFor(StringType, k)(col("__h"), -v.cast(DoubleType))
        .as("__mins"))
      .withColumn("n_hashes", size(col("__mins")).cast(LongType))
      .withColumn("kth_hash",
        when(col("n_hashes") === k, element_at(col("__mins"), k).getField("id")))
      .withColumn("__vk",
        greatest(conv(substring(col("kth_hash"), 1, PrefixHex), 16, 10)
          .cast(LongType), lit(1L)))
      .withColumn("est_distinct",
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(s"${(k - 1).toLong << PrefixBits}L div __vk")))
    // the exact branch exists for error INSPECTION — at 100 TB it is
    // the expensive thing the sketch replaces, and merely dropping the
    // column downstream cannot prune the aggregate out of the plan, so
    // callers must opt out here
    if (includeExact) {
      val exact = df
        .groupBy(col(groupCol).as("__g"))
        .agg(count_distinct(col(valueCol)).as("exact_distinct"))
      mins.join(exact, "__g")
        .select(col("__g").as(groupCol), col("n_hashes"), col("kth_hash"),
          col("est_distinct"), col("exact_distinct"))
    } else
      mins.select(col("__g").as(groupCol), col("n_hashes"), col("kth_hash"),
        col("est_distinct"))
  }

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005, "An
    * improved data stream summary: the count-min sketch and its
    * applications"): `depth` independent hash rows of `width` counters
    * each; an item's estimate is the MIN of its counters — an
    * overestimate by at most εN with probability 1−δ (ε = e/width,
    * δ = e^−depth). Like KMV, the state is a pure deterministic
    * function of the input MULTISET: rows are md5 of "row:value"
    * (the engine-portable q48 formula), counters are exact integer
    * counts, merges are counter sums — so the sketch and every
    * estimate reproduce bit-identically across engines, partitions,
    * and retries.
    *
    * [[countMinBuild]] returns the counter table — ≤ depth × width
    * rows however large the input (one map-side-combined aggregation,
    * THE mergeable 100 TB state). [[countMinEstimate]] answers point
    * queries with one broadcast-sized join + a min-aggregate.
    */
  def countMinBuild(df: DataFrame, valueCol: String,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 16, s"width too small: $width")
    // ONE scan: each input row explodes to its depth sketch rows (the
    // earlier union-of-projections form re-read the source per depth —
    // 4× I/O at the scale the sketch exists for); the hashed string is
    // unchanged ("r:value"), so existing sketches/oracles agree
    df.select(explode(expr(s"sequence(0, ${depth - 1})")).as("sketch_row"),
        col(valueCol).cast(StringType).as("__v"))
      .select(col("sketch_row"),
        (conv(substring(md5(concat(col("sketch_row").cast(StringType),
          lit(":"), col("__v"))), 1, 8), 16, 10).cast(LongType) % width)
          .as("bucket"))
      .groupBy("sketch_row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query `queries`' `valueCol` against a [[countMinBuild]]
    * counter table: (value, est) where est = min over the depth rows
    * of the value's counter (0 when a counter row is absent — the
    * bucket was never touched). `depth`/`width` must match the build.
    */
  def countMinEstimate(counters: DataFrame, queries: DataFrame,
                       valueCol: String, depth: Int = 4,
                       width: Int = 1024): DataFrame = {
    val probes = (0 until depth).map { r =>
      queries.select(col(valueCol),
        lit(r).as("sketch_row"),
        (conv(substring(md5(concat(lit(s"$r:"), col(valueCol).cast(StringType))),
          1, 8), 16, 10).cast(LongType) % width).as("bucket"))
    }.reduce(_ unionByName _)
    probes.join(counters, Seq("sketch_row", "bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
