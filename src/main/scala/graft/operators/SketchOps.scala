package graft.operators

import graft.expressions.TopKAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** KMV sketch ALGEBRA (Beyer et al. 2007, "On synopses for
    * distinct-value estimation under multiset operations"): from one
    * k-minimum-values sketch per side, estimate |A|, |B|, |A∪B|, the
    * Jaccard similarity, and |A∩B| — WITHOUT touching the raw sets
    * again. The union sketch is exact sketch algebra (the k smallest
    * of A∪B are among the union of the two k-min sets); Jaccard is the
    * fraction of the union's k-mins present in BOTH side sketches;
    * the intersection estimate is `shared · est(A∪B) div |U|` — all
    * integer arithmetic over the md5 hash order, so every output is a
    * pure deterministic function of the two value SETS (the q111
    * portability contract).
    *
    * Scale shape: each side is one distinct-then-bounded-heap pass
    * (≤ k rows reach the driver side of the final agg); the algebra
    * runs on two 1-row frames. Sides with < k distinct values report
    * exact counts (their sketch IS the set). The 100 TB read: sketch
    * once per source/partition, answer every pairwise overlap question
    * from the stored sketches.
    */
  def kmvSetOps(dfA: DataFrame, dfB: DataFrame, valueCol: String,
                k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 2048, s"kmvSetOps needs 2 <= k <= 2048, got $k")
    def kmins(df: DataFrame, outCol: String): DataFrame = {
      val hashed = df.filter(col(valueCol).isNotNull)
        .select(md5(col(valueCol).cast(StringType)).as("__h")).distinct()
      val v = conv(substring(col("__h"), 1, PrefixHex), 16, 10).cast(LongType)
      hashed
        .agg(TopKAgg.topKFor(StringType, k)(col("__h"), -v.cast(DoubleType))
          .as("__m"))
        // ranked best-first = ascending hash order already; keep ids only
        .select(transform(col("__m"), s => s.getField("id")).as(outCol))
    }
    def est(arr: String, prefix: String): Column =
      when(size(col(arr)) < k, size(col(arr)).cast(LongType))
        .otherwise(expr(s"${(k - 1).toLong << PrefixBits}L div $prefix"))
    // try_element_at: a side below k has no kth hash — NULL here, and
    // the est() CASE never reads the prefix on that branch (ANSI
    // element_at would error on the short array regardless)
    def kthPrefix(arr: String): Column =
      greatest(
        conv(substring(try_element_at(col(arr), lit(k)), 1, PrefixHex), 16, 10)
          .cast(LongType), lit(1L))
    kmins(dfA, "__ha").crossJoin(kmins(dfB, "__hb"))
      .withColumn("__hu",
        slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k))
      .withColumn("__va", kthPrefix("__ha"))
      .withColumn("__vb", kthPrefix("__hb"))
      .withColumn("__vu", kthPrefix("__hu"))
      .withColumn("n_a_hashes", size(col("__ha")).cast(LongType))
      .withColumn("n_b_hashes", size(col("__hb")).cast(LongType))
      .withColumn("union_size", size(col("__hu")).cast(LongType))
      .withColumn("est_a", est("__ha", "__va"))
      .withColumn("est_b", est("__hb", "__vb"))
      .withColumn("union_est", est("__hu", "__vu"))
      .withColumn("shared_mins",
        size(filter(col("__hu"), h =>
          array_contains(col("__ha"), h) && array_contains(col("__hb"), h)))
          .cast(LongType))
      .withColumn("jaccard_est",
        when(col("union_size") > 0,
          round(col("shared_mins").cast("double")
            / col("union_size").cast("double"), 6)))
      .withColumn("intersect_est",
        when(col("union_size") > 0,
          expr("(shared_mins * union_est) div union_size")))
      .select("n_a_hashes", "n_b_hashes", "est_a", "est_b", "union_size",
        "union_est", "shared_mins", "jaccard_est", "intersect_est")
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

  /** AMS "tug-of-war" second-frequency-moment sketch (Alon, Matias,
    * Szegedy 1996): F2 = Σ_v f_v² — the self-join size / repeat-rate
    * statistic — estimated from `depth` independent ±1 sign
    * estimators. Estimator r assigns every value a deterministic sign
    * from an md5 parity bit of "r:value", folds X_r = Σ_rows sign(v)
    * (ONE map-side-combined sum per estimator — constant state like
    * [[countMinBuild]]), and estimates F2 as X_r²; the report returns
    * each estimator row plus their MEDIAN (depth odd, so the median
    * is an exact member value, no interpolation) next to the exact
    * F2 and the signed relative error.
    *
    * Like every sketch behind this oracle gate, the state is a pure
    * deterministic function of the input multiset — bit-identical
    * across engines, partitionings, and retries. All moments are
    * exact Decimal(38,0) integers with BIGINT outputs (envelope:
    * |X| ≤ N and F2 ≤ N² need N ≲ 3·10⁹ per scope — the q151/ADVICE
    * overflow discipline); the only IEEE op is the closing relative
    * error division.
    *
    * `exact_f2` rides along for error inspection (the kmvDistinct
    * opt-out contract): at 100 TB the exact side is itself one
    * hash-shuffle on the value, or is simply dropped.
    */
  def amsF2(df: DataFrame, valueCol: String, depth: Int = 5): DataFrame = {
    require(depth >= 1 && depth % 2 == 1, "depth must be odd (exact median)")
    val dec = DecimalType(38, 0)
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(StringType).as("__v"))
    val signed = vals
      .select(explode(expr(s"sequence(0, ${depth - 1})")).as("sketch_row"),
        col("__v"))
      .withColumn("__sign",
        when(conv(substring(md5(concat(col("sketch_row").cast(StringType),
          lit(":"), col("__v"))), 1, 8), 16, 10).cast(LongType) % 2 === 1,
          lit(1L)).otherwise(lit(-1L)))
    val x = signed.groupBy("sketch_row")
      .agg(sum(col("__sign")).as("x"))
      .withColumn("est", (col("x").cast(dec) * col("x").cast(dec))
        .cast(LongType))
    val med = x.agg(expr(
      "CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(est AS DOUBLE)) AS BIGINT)")
      .as("median_est"))
    val exact = vals.groupBy("__v").agg(count(lit(1)).as("__f"))
      .agg(sum(col("__f").cast(dec) * col("__f").cast(dec)).cast(LongType)
        .as("exact_f2"))
    x.crossJoin(broadcast(med)).crossJoin(broadcast(exact))
      .withColumn("rel_err", round(
        (col("median_est") - col("exact_f2")).cast("double") /
          col("exact_f2").cast("double"), 6))
      .select(col("sketch_row"), col("x"), col("est"),
        col("median_est"), col("exact_f2"), col("rel_err"))
  }

  /** HDR-histogram-style deterministic quantile sketch (the
    * log-linear bucketing popularized by Gil Tene's HdrHistogram):
    * non-negative long values map to a bucket index that is EXACT
    * below 2^p and keeps the top p significand bits above it, so the
    * relative quantile error is bounded by 2^(1−p) while the state is
    * ≤ ~64·2^p counter rows whatever the input. Like KMV and
    * Count-Min, the sketch is a pure deterministic function of the
    * input MULTISET — counters merge by sum, and build/estimate
    * reproduce bit-identically across engines, partitionings, and
    * retries (t-digest/GK sketches are merge-order-dependent, which
    * is why they cannot sit behind this engine's oracle gate).
    *
    * Index (v ≥ 0, e = bitlen(v)−1):
    *   v < 2^p          → v                         (exact region)
    *   otherwise        → (e−p+1)·2^p + (v div 2^(e−p) − 2^p)
    * The index is monotone in v, so bucket order IS value order and a
    * cumulative count walk answers rank queries. All arithmetic is
    * integer (binary string length, integer division by an exact
    * power of two) — the q151 discipline.
    *
    * Scale shape: ONE map-side-combined (group, bucket) aggregation;
    * the shuffle carries ≤ #groups·64·2^p counter rows. NULL and
    * negative values are excluded (a latency/size histogram has
    * neither; callers offset signed domains first).
    */
  def hdrBuild(df: DataFrame, groupCol: String, valueCol: String,
               p: Int = 5): DataFrame = {
    require(p >= 1 && p <= 12, s"hdrBuild needs 1 <= p <= 12, got $p")
    val twoP = 1L << p
    val base = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(col(groupCol).as("__g"), col(valueCol).cast(LongType).as("__v"))
      .withColumn("__e", (length(bin(col("__v"))) - 1).cast(LongType))
      .withColumn("__p2",
        pow(lit(2.0), (col("__e") - p).cast(DoubleType)).cast(LongType))
    base
      .withColumn("bucket",
        when(col("__v") < twoP, col("__v"))
          .otherwise((col("__e") - p + 1) * twoP +
            (expr("__v div __p2") - twoP)))
      .groupBy(col("__g").as(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Lower bound of a bucket's value range — the deterministic value
    * every rank inside the bucket reports. Inverse of the index map.
    */
  def hdrBucketLo(bucket: Column, p: Int): Column = {
    val twoP = 1L << p
    val block = bucket.cast(LongType).divide(lit(twoP)).cast(LongType)
    val off = pmod(bucket.cast(LongType), lit(twoP))
    // e = block + p − 1; lo = (2^p + off) · 2^(e−p)
    when(bucket < twoP, bucket.cast(LongType))
      .otherwise((lit(twoP) + off) *
        pow(lit(2.0), (block - 1).cast(DoubleType)).cast(LongType))
  }

  /** Answer quantiles from a [[hdrBuild]] counter table: for each
    * group and each q, the lower bound of the bucket holding rank
    * ceil(q·N) (1-based; q in (0, 1]) — the conservative
    * "at least ceil(q·N) observations are ≤ this bucket" convention.
    * The rank product q·N is evaluated in DOUBLE with a fixed
    * operation order (the q93 contract; oracles must cast their q
    * literals to DOUBLE — DuckDB parses bare decimals as DECIMAL and
    * would round differently at exact-integer boundaries).
    *
    * The per-group cumulative walk is a window over the COUNTER rows
    * — bounded at ~64·2^p by construction, never data-sized, so the
    * per-group partition is safe at any corpus scale.
    */
  def hdrQuantiles(sketch: DataFrame, groupCol: String,
                   qs: Seq[Double], p: Int = 5): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "q in (0, 1]")
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(groupCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(groupCol)
    val cum = sketch
      .withColumn("__cum", sum("cnt").over(w))
      .withColumn("__n", sum("cnt").over(wn))
    val qDf = broadcast(qs.toDF("q"))
    cum.crossJoin(qDf)
      .filter(col("__cum") >= ceil(col("q") * col("__n").cast(DoubleType)))
      .groupBy(col(groupCol), col("q"))
      .agg(min("bucket").as("__b"))
      .select(col(groupCol), col("q"),
        hdrBucketLo(col("__b"), p).as("est_lo"))
  }

  /** Per-group HyperLogLog distinct estimate (Flajolet 2007) with
    * ENGINE-PORTABLE registers — the objection in this file's header
    * applies to the built-in approx_count_distinct sketches, whose
    * register layouts are implementation-defined; this operator
    * derives its own 64 registers from md5, so the estimate is a pure
    * deterministic function of the value SET, like KMV, while keeping
    * HLL's O(m) state against KMV's O(k·hash) (64 bytes vs ~2 KB —
    * the difference that matters when sketching millions of groups).
    *
    * Register construction: bucket = u32(hex 1-8) mod 64; rank ρ =
    * position of the first 1-bit of u32(hex 9-16) in a 32-char
    * zero-padded binary string (instr(lpad(bin(w), 32, '0'), '1'),
    * 33 for w = 0) — string ops both engines define identically.
    * Estimate: α·m²/Σ2^(−M_j) with the harmonic sum held EXACT as the
    * integer Σ2^(33−M_j) (absent buckets contribute 2^33); the small-
    * range linear-counting correction m·ln(m/V) applies below 2.5m
    * when empty registers exist. One closing double expression,
    * rounded 4.
    *
    * Scale shape: the (group, bucket) register max partial-aggregates
    * map-side — at most 64 rows per group cross the exchange however
    * many raw rows a group has; everything after is #groups-sized.
    * `exact_distinct` rides along for error inspection (same opt-out
    * contract as [[kmvDistinct]]).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  includeExact: Boolean = true): DataFrame = {
    val regs = hllRegisters(df, Seq(col(groupCol).as("__g")), valueCol)
    val est = hllEstimate(regs, Seq("__g"))
    if (includeExact) {
      val exact = df
        .groupBy(col(groupCol).as("__g"))
        .agg(count_distinct(col(valueCol)).as("exact_distinct"))
      est.join(exact, "__g")
        .select(col("__g").as(groupCol), col("__nb").as("n_buckets_hit"),
          col("est_distinct"), col("exact_distinct"))
    } else
      est.select(col("__g").as(groupCol), col("__nb").as("n_buckets_hit"),
        col("est_distinct"))
  }

  /** md5-derived HLL registers keyed by `keys`: one (keys..., __bkt,
    * __M) row per non-empty register — the mergeable state shared by
    * [[hllDistinct]] and [[hllRollup]].
    */
  private[graft] def hllRegisters(df: DataFrame, keys: Seq[Column],
                           valueCol: String): DataFrame = {
    val m = 64
    val hashed = df
      .filter(col(valueCol).isNotNull)
      .select(keys :+ md5(col(valueCol).cast(StringType)).as("__h"): _*)
    val rho = {
      val i = instr(lpad(bin(conv(substring(col("__h"), 9, 8), 16, 10)
        .cast(LongType)), 32, "0"), "1")
      when(i === 0, lit(33)).otherwise(i)
    }
    val keyNames = hashed.columns.dropRight(1)
    hashed
      .withColumn("__bkt",
        (conv(substring(col("__h"), 1, 8), 16, 10).cast(LongType) % m))
      .withColumn("__rho", rho)
      .groupBy((keyNames :+ "__bkt").map(col): _*)
      .agg(max("__rho").as("__M"))
  }

  /** The HLL estimator over a register frame: harmonic mean held as
    * the exact integer Σ2^(33−M) with linear counting below 2.5m —
    * one closing double expression per key, rounded 4.
    */
  private[graft] def hllEstimate(regs: DataFrame, keyNames: Seq[String]): DataFrame = {
    val m = 64
    regs.groupBy(keyNames.map(col): _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 33 - __M)")).as("__sp"),
        count(lit(1)).as("__nb"))
      .withColumn("__S",
        col("__sp") + (lit(m.toLong) - col("__nb")) * lit(1L << 33))
      .withColumn("__V", lit(m.toLong) - col("__nb"))
      .withColumn("__alpha",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)))
      .withColumn("__raw",
        col("__alpha") * lit(m.toDouble) * lit(m.toDouble) *
          lit((1L << 33).toDouble) / col("__S").cast(DoubleType))
      .withColumn("est_distinct", round(
        when(col("__raw") <= lit(2.5 * m) && col("__V") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__V").cast(DoubleType)))
          .otherwise(col("__raw")), 4))
  }

  /** HLL MERGEABILITY rollup — the property that makes register
    * sketches the 100 TB distinct-count answer: per-(group, day)
    * registers merge by plain MAX into exactly the registers the
    * whole group would have produced, so daily sketch state rolls up
    * to any coarser grain with no rescan and no error growth. The
    * report puts the merged estimate next to the exact distinct and
    * the naive Σ(per-day exacts) — the latter double-counts every
    * cross-day repeat, which is WHY per-partition exact counts don't
    * roll up and sketches do.
    *
    * Scale shape: register construction partial-aggregates map-side
    * to ≤ 64 rows per (group, day); the merge shuffles only those
    * register rows; the exact columns ride on two count-distinct
    * aggregations (each a two-level hash agg, no Expand).
    */
  def hllRollup(df: DataFrame, groupCol: String, dayCol: Column,
                valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), dayCol.as("__day"), col(valueCol))
    val daily = hllRegisters(base,
      Seq(col("__g"), col("__day")), valueCol)
    val merged = daily.groupBy("__g", "__bkt").agg(max("__M").as("__M"))
    val est = hllEstimate(merged, Seq("__g"))
    val perDayExact = base.groupBy("__g", "__day")
      .agg(count_distinct(col(valueCol)).as("__dx"))
    val naive = perDayExact.groupBy("__g")
      .agg(count(lit(1)).as("n_days"), sum("__dx").as("sum_daily_exact"))
    val exact = base.groupBy("__g")
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))
    est.join(naive, "__g").join(exact, "__g")
      .select(col("__g").as(groupCol), col("n_days"),
        col("sum_daily_exact"), col("exact_distinct"),
        col("est_distinct").as("est_merged"))
  }
}
