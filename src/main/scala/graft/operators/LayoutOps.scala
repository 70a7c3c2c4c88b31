package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curve) —
  * the write-time operator behind min-max zone-map pruning: rows sorted
  * by the interleaved bits of two dimension keys land in files whose
  * per-file [min, max] ranges are TIGHT in BOTH dimensions, so a scan
  * filtered on either dimension (or a rectangle in both) skips most
  * files. A single-dimension sort gives perfect pruning on one column
  * and none on the other; the Z-curve splits the difference — the same
  * layout trade Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's
  * multi-column ORDER BY make.
  *
  * Everything here is exact integer arithmetic: the Morton code is a
  * pure bit permutation of the two keys, and bucket assignment is
  * `((rank − 1) · buckets) div N` on the two-level-cumsum global rank
  * — deterministic across engines, partitionings, and retries, with no
  * single-partition window anywhere (the q33 surrogate-id discipline).
  */
object LayoutOps {

  /** Spread the low 31 bits of `c` to the even bit positions (Morton
    * "part1by1" in its 64-bit form). Precondition: 0 ≤ c < 2³¹ —
    * callers range-check or rank-encode wider domains first.
    */
  private def spread(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = (d.bitwiseOR(shiftleft(d, 2))).bitwiseAND(lit(0x3333333333333333L))
    (e.bitwiseOR(shiftleft(e, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Morton code of two non-negative 31-bit integer columns —
    * `x` on the even bits, `y` on the odd bits. Monotone along the
    * Z-curve; NULL in either key yields NULL (callers decide the NULL
    * file placement explicitly).
    */
  def mortonZ(x: Column, y: Column): Column =
    spread(x.cast("long")).bitwiseOR(shiftleft(spread(y.cast("long")), 1))

  /** Attach `z` (Morton code) and `bucket` (0-based target file id,
    * balanced to ±1 row across `buckets`) to every row. `tieCol` makes
    * the rank — and therefore the whole layout — deterministic for
    * rows sharing a Z-value.
    *
    * Scale shape: the global rank is the two-level cumsum (per-bucket
    * windows over a monotone Z-prefix + broadcast offsets — no global
    * window), and `n` is one metadata-cheap count. A writer then
    * `repartitionByRange/sortWithinPartitions` on (bucket, z) — or just
    * writes `bucket` as the file id — to materialize the layout.
    */
  def zOrderBuckets(df: DataFrame, xCol: String, yCol: String,
                    tieCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    val n = df.count()
    require(n > 0, "cannot layout an empty table")
    val withZ = df.withColumn("z", mortonZ(col(xCol), col(yCol)))
    // the Z-prefix is a monotone integer bucket for the cumsum; 2^44
    // wide keeps the offsets table small while bounding any one
    // window's partition to a Z-range, never the whole table
    val (bucketed, wi) = TwoLevelCumsum.withOffsets(
      withZ, expr("z div 1099511627776L"), lit(1L),
      Seq(col("z").asc_nulls_first, col(tieCol).asc))
    bucketed
      .withColumn("__rk", col("__off") + sum("__w").over(wi))
      // (N−1)·buckets stays in Long up to N ≈ 2^63/buckets — 5.6e17
      // rows at 16 files; past that, widen to Decimal
      .withColumn("bucket", expr(s"((__rk - 1L) * ${buckets}L) div ${n}L"))
      .drop("__b", "__w", "__off", "__rk")
  }

  /** The zone map the layout buys: per target file, row count and the
    * min/max of both dimension keys. The min/max spread per bucket is
    * exactly what a reader's file-skipping test consults — tight
    * ranges here ARE the pruning win.
    */
  def zOrderLayoutStats(df: DataFrame, xCol: String, yCol: String,
                        tieCol: String, buckets: Int): DataFrame =
    zOrderBuckets(df, xCol, yCol, tieCol, buckets)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** Zone-map pruning effectiveness, three layouts side by side: the
    * same table laid out in NATURAL (ingestion/tie-key) order, sorted
    * by x alone, and Z-ordered on (x, y) — then, for one rectangle
    * predicate [xLo..xHi] × [yLo..yHi], each target file's min/max
    * zone map decides whether a reader SKIPS it. This is the
    * measurement behind every "why Z-order" decision at 100 TB: the
    * x-sort prunes perfectly on x and not at all on y, natural order
    * prunes nothing, the Z-curve prunes on both.
    *
    * All three layouts rank through the two-level cumsum (monotone
    * integer prefixes — no global window); skippability is exact
    * integer interval disjointness, emitted as 0/1 (never a nullable
    * boolean — the cross-engine hash hazard).
    */
  def zoneMapPruning(df: DataFrame, xCol: String, yCol: String,
                     tieCol: String, buckets: Int,
                     xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val n = df.count()
    require(n > 0, "cannot layout an empty table")
    def rankBuckets(d: DataFrame, prefix: Column, order: Seq[Column]): DataFrame = {
      val (bk, wi) = TwoLevelCumsum.withOffsets(d, prefix, lit(1L), order)
      bk.withColumn("__rk", col("__off") + sum("__w").over(wi))
        .withColumn("bucket", expr(s"((__rk - 1L) * ${buckets}L) div ${n}L"))
        .drop("__b", "__w", "__off", "__rk")
    }
    def stats(d: DataFrame, layout: String): DataFrame =
      d.groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
          min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
        .withColumn("layout", lit(layout))
    val natural = rankBuckets(df, expr(s"`$tieCol` div 1024L"),
      Seq(col(tieCol).asc))
    val xsort = rankBuckets(df, expr(s"`$xCol` div 1024L"),
      Seq(col(xCol).asc, col(tieCol).asc))
    val z = zOrderBuckets(df, xCol, yCol, tieCol, buckets).drop("z")
    stats(natural, "natural")
      .unionByName(stats(xsort, "xsort"))
      .unionByName(stats(z, "zorder"))
      .withColumn("skippable",
        (col("max_x") < xLo || col("min_x") > xHi ||
          col("max_y") < yLo || col("min_y") > yHi)
          .cast(org.apache.spark.sql.types.LongType))
      .select("layout", "bucket", "n_rows", "min_x", "max_x",
        "min_y", "max_y", "skippable")
  }

  /** Attach the Hilbert-curve index of (`xCol`, `yCol`) as `__hd` —
    * the space-filling curve with strictly better locality than the
    * Z/Morton curve (every unit step of the curve is a unit step in
    * the plane; Z-order takes long diagonal jumps at quadrant
    * boundaries), hence tighter per-file zone maps at the same file
    * count. The per-bit rotate/reflect walk lives in the codegen'd
    * [[graft.expressions.HilbertIndex]] expression — composing it
    * from Column operators grows a 4^order node tree (measured: an
    * 18-level staged form OOMed the optimizer). Out-of-domain
    * coordinates yield NULL. Precondition: 0 ≤ x, y < 2^order.
    */
  def withHilbertIndex(df: DataFrame, xCol: String, yCol: String,
                       order: Int): DataFrame =
    df.withColumn("__hd", graft.expressions.LayoutExpressions.hilbert_index(
      col(xCol).cast("long"), col(yCol).cast("long"), order))

  /** Hilbert vs Z-order, head to head on the SAME rectangle predicate
    * — the [[zoneMapPruning]] measurement extended with the curve the
    * big table formats are moving to (Delta Lake liquid clustering,
    * Iceberg's hilbert transform). Same two-level-cumsum ranking,
    * same exact 0/1 skippability.
    */
  def hilbertVsZorderPruning(df: DataFrame, xCol: String, yCol: String,
                             tieCol: String, buckets: Int, order: Int,
                             xLo: Long, xHi: Long,
                             yLo: Long, yHi: Long): DataFrame = {
    val n = df.count()
    require(n > 0, "cannot layout an empty table")
    // curve indexes span [0, 4^order): size the cumsum prefix to
    // ~256 buckets so no window partition exceeds 1/256 of the curve
    val prefixDiv = 1L << math.max(0, 2 * order - 8)
    def rankBuckets(d: DataFrame, keyCol: String): DataFrame = {
      val (bk, wi) = TwoLevelCumsum.withOffsets(
        d, expr(s"`$keyCol` div ${prefixDiv}L"), lit(1L),
        Seq(col(keyCol).asc_nulls_first, col(tieCol).asc))
      bk.withColumn("__rk", col("__off") + sum("__w").over(wi))
        .withColumn("bucket", expr(s"((__rk - 1L) * ${buckets}L) div ${n}L"))
        .drop("__b", "__w", "__off", "__rk")
    }
    def stats(d: DataFrame, layout: String): DataFrame =
      d.groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
          min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
        .withColumn("layout", lit(layout))
    val h = rankBuckets(withHilbertIndex(df, xCol, yCol, order), "__hd")
    val z = rankBuckets(df.withColumn("__z", mortonZ(col(xCol), col(yCol))),
      "__z")
    stats(h, "hilbert").unionByName(stats(z, "zorder"))
      .withColumn("skippable",
        (col("max_x") < xLo || col("min_x") > xHi ||
          col("max_y") < yLo || col("min_y") > yHi)
          .cast(org.apache.spark.sql.types.LongType))
      .select("layout", "bucket", "n_rows", "min_x", "max_x",
        "min_y", "max_y", "skippable")
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): shard(k) = argmax over s < n of h(k, s) with
    * h the engine-portable 60-bit md5 prefix. The property a layout
    * at 100 TB cares about: growing n → n+1 moves EXACTLY the keys
    * whose new shard wins the argmax — an expected 1/(n+1) of them —
    * where mod-hashing reshuffles (n−1)/n of the corpus. Ties (two
    * shards sharing a 60-bit hash — ~0 probability) break to the
    * larger shard id via the greatest-struct comparison; the oracle
    * replays (hv DESC, s DESC) identically. Pure map-only column —
    * n md5 evaluations per row, done once at layout time.
    */
  def rendezvousShard(key: Column, n: Int): Column = {
    require(n >= 1 && n <= 1024, s"shard count out of range: $n")
    if (n == 1) lit(0)
    else greatest((0 until n).map { s =>
      struct(
        conv(substring(md5(concat(key.cast("string"), lit("#"),
          lit(s.toString))), 1, 15), 16, 10).cast("long").as("h"),
        lit(s).as("s"))
    }: _*).getField("s")
  }
}
