package graft

import org.apache.spark.sql.functions._

/** Sketch-aggregate scale paths: the oracle-gated queries use exact
  * forms for DuckDB parity (q38 percentile_cont, q07/q36 exact
  * distinct counts); at 100 TB the sketch twins replace them. These
  * specs pin the sketches to their exact counterparts within
  * tolerance on real data so the swap is evidence-backed.
  */
class SketchSpec extends SparkSpec {

  test("approx_percentile tracks exact percentile_cont within 2% on events") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val joined = ev.groupBy("event_type")
      .agg(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").as("exact_p50"),
        expr("approx_percentile(value, 0.5, 10000)").as("approx_p50"),
        expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)").as("exact_p90"),
        expr("approx_percentile(value, 0.9, 10000)").as("approx_p90"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e50 = r.getAs[Double]("exact_p50"); val a50 = r.getAs[Double]("approx_p50")
      val e90 = r.getAs[Double]("exact_p90"); val a90 = r.getAs[Double]("approx_p90")
      assert(math.abs(e50 - a50) / math.max(1e-9, math.abs(e50)) < 0.02,
        s"p50 drift for ${r.get(0)}: $r")
      assert(math.abs(e90 - a90) / math.max(1e-9, math.abs(e90)) < 0.02,
        s"p90 drift for ${r.get(0)}: $r")
    }
  }

  test("MinHashSig expression is bit-identical to the HOF formulation on real docs") {
    // the pinned q75 oracle and any persisted signature state depend on
    // the exact hash values — the codegen expression must reproduce
    // transform(sequence(0,k-1), i => array_min(transform(sh, s => xxhash64(s,i))))
    val docs = Tables.documents(spark, sf("sf0.001"))
    val sh = graft.text.TextOps.wordShingles(col("text"), 3)
    val both = docs
      .filter(size(graft.text.TextOps.tokens(col("text"))) >= 3)
      .select(
        graft.expressions.SimilarityExpressions.minhash_sig(sh, 64).as("fast"),
        graft.expressions.ExprOps.bind(sh) { s =>
          transform(sequence(lit(0), lit(63)), i => array_min(transform(s, x => xxhash64(x, i))))
        }.as("hof"))
    assert(both.count() > 0)
    assert(both.filter(not(col("fast") === col("hof"))).count() === 0)
    // interpreted eval path (e.g. inside non-codegen contexts) agrees too
    val row = both.head()
    assert(row.getSeq[Long](0) === row.getSeq[Long](1))
  }

  test("approx_count_distinct tracks exact distinct count within 5% on orders") {
    val o = Tables.orders(spark, sf("sf0.01"))
    val r = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.01).as("approx")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(exact - r.getLong(1)) / exact < 0.05, r.toString)
  }

  test("kmvDistinct: below-k groups report exact counts with no kth hash") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("b", 7L))
      .toDF("g", "v")
    val out = graft.operators.SketchOps.kmvDistinct(df, "g", "v", k = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2)), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((3L, None, 3L, 3L)))
    assert(out("b") === ((1L, None, 1L, 1L)))
  }

  test("kmvDistinct: kth hash is the k-th smallest md5, the integer " +
    "estimator is deterministic across partitionings, error is sane") {
    import spark.implicits._
    val n = 500
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("g", "v")
    val k = 64
    def run(parts: Int) =
      graft.operators.SketchOps.kmvDistinct(df.repartition(parts), "g", "v", k)
        .head()
    val a = run(1); val b = run(13)
    assert(a === b, "sketch must be partitioning-invariant")
    // recompute the k-th smallest hash independently
    val hashes = (1 to n).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.sorted
    assert(a.getLong(1) === k.toLong)
    assert(a.getString(2) === hashes(k - 1))
    val vk = java.lang.Long.parseLong(hashes(k - 1).take(13), 16)
    val expectEst = ((k - 1).toLong << 52) / vk
    assert(a.getLong(3) === expectEst)
    assert(a.getLong(4) === n.toLong)
    // KMV std error ~ 1/sqrt(k-2) ≈ 13%; 40% is a 3-sigma sanity band
    assert(math.abs(expectEst.toDouble - n) / n < 0.4,
      s"estimate $expectEst too far from $n")
  }

  test("kmvDistinct: NULL values are excluded (no encoder crash) and " +
    "both branches count the same set; includeExact=false drops the " +
    "exact aggregate from the output") {
    import graft.operators.SketchOps
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y"), ("a", null), ("b", null))
      .toDF("g", "v")
    val out = SketchOps.kmvDistinct(df, "g", "v", k = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    // group a: 2 non-null distinct values, both branches agree;
    // group b carries ONLY NULLs — no observable values, so the group
    // is absent from the sketch output entirely (not a zero row)
    assert(out("a") === ((2L, 2L, 2L)))
    assert(!out.contains("b"))
    val slim = SketchOps.kmvDistinct(df, "g", "v", k = 8, includeExact = false)
    assert(!slim.columns.contains("exact_distinct"))
  }

  test("countMin: estimates never undercount, exact on a collision-free " +
    "fixture, absent items estimate 0, state bounded by depth × width, " +
    "and merged counters equal a single build (mergeability)") {
    import graft.operators.SketchOps
    import spark.implicits._
    val values = (1 to 50).flatMap(i => Seq.fill(i)(s"v$i"))
    val df = values.toDF("v").repartition(7)
    val counters = SketchOps.countMinBuild(df, "v", depth = 4, width = 1024)
    assert(counters.count() <= 4L * 1024L)
    val queries = (Seq(1, 7, 50).map(i => s"v$i") :+ "absent").toDF("v")
    val est = SketchOps.countMinEstimate(counters, queries, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CM never undercounts; at 50 items in 1024 buckets collisions are
    // absent with overwhelming probability for depth 4 (the min takes
    // the cleanest row) — these are the exact counts
    assert(est("v1") === 1L && est("v7") === 7L && est("v50") === 50L)
    assert(est("absent") === 0L)

    // mergeability: counters built on two halves, summed, == one build
    val (h1, h2) = (values.take(600), values.drop(600))
    val merged = SketchOps.countMinBuild(h1.toDF("v"), "v")
      .unionByName(SketchOps.countMinBuild(h2.toDF("v"), "v"))
      .groupBy("sketch_row", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    val single = counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = merged.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m === single)
  }

  test("hdr quantile sketch: bucket index monotone, exact region " +
    "exact, relative error bounded, counters merge by sum") {
    import graft.operators.SketchOps
    import spark.implicits._
    val p = 5
    val rnd = new scala.util.Random(11)
    // heavy-tailed values spanning exact and log-linear regions
    val values = (1 to 2000).map(_ =>
      math.floor(math.exp(rnd.nextDouble() * 14)).toLong)
    val df = values.map(("g", _)).toDF("g", "v")

    // bucket index is monotone in v (bucket order IS value order)
    val sorted = values.sorted
    val bucketed = SketchOps.hdrBuild(
      sorted.zipWithIndex.map { case (v, i) => (i, v) }.toDF("g", "v"),
      "g", "v", p)
    // rebuild per-value buckets via a 1-group-per-value frame
    val perVal = bucketed.orderBy("g").select("bucket").as[Long].collect()
    assert(perVal.zip(perVal.tail).forall { case (a, b) => a <= b },
      "bucket index must be monotone in the value")

    // exact region: all values < 2^p report themselves
    val small = (0L until 32L).map(("s", _)).toDF("g", "v")
    val smallQ = SketchOps.hdrQuantiles(
      SketchOps.hdrBuild(small, "g", "v", p), "g", Seq(0.5), p)
      .select("est_lo").as[Long].head()
    assert(smallQ === 15L) // rank ceil(0.5·32)=16 → value 15 (0-based run)

    // relative error vs the exact quantile
    val sk = SketchOps.hdrBuild(df, "g", "v", p)
    val qs = Seq(0.5, 0.9, 0.99)
    val est = SketchOps.hdrQuantiles(sk, "g", qs, p)
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val lo = est(q)
      assert(lo <= exact, s"q=$q: lower bound $lo must not exceed exact $exact")
      assert(exact <= lo + math.max(lo >> (p - 1), 1L),
        s"q=$q: exact $exact outside bucket [$lo, ${lo + math.max(lo >> (p - 1), 1L)}]")
    }

    // merge: two halves' counters summed == one build
    val (h1, h2) = values.splitAt(1000)
    val merged = SketchOps.hdrBuild(h1.map(("g", _)).toDF("g", "v"), "g", "v", p)
      .unionByName(SketchOps.hdrBuild(h2.map(("g", _)).toDF("g", "v"), "g", "v", p))
      .groupBy("g", "bucket").agg(sum("cnt").as("cnt"))
    val mm = merged.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val ss = sk.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(mm === ss)
  }

  test("kmvSetOps: below k every output is EXACT set arithmetic") {
    import spark.implicits._
    val a = (1 to 10).map(_.toLong).toDF("v")
    val b = (6 to 15).map(_.toLong).toDF("v")
    val r = graft.operators.SketchOps.kmvSetOps(a, b, "v", k = 64).collect()(0)
    assert(r.getAs[Long]("n_a_hashes") === 10L)
    assert(r.getAs[Long]("n_b_hashes") === 10L)
    assert(r.getAs[Long]("est_a") === 10L)
    assert(r.getAs[Long]("est_b") === 10L)
    assert(r.getAs[Long]("union_size") === 15L)
    assert(r.getAs[Long]("union_est") === 15L)
    assert(r.getAs[Long]("shared_mins") === 5L)
    assert(r.getAs[Double]("jaccard_est") === 0.333333)
    assert(r.getAs[Long]("intersect_est") === 5L)
  }

  test("kmvSetOps: k=16 sketches of 100/100-element sets with 50 " +
    "shared track the true cardinalities") {
    import spark.implicits._
    val a = (1 to 100).map(_.toLong).toDF("v")
    val b = (51 to 150).map(_.toLong).toDF("v")
    val r = graft.operators.SketchOps.kmvSetOps(a, b, "v", k = 16).collect()(0)
    // KMV with k=16 has ~1/sqrt(14) ≈ 27% relative error at one sigma;
    // these are determinism-backed sanity bands, not statistics
    def in(x: Long, lo: Long, hi: Long) = assert(x >= lo && x <= hi, x)
    in(r.getAs[Long]("est_a"), 40L, 250L)
    in(r.getAs[Long]("est_b"), 40L, 250L)
    in(r.getAs[Long]("union_est"), 60L, 375L) // true 150
    assert(r.getAs[Long]("shared_mins") <= 16L)
    assert(r.getAs[Long]("intersect_est") <= r.getAs[Long]("union_est"))
    // the estimator is a pure function of the value sets: re-running
    // on a reshuffled input must reproduce it bit-identically
    val r2 = graft.operators.SketchOps.kmvSetOps(
      a.repartition(7), b.repartition(3), "v", k = 16).collect()(0)
    assert(r.toSeq === r2.toSeq)
  }

  test("hllDistinct: linear counting is near-exact on tiny sets, the " +
    "raw estimator tracks large sets, and the estimate is layout-" +
    "invariant") {
    import spark.implicits._
    // 3 distinct values, heavy duplication -> linear-count regime
    val small = Seq.fill(50)(Seq("x", "y", "z")).flatten
      .map(("g", _)).toDF("g", "v")
    val r = graft.operators.SketchOps.hllDistinct(small, "g", "v").collect()(0)
    assert(r.getAs[Long]("exact_distinct") === 3L)
    val est = r.getAs[Double]("est_distinct")
    // m ln(m/V) with V >= 61 -> within a hash collision of 3
    assert(est > 1.5 && est < 5.0, s"linear-count estimate $est")

    // 2000 distinct -> raw harmonic regime; sigma ~ 1.04/sqrt(64) = 13%
    val big = (1 to 2000).map(i => ("g", s"val$i")).toDF("g", "v")
    val rb = graft.operators.SketchOps.hllDistinct(big, "g", "v").collect()(0)
    assert(rb.getAs[Long]("n_buckets_hit") === 64L)
    val estB = rb.getAs[Double]("est_distinct")
    assert(estB > 1400 && estB < 2700, s"raw estimate $estB")

    // pure function of the value set: duplication + layout can't move it
    val rb2 = graft.operators.SketchOps.hllDistinct(
      big.unionAll(big).repartition(7), "g", "v").collect()(0)
    assert(rb2.getAs[Double]("est_distinct") === estB)
  }

  test("hllRollup: day-merged registers reproduce the whole-period " +
    "estimate EXACTLY while the naive per-day sum double-counts") {
    import spark.implicits._
    import java.sql.Date
    // 1500 values over 3 days, each day's set overlapping the next:
    // day d carries val(500d-250) .. val(500d+499)
    val rows = (0 to 2).flatMap(d => (500 * d - 250 to 500 * d + 499)
      .filter(_ >= 0).map(i => ("g", Date.valueOf(f"2024-01-0${d + 1}"),
        s"val$i")))
    val df = rows.toDF("g", "day", "v")
    val out = graft.operators.SketchOps.hllRollup(df, "g", col("day"), "v")
      .collect()(0)
    assert(out.getAs[Long]("n_days") === 3L)
    assert(out.getAs[Long]("exact_distinct") === 1500L)
    assert(out.getAs[Long]("sum_daily_exact") === 2000L) // 500 repeats
    // merge-by-max is lossless: the rolled-up estimate IS the direct one
    val direct = graft.operators.SketchOps.hllDistinct(df, "g", "v")
      .collect()(0).getAs[Double]("est_distinct")
    assert(out.getAs[Double]("est_merged") === direct)
  }

  test("amsF2: estimator folds match an independent md5-sign replay, " +
    "exact F2 correct, median is an exact member of the estimates") {
    import spark.implicits._
    def sign(r: Int, v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 1) 1L else -1L
    }
    // multiset: a x4, b x2, c x1, d x1  =>  F2 = 16+4+1+1 = 22
    val vals = Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")
    val df = (vals :+ null).toDF("v")
    val out = graft.operators.SketchOps.amsF2(df, "v", depth = 5).collect()
    assert(out.length === 5)
    assert(out.head.getAs[Long]("exact_f2") === 22L)
    val ests = out.map { r =>
      val row = r.getAs[Int]("sketch_row")
      val x = vals.map(v => sign(row, v)).sum
      assert(r.getAs[Long]("x") === x, s"estimator $row fold")
      assert(r.getAs[Long]("est") === x * x)
      x * x
    }
    val med = ests.sorted.apply(2)
    assert(out.head.getAs[Long]("median_est") === med)
    assert(out.head.getAs[Double]("rel_err") ===
      BigDecimal((med - 22.0) / 22.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    intercept[IllegalArgumentException](
      graft.operators.SketchOps.amsF2(df, "v", depth = 4))
  }
}
