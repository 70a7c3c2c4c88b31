package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Specs for the scalar-quantization ANN path (the other ANN variants
  * are oracle-gated end to end; SQ8's clamp/edge behavior deserves
  * fixture-level checks on top of its oracle).
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("ivfRecallSweep: recall is monotone non-decreasing in nprobe, " +
    "reaches 1.0 when every cell is probed, and counts k true " +
    "neighbors per query") {
    // 24 corpus vectors in 4 well-separated 2-D clusters + 2 queries
    val corpus = vecs((0 until 24).map { i =>
      val base = i % 4 match {
        case 0 => (10.0f, 0.0f)
        case 1 => (0.0f, 10.0f)
        case 2 => (-10.0f, 0.0f)
        case _ => (0.0f, -10.0f)
      }
      (i.toLong, Seq(base._1 + (i / 4) * 0.1f, base._2 + (i / 4) * 0.1f))
    }: _*)
    val queries = vecs(0L -> Seq(10.0f, 0.0f), 1L -> Seq(0.0f, 10.0f))
    val out = Ann.ivfRecallSweep(queries, corpus,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 4, budgets = Seq(1, 2, 4))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toMap
    assert(out.keySet === Set(1, 2, 4))
    // k true neighbors per query at every budget row
    assert(out.values.forall(_._1 === 10L))
    // monotone in the budget, exhaustive at nprobe = nCells
    assert(out(1)._3 <= out(2)._3 && out(2)._3 <= out(4)._3)
    assert(out(4)._2 === 10L && out(4)._3 === 1000000L)
    // every caught count stays within its truth total
    assert(out.values.forall { case (t, c, _) => c >= 0L && c <= t })
  }

  test("int8OversampleRecall: recall is monotone non-decreasing in " +
    "the oversample factor, reaches 1.0 when the shortlist covers the " +
    "corpus, and counts k true neighbors per query") {
    // 16 corpus vectors fanned around the unit circle (distinct
    // cosine order), 2 queries; the shortlist is k·m = 2/4 at
    // m ∈ {1,2} but 16 ≥ corpus−1 = 15 at m = 8 → recall 1.0 there
    val corpus = vecs((0 until 16).map { i =>
      val a = i * 0.12
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
    }: _*)
    val queries = vecs(0L -> Seq(1.0f, 0.0f), 7L -> Seq(0.6f, 0.8f))
    val out = Ann.int8OversampleRecall(queries, corpus,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 2, oversamples = Seq(1, 2, 8))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet === Set(1, 2, 8))
    // shortlist_k = m·k; k true neighbors per query at every row
    assert(out(1)._1 === 2L && out(2)._1 === 4L && out(8)._1 === 16L)
    assert(out.values.forall(_._2 === 4L))
    // monotone in m; exhaustive once the shortlist covers the corpus
    assert(out(1)._4 <= out(2)._4 && out(2)._4 <= out(8)._4)
    assert(out(8)._3 === 4L && out(8)._4 === 1000000L)
    assert(out.values.forall { case (_, t, c, _) => c >= 0L && c <= t })
  }

  test("sqTopK: recovers exact nearest neighbors on well-separated " +
    "clusters, and sq_dist orders consistently with geometry") {
    val corpus = vecs(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.9f, 0.1f),
      3L -> Seq(0.0f, 1.0f), 4L -> Seq(0.1f, 0.9f),
      5L -> Seq(-1.0f, -1.0f))
    val queries = vecs(100L -> Seq(1.0f, 0.05f), 101L -> Seq(0.05f, 1.0f))
    val out = Ann.sqTopK(queries, corpus, "vec_id", "embedding",
      "vec_id", "embedding", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getAs[Long]("sq_dist"))).toMap
    // query 100 is the x-axis cluster; its neighbors are 1 then 2
    assert(out((100L, 1)) ._1 === 1L)
    assert(out((100L, 2))._1 === 2L)
    // query 101 is the y-axis cluster; neighbors 3 then 4
    assert(out((101L, 1))._1 === 3L)
    assert(out((101L, 2))._1 === 4L)
    // code distance to the nearer neighbor is strictly smaller
    assert(out((100L, 1))._2 < out((100L, 2))._2)
  }

  test("sqTopK: constant dimensions quantize to 0 everywhere and " +
    "out-of-range query values clamp instead of overflowing the byte") {
    val corpus = vecs(
      1L -> Seq(5.0f, 0.0f), 2L -> Seq(5.0f, 1.0f), 3L -> Seq(5.0f, 2.0f))
    // dim 1 is constant in the corpus; the query's wild values there
    // must be ignored (code 0 both sides) and its dim-2 value, far
    // outside the trained [0, 2] range, must clamp at the grid edge
    val queries = vecs(100L -> Seq(999.0f, 100.0f))
    val out = Ann.sqTopK(queries, corpus, "vec_id", "embedding",
      "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(2) -> r.getAs[Long]("sq_dist")).toMap
    // constant dim contributes 0 both sides; the query's dim-2 code
    // clamps at 127, so code distances are exactly (127-code_c)^2
    assert(out(3L) === 0L) // corpus code 127
    assert(out(2L) === 127L * 127L) // corpus code 0
    assert(out(1L) === 255L * 255L) // corpus code -128
  }

  test("prefixDimRecall: recall is 1 when the prefix carries the " +
    "signal and drops when a tail-heavy imposter fools the prefix") {
    val q = vecs(0L -> Seq(1.0f, 0.0f, 0.0f, 0.0f))
    // a: identical; c: differs in the prefix only
    val clean = vecs(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 1.0f, 0.0f, 0.0f))
    val r1 = Ann.prefixDimRecall(q, clean, "vec_id", "embedding",
      "vec_id", "embedding", k = 2, prefixDims = 2)
      .collect()(0)
    assert(r1.getLong(1) === 2L) // k_full
    assert(r1.getAs[Long]("recall_ppm") === 1000000L)
    // b matches q on the prefix but sits far away in the tail: codes
    // q=[127,0,0,0], a=[127,0,0,0], b=[25,0,127,127], c=[0,127,0,0];
    // full top2 = {a, c} (0, 32258 < 42662), prefix top2 = {a, b}
    // (0, 10404 < 32258) -> recall 1/2
    val withImposter = clean.unionByName(
      vecs(2L -> Seq(1.0f, 0.0f, 5.0f, 5.0f)))
    val r2 = Ann.prefixDimRecall(q, withImposter, "vec_id", "embedding",
      "vec_id", "embedding", k = 2, prefixDims = 2)
      .collect()(0)
    assert(r2.getLong(2) === 1L) // n_hits
    assert(r2.getAs[Long]("recall_ppm") === 500000L)
  }

  test("int_sq_dist: exact-value parity with the zip_with/aggregate " +
    "composition, NULL on length mismatch and NULL inputs") {
    import graft.expressions.SimilarityExpressions.int_sq_dist
    val df = Seq(
      (Seq(1, 2, 3), Seq(1, 2, 3)),
      (Seq(-128, 127, 0), Seq(127, -128, 5)),
      (Seq(0, 0), Seq(1000000, -1000000))).toDF("a", "b")
    val both = df.select(int_sq_dist(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x.cast("long") - y) * (x.cast("long") - y)),
        lit(0L), (acc, x) => acc + x).as("slow")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(both(1).getLong(0) === 2L * 255L * 255L + 25L)
    val edge = Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
      .select(int_sq_dist(col("a"), col("b")).as("d"))
      .union(Seq((Seq(1), Seq(1))).toDF("a", "b")
        .select(int_sq_dist(lit(null).cast("array<int>"), col("b")).as("d")))
      .collect()
    assert(edge.forall(_.isNullAt(0)), "mismatch/NULL must yield NULL")
  }

  test("knnLabelAgreement: clean clusters agree, a planted wrong-label " +
    "vector is the disagreement") {
    // two tight clusters: label 1 near (1,0), label 2 near (0,1);
    // vec 14 sits IN cluster 1 but carries label 2 -> its 3-NN are all
    // label 1 -> not majority-same; every clean sampled vec agrees.
    // sampleMod = 1 samples every vector.
    val df = Seq(
      (0L, Seq(1.00f, 0.01f), 1), (7L, Seq(0.99f, 0.02f), 1),
      (1L, Seq(0.98f, 0.00f), 1), (2L, Seq(0.97f, 0.03f), 1),
      (3L, Seq(0.02f, 1.00f), 2), (4L, Seq(0.01f, 0.99f), 2),
      (5L, Seq(0.03f, 0.98f), 2), (6L, Seq(0.00f, 0.97f), 2),
      (14L, Seq(0.96f, 0.02f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.knnLabelAgreement(df, "vec_id", "embedding", "label",
      k = 3, sampleMod = 1)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Long]("agreement_ppm"))).toMap
    assert(out(1) === ((4L, 4L, 1000000L)))
    // label 2: 5 sampled, the planted 14 disagrees -> 4/5 = 800000 ppm
    assert(out(2) === ((5L, 4L, 800000L)))
  }

  test("dimProfile: exact integer lattice moments per coordinate, " +
    "zero counting, and min/max on the e6 lattice") {
    val df = vecs(
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(2.0f, 0.0f),
      3L -> Seq(3.0f, 4.0f))
    val out = Ann.dimProfile(df, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Long]("sum_e6"),
          r.getAs[Long]("sumsq_e12"), r.getAs[Long]("min_e6"),
          r.getAs[Long]("max_e6"))).toMap
    // dim 0: {1,2,3} on the e6 lattice
    assert(out(0) === ((3L, 0L, 6000000L,
      (1L + 4L + 9L) * 1000000000000L, 1000000L, 3000000L)))
    // dim 1: {0,0,4} -> sum 4e6, sumsq 16e12
    assert(out(1) === ((3L, 2L, 4000000L, 16000000000000L, 0L, 4000000L)))
  }

  test("kCenterSelect: farthest-point traversal picks opposite poles " +
    "before a near-duplicate, with exact integer selection distances") {
    val corpus = vecs(
      1L -> Seq(1.0f, 0.0f),   // seed (min id) -> code (127, 0)
      2L -> Seq(0.99f, 0.01f), // near-dup of 1 -> (127, 1)
      3L -> Seq(-1.0f, 0.0f),  // opposite pole -> (-127, 0)
      4L -> Seq(0.0f, 1.0f))   // orthogonal -> (0, 127)
    val out = Ann.kCenterSelect(corpus, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1) === ((1L, -1L)))
    assert(out(2) === ((3L, 254L * 254L)))      // farthest from seed
    assert(out(3) === ((4L, 127L * 127L * 2)))  // then the orthogonal
    assert(out(4) === ((2L, 1L)))               // near-dup last
  }

  test("jlProjectionReport: projections match an independent md5-sign " +
    "replay, identical vectors give d2 0 with NULL distortion") {
    val corpus = vecs(
      0L -> Seq(1.0f, -0.5f),
      1L -> Seq(0.5f, 0.25f),
      2L -> Seq(1.0f, -0.5f)) // exact duplicate of 0
    val out = Ann.jlProjectionReport(corpus, "vec_id", "embedding",
      outDims = 4, pairIds = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // independent replay: same quantization, same md5 sign bits
    def q8(v: Seq[Float]): Seq[Long] = {
      val s = v.map(x => math.abs(x.toDouble)).max
      v.map(x => if (s == 0) 0L
        else math.floor(x.toDouble / s * 127d + 0.5d).toLong)
    }
    def sign(j: Int, i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"rp|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    def proj(v: Seq[Float]): Seq[Long] = {
      val q = q8(v)
      (0 until 4).map(j => q.indices.map(i => sign(j, i) * q(i)).sum)
    }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val (v0, v1, v2) = (Seq(1.0f, -0.5f), Seq(0.5f, 0.25f), Seq(1.0f, -0.5f))
    assert(out((0L, 2L)) === ((0L, 0L, None)), "duplicate pair: 0/NULL")
    assert(out((0L, 1L))._1 === d2(q8(v0), q8(v1)))
    assert(out((0L, 1L))._2 === d2(proj(v0), proj(v1)))
    val expected = BigDecimal(d2(proj(v0), proj(v1)).toDouble /
      (4.0 * d2(q8(v0), q8(v1)).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((0L, 1L))._3 === Some(expected))
  }

  test("mmrRerank: matches an independent greedy MMR on a seeded " +
    "fixture, and a redundant near-duplicate of the first pick is " +
    "deferred in favor of a diverse candidate") {
    // deterministic pseudo-random 4-dim corpus (no Math.random)
    def v(id: Long): Seq[Float] =
      (0 until 4).map(d => (((id * 31 + d * 17 + 7) % 19) - 9) / 9.0f)
    val corpus = vecs(((1L to 30L).map(i => i -> v(i)) :+
      (99L -> v(5L))): _*) // 99 duplicates vector 5 exactly
    val queries = vecs(0L -> v(0L))
    val (poolK, selK, lam) = (8, 4, 0.5)
    val out = Ann.mmrRerank(queries, corpus, "vec_id", "embedding",
      "vec_id", "embedding", poolK, selK, lam)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)

    // independent reference: same fold-order cosine, same HALF_UP
    // rounding, same greedy tie-break
    val all = ((1L to 30L).map(i => i -> v(i)) :+ (99L -> v(5L))).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rel = all.map { case (id, vv) => id -> r4(cos(v(0L), vv)) }
    val pool = all.keys.toSeq
      .sortBy(id => (-rel(id), id)).take(poolK)
    var ms = pool.map(_ -> 0.0).toMap
    var remaining = pool.toSet
    val picks = (1 to selK).map { _ =>
      val best = remaining.toSeq.sortBy(c =>
        (-(lam * rel(c) - (1.0 - lam) * ms(c)), c)).head
      remaining -= best
      ms = ms.map { case (c, m) =>
        c -> math.max(m, r4(cos(all(best), all(c))))
      }
      best
    }
    assert(out.map(_._2).toSeq === picks,
      s"engine=${out.toSeq} ref=$picks rel=$rel")
    // the exact duplicate pair (5, 99): at most one of them selected
    assert(out.count(p => p._2 == 5L || p._2 == 99L) <= 1,
      "MMR must not select both copies of a duplicated vector")
  }
}
