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
    assert(r1.getAs[Double]("recall") === 1.0)
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
    assert(r2.getAs[Double]("recall") === 0.5)
  }

  test("dimProfile: exact means/stds per coordinate, zero counting, " +
    "and min/max") {
    val df = vecs(
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(2.0f, 0.0f),
      3L -> Seq(3.0f, 4.0f))
    val out = Ann.dimProfile(df, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("mean"),
          r.getAs[Double]("std"), r.getAs[Double]("min_v"),
          r.getAs[Double]("max_v"))).toMap
    assert(out(0) === ((3L, 0L, 2.0, 1.0, 1.0, 3.0)))
    // dim 1: {0,0,4} -> mean 4/3, sample var 16/3, std 2.309401
    assert(out(1) === ((3L, 2L, 1.333333, 2.309401, 0.0, 4.0)))
  }
}
