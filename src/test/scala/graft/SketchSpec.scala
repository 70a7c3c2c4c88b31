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
}
