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

  test("approx_count_distinct tracks exact distinct count within 5% on orders") {
    val o = Tables.orders(spark, sf("sf0.01"))
    val r = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.01).as("approx")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(exact - r.getLong(1)) / exact < 0.05, r.toString)
  }
}
