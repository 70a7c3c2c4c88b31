package graft

import graft.operators.PrivacyOps
import org.apache.spark.sql.functions._

class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  test("privacyRisk: hand-computed class sizes, sensitive diversity, " +
    "and both risk flags; NULL quasi forms its own class; NULL " +
    "sensitive counts as a value") {
    val rows = Seq(
      // class (25, "A"): 3 rows, sensitive {x, y} -> k ok at 3, l ok at 2
      (25, "A", "x"), (25, "A", "y"), (25, "A", "x"),
      // class (25, "B"): 2 rows, sensitive {x} -> k_risk at 3, l_risk at 2
      (25, "B", "x"), (25, "B", "x"),
      // class (NULL, "A"): 3 rows, sensitive {x, NULL} -> NULL is a value
      (0, "A", "x"), (0, "A", null), (0, "A", null)
    ).toDF("nation", "seg", "status")
      .withColumn("nation", when(col("nation") === 0, lit(null)).otherwise(col("nation")))
    val out = PrivacyOps.privacyRisk(rows, Seq("nation", "seg"), "status",
        k = 3, l = 2)
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toSet
    assert(out === Set(
      (Some(25), "A", 3L, 2L, false, false),
      (Some(25), "B", 2L, 1L, true, true),
      (None, "A", 3L, 2L, false, false)))
  }

  test("privacyRisk guards: sensitive overlapping quasi, empty quasi, " +
    "non-positive k rejected") {
    val df = Seq((1, "a")).toDF("q", "s")
    intercept[IllegalArgumentException](
      PrivacyOps.privacyRisk(df, Seq("q", "s"), "s", 2, 2))
    intercept[IllegalArgumentException](
      PrivacyOps.privacyRisk(df, Seq.empty, "s", 2, 2))
    intercept[IllegalArgumentException](
      PrivacyOps.privacyRisk(df, Seq("q"), "s", 0, 2))
  }

  test("privacyRisk plan: two-level aggregation, no Expand from a " +
    "distinct aggregate") {
    val df = Seq((1, "a", "x"), (2, "b", "y")).toDF("q1", "q2", "s")
    val out = PrivacyOps.privacyRisk(df, Seq("q1", "q2"), "s", 2, 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"no Expand expected:\n$plan")
  }
}
