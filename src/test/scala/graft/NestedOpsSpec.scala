package graft

import graft.operators.NestedOps
import org.apache.spark.sql.functions._

class NestedOpsSpec extends SparkSpec {
  import spark.implicits._

  private val nestedJson = Seq(
    """{"id": 1, "loc": {"PARCEL": {"PARCELNUMBER": "0001X00001000101", "ADDRESS": "1 Main St"}},
       "fields": [{"name": "Status", "value": "Open", "updated": 3},
                  {"name": "Priority", "value": "High", "updated": 5}]}""".replaceAll("\n\\s*", " "),
    """{"id": 2, "loc": {"PARCEL": {"PARCELNUMBER": "", "ADDRESS": null}},
       "fields": [{"name": "Other", "value": "x", "updated": 9}]}""".replaceAll("\n\\s*", " "))

  private lazy val df = {
    val ds = spark.createDataset(nestedJson)(org.apache.spark.sql.Encoders.STRING)
    spark.read.json(ds)
  }

  test("extractField: 2-level path, empty => NULL (dataflow_utils.py:1086-1156)") {
    val out = NestedOps.extractField(df, "loc", "PARCEL", "parc", additionalNestedField = "PARCELNUMBER")
      .select("id", "parc").orderBy("id").collect()
    assert(out(0).getString(1) === "0001X00001000101")
    assert(out(1).isNullAt(1), "empty string => NULL")
  }

  test("extractFromStructList: key/value search + max fallback (cherwell pattern)") {
    val found = NestedOps.extractFromStructList(df, "fields",
      searchKey = "name", searchValue = "Status",
      nestedField = "value", newFieldName = "status")
      .select("id", "status").orderBy("id").collect()
    assert(found(0).getString(1) === "Open")
    // id=2 has no "Status" element -> falls back to max(name) = "Other"
    assert(found(1).getString(1) === "x")
  }

  test("unnestWithCounters: 1-based segment counters (gcs_utils.py:597-662)") {
    val permits = Seq(
      (1L, Seq("segA", "segB", "segC")),
      (2L, Seq("segX")),
      (3L, Seq.empty[String])
    ).toDF("permit_id", "segments")
    val out = NestedOps.unnestWithCounters(permits, "segments", "segment")
    val rows = out.orderBy("permit_id", "segment_num")
      .select("permit_id", "segment_num", "total_segments", "segment")
      .collect()
    assert(rows.length === 5, "3 + 1 + 1 null row (outer explode)")
    assert(rows(0).getInt(1) === 1 && rows(0).getInt(2) === 3 && rows(0).getString(3) === "segA")
    assert(rows(2).getInt(1) === 3 && rows(2).getString(3) === "segC")
    assert(rows(4).getLong(0) === 3L && rows(4).isNullAt(3), "empty array keeps parent row")
  }

  test("unNestXref: two-level Computronix flattening with NULL-safe missing levels") {
    val json = Seq(
      """{"base": "p1", "XREF": [{"TABLE": {"f1": "v1", "XREF2": [{"TABLE2": {"g1": "w1"}}]}}]}""",
      """{"base": "p2", "XREF": []}""")
    val d = spark.read.json(spark.createDataset(json)(org.apache.spark.sql.Encoders.STRING))
    val out = NestedOps.unNestXref(d, "XREF", "TABLE", Seq("f1"), "XREF2", "TABLE2", Seq("g1"))
      .select("base", "f1", "g1").orderBy("base").collect()
    assert(out(0).getString(1) === "v1" && out(0).getString(2) === "w1")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2), "missing xref level => NULLs")
  }
}
