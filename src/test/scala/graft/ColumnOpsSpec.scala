package graft

import graft.operators.ColumnOps
import graft.operators.ColumnOps._
import org.apache.spark.sql.Row

/** Golden fixtures ported from the reference's own unit tests
  * (tests/test_dataflow_utils.py) — its de-facto conformance suite.
  */
class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("camelToSnake matches reference (:19-23)") {
    assert(ColumnOps.camelToSnake("exampleColumnName") === "example_column_name")
    assert(ColumnOps.camelToSnake("anotherExample") === "another_example")
    assert(ColumnOps.camelToSnake("alreadysnake") === "alreadysnake")
    assert(ColumnOps.camelToSnake("ABCDef") === "abc_def")
  }

  test("changeTypes: reference matrix (:31-40) — NaN, posint range, bool parse") {
    val df = Seq(("1", 15213L, 72.0, 31.1, -3019057200L, "TRUE", "1", Double.NaN))
      .toDF("count", "zip", "temp", "day", "pos", "bool1", "bool2", "nan_float")
    val out = ColumnOps.changeTypes(df, Seq(
      "count" -> RInt, "zip" -> RStr, "temp" -> RFloat, "pos" -> RPosInt,
      "bool1" -> RBool, "bool2" -> RBool, "nan_float" -> RFloat))
    val r = out.head()
    assert(r.getAs[Long]("count") === 1L)
    assert(r.getAs[String]("zip") === "15213")
    assert(r.getAs[Double]("temp") === 72.0)
    assert(r.isNullAt(r.fieldIndex("pos")), "posint out of range => NULL")
    assert(r.getAs[Boolean]("bool1") === true)
    assert(r.getAs[Boolean]("bool2") === true)
    assert(r.isNullAt(r.fieldIndex("nan_float")), "NaN => NULL")
  }

  test("changeTypes: nullstr maps empty string to NULL") {
    val df  = Seq(("", "x"), ("y", "")).toDF("a", "b")
    val out = ColumnOps.changeTypes(df, Seq("a" -> RNullStr, "b" -> RNullStr))
    val rows = out.collect()
    assert(rows(0).isNullAt(0) && rows(0).getString(1) === "x")
    assert(rows(1).getString(0) === "y" && rows(1).isNullAt(1))
  }

  test("convertBooleans: token vocab + default (:42-56 semantics, typed)") {
    val df = Seq("yeah", "nope", "nah", "yup", "", "whatever")
      .toDF("b")
    val out = ColumnOps.convertBooleans(df, "b",
      trueTokens = Seq("yeah", "yup"), falseTokens = Seq("nah", "nope"),
      default = Some(false))
    assert(out.collect().map(r => r.getBoolean(0)).toSeq ===
      Seq(true, false, false, true, false, false))
  }

  test("filterFields keep and drop (:248-260)") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    assert(ColumnOps.filterFields(df, Seq("y")).columns.toSeq === Seq("x", "z"))
    assert(ColumnOps.filterFields(df, Seq("y", "x"), exclude = false)
      .columns.toSet === Set("x", "y"))
  }

  test("prependCharacters zero-pads (:262-272)") {
    val df = Seq("13342", "312258", "8070", null, "2").toDF("id")
    val out = ColumnOps.prependCharacters(df, "id", 6, "0")
    assert(out.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("013342"), Some("312258"), Some("008070"), None, Some("000002")))
  }

  test("stripBeforeDelim: ISO timestamp to date, keep-after (:304-332)") {
    val df = Seq(("1999-01-25T00:00:00.0000000", "Bureau of School Crossing Guards-X"))
      .toDF("hire", "dept")
    val out = ColumnOps.stripBeforeDelim(
      ColumnOps.stripBeforeDelim(df, "hire", "T", keep = 0), "dept", "-", keep = 1)
    val r = out.head()
    assert(r.getString(0) === "1999-01-25")
    assert(r.getString(1) === "X")
  }

  test("filterOutliers nulls value, keeps row (:160-165)") {
    val df  = Seq((446, 6), (445, 7)).toDF("num_bridges", "num_super_bowls")
    val out = ColumnOps.filterOutliers(
      ColumnOps.filterOutliers(df, "num_bridges", 1, 445), "num_super_bowls", 6, 9999)
    val rows = out.collect()
    assert(rows.length === 2, "rows never dropped")
    assert(rows(0).isNullAt(0) && rows(0).getInt(1) === 6)
    assert(rows(1).getInt(0) === 445 && rows(1).getInt(1) === 7)
  }

  test("renameFields: missing source column becomes NULL column") {
    val df  = Seq((1, "a")).toDF("x", "y")
    val out = ColumnOps.renameFields(df, Seq("x" -> "xx", "ghost" -> "g"))
    assert(out.columns.toSet === Set("xx", "y", "g"))
    assert(out.head().isNullAt(out.columns.indexOf("g")))
  }

  test("crosswalkMap replaces tracked values, passes through untracked") {
    val df  = Seq("Mt. Oliver", "Shadyside", "Unknownville").toDF("hood")
    val out = ColumnOps.crosswalkMap(df, "hood",
      Map("Mt. Oliver" -> "Mount Oliver", "Shadyside" -> "Shadyside"))
    assert(out.as[String].collect().toSeq ===
      Seq("Mount Oliver", "Shadyside", "Unknownville"))
  }

  test("crosswalkUnmatched surfaces untracked values with counts (:476-477)") {
    val df = Seq("Mt. Oliver", "Unknownville", "Unknownville", "Lostburg", "", null)
      .toDF("hood")
    val lookup = Seq(("Mt. Oliver", "Mount Oliver")).toDF("k", "v")
    val joined = ColumnOps.crosswalkUnmatched(df, "hood", lookup, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(joined === Map("Unknownville" -> 2L, "Lostburg" -> 1L))
    val mapped = ColumnOps.crosswalkMapUnmatched(df, "hood",
      Map("Mt. Oliver" -> "Mount Oliver"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mapped === Map("Unknownville" -> 2L, "Lostburg" -> 1L))
  }

  test("convertStringCase variants (:300-323)") {
    val df = Seq("hello world").toDF("s")
    assert(ColumnOps.convertStringCase(df, "s", "upper").head().getString(0) === "HELLO WORLD")
    assert(ColumnOps.convertStringCase(df, "s", "title").head().getString(0) === "Hello World")
    assert(ColumnOps.convertStringCase(df, "s", "capitalize").head().getString(0) === "Hello world")
  }
}
