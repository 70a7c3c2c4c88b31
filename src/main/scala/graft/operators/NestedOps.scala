package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-payload operators (SURVEY §2.3): dotted-path extraction,
  * list-of-structs search extraction, and the Computronix xref
  * flattening — all higher-order-function / nested-access expressions,
  * no UDFs.
  */
object NestedOps {

  /** ExtractField (dataflow_utils.py:326-341 + extract_field
    * :1086-1156): pull a nested path (up to 2 levels below
    * `sourceField`) into a new top-level string field; missing path or
    * empty value → NULL.
    */
  def extractField(df: DataFrame, sourceField: String, nestedField: String,
                   newFieldName: String, additionalNestedField: String = ""): DataFrame = {
    val path =
      if (additionalNestedField.nonEmpty)
        col(sourceField).getField(nestedField).getField(additionalNestedField)
      else col(sourceField).getField(nestedField)
    val v = path.cast(StringType)
    df.withColumn(newFieldName, when(v === "", lit(null)).otherwise(v))
  }

  /** ExtractFieldWithComplexity (dataflow_utils.py:344-361 +
    * :1086-1202): `sourceField` is an ARRAY of structs; select the
    * element to extract from by:
    *  - `searchKey`/`searchValue`: first element whose `searchKey`
    *    equals `searchValue`; if none match, fall back to the element
    *    with the MAX value of `searchKey` (the reference's
    *    most-recent-record fallback);
    * then pull `nestedField` (and optionally
    * `additionalNestedField`) from it as a string. Used 29× by
    * cherwell_incidents_dataflow.py:39-74.
    */
  /** The column expression behind `extractFromStructList`, usable
    * directly so many extracts can share one projection.
    */
  def structListExtractExpr(
      sourceField: String, searchKey: String, searchValue: String,
      nestedField: String, additionalNestedField: String = ""): Column = {
    val arr = col(sourceField)
    val matched = filter(arr, x => x.getField(searchKey) === searchValue)
    val fallback = filter(arr, x =>
      x.getField(searchKey) === array_max(transform(arr, y => y.getField(searchKey))))
    val chosen = when(size(matched) > 0, try_element_at(matched, lit(1)))
      .otherwise(try_element_at(fallback, lit(1)))
    val v0 = chosen.getField(nestedField)
    val v  = if (additionalNestedField.nonEmpty) v0.getField(additionalNestedField) else v0
    val s  = v.cast(StringType)
    when(s === "", lit(null)).otherwise(s)
  }

  def extractFromStructList(
      df: DataFrame, sourceField: String,
      searchKey: String, searchValue: String,
      nestedField: String, newFieldName: String,
      additionalNestedField: String = ""): DataFrame =
    df.withColumn(newFieldName, structListExtractExpr(
      sourceField, searchKey, searchValue, nestedField, additionalNestedField))

  /** Batch form of `extractFromStructList`: all pulls in ONE appended
    * projection. Cherwell does 29 of these over the same array — as a
    * fold of withColumn calls that is 29 full-plan re-analyses
    * (seconds of pure planning); as one select it is one.
    */
  def extractAllFromStructList(
      df: DataFrame, sourceField: String, searchKey: String,
      valueField: String, specs: Seq[(String, String)]): DataFrame = {
    val outs = specs.map { case (searchValue, out) =>
      structListExtractExpr(sourceField, searchKey, searchValue, valueField).as(out)
    }
    df.select(col("*") +: outs: _*)
  }

  /** Field-absence search variant: first element where `absentField`
    * is NULL (the reference checks `search_field not in d` — its "this
    * field marks an unwanted record" form).
    */
  def extractWhereFieldAbsent(
      df: DataFrame, sourceField: String, absentField: String,
      nestedField: String, newFieldName: String): DataFrame = {
    val matched = filter(col(sourceField), x => x.getField(absentField).isNull)
    val s = try_element_at(matched, lit(1)).getField(nestedField).cast(StringType)
    df.withColumn(newFieldName, when(s === "", lit(null)).otherwise(s))
  }

  /** UnNestFields (computronix_pli_permits_wprdc_dataflow.py:24-49):
    * flatten the Computronix xref nesting
    * `base → XREF[0] → TABLE → XREF2[0] → TABLE2`, merging the inner
    * structs' fields into the row; a missing xref level leaves the
    * named fields NULL (the reference's IndexError branch).
    */
  def unNestXref(df: DataFrame, xref1: String, table1: String,
                 fields1: Seq[String],
                 xref2: String = "", table2: String = "",
                 fields2: Seq[String] = Nil): DataFrame = {
    // one withColumns projection per level: a per-field withColumn
    // fold re-analyzes the whole plan and inlines a fresh copy of the
    // xref extraction subtree once per field
    val inner1 = try_element_at(col(xref1), lit(1)).getField(table1)
    val step1 = df.withColumns(fields1.map(f => f -> inner1.getField(f)).toMap)
    if (xref2.isEmpty) step1
    else {
      val inner2 = try_element_at(inner1.getField(xref2), lit(1)).getField(table2)
      step1.withColumns(fields2.map(f => f -> inner2.getField(f)).toMap)
    }
  }

  /** unnest_domi_street_seg (gcs_utils.py:597-662): permits → one row
    * per street segment, duplicating parent fields, with 1-based
    * `segment_num` and `total_segments` counters. The reference had to
    * move this OUT of Beam because of fusion/concurrency bugs; in
    * Spark it is a plain `posexplode`.
    */
  def unnestWithCounters(df: DataFrame, arrayCol: String,
                         elemName: String): DataFrame =
    df.withColumn("total_segments", size(col(arrayCol)))
      .select(col("*"), posexplode_outer(col(arrayCol)))
      .withColumnsRenamed(Map("pos" -> "segment_num", "col" -> elemName))
      .withColumn("segment_num", col("segment_num") + 1)
      .drop(arrayCol)
}
