package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ndjson reading with the reference's dirty-JSON repair semantics.
  *
  * The reference repairs malformed API payloads in two places:
  * `json_linter` (gcs_utils.py:949-974 — concatenated `}{` objects on
  * one line are split) and Beam's `JsonCoder.decode`
  * (dataflow_utils.py:41-75 — `}{` splitting, `":,"` → `": null,"`,
  * stray `\'` / `\"` escape removal).
  *
  * Spark-first shape: a distributed repair pass over `spark.read.text`
  * (pure column expressions — explode the `}{` splits, regex-fix the
  * null and escape defects), then `from_json` with the declared schema.
  * Rows that still fail to parse land in a quarantine DataFrame (the
  * reference's `slag_metal` bucket, gcs_utils.py:209-246).
  */
object JsonSource {

  /** Repair one raw line into 0..N candidate JSON object strings. */
  private def repairedObjects(line: Column): Column = {
    // `}{`-concatenation split: "{a:1}{b:2}" → ["{a:1}", "{b:2}"]
    val objects = when(line.contains("}{"),
      transform(split(line, "\\}\\{"), (part, i) =>
        concat(
          when(i =!= 0, lit("{")).otherwise(lit("")),
          part,
          when(i =!= size(split(line, "\\}\\{")) - 1, lit("}")).otherwise(lit("")))))
      .otherwise(array(line))
    // ":," → ": null," and stray escaped quotes (JsonCoder rules)
    transform(objects, o =>
      regexp_replace(
        regexp_replace(
          regexp_replace(o, ":\\s*,", ": null,"),
          "\\\\'", "'"),
        ":\\s*\\}", ": null}"))
  }

  /** Read ndjson with repair; returns (parsed, quarantine).
    * Quarantined rows keep the raw line for the dead-letter sink.
    *
    * Repair is parse-gated, matching the reference's order
    * (JsonCoder.decode tries `json.loads` FIRST and only lints lines
    * that throw, dataflow_utils.py:47-73): a valid row whose string
    * values happen to contain `":,"` or `\'` must pass through
    * untouched. Only lines whose first parse fails get the repair
    * pass and a second parse; rows still failing are quarantined.
    */
  def readRepaired(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val raw = spark.read.text(path).filter(length(trim(col("value"))) > 0)
    // quarantine detection via the corrupt-record column: Spark 4's
    // from_json yields an all-null row (not a NULL struct) for
    // malformed input, so a declared _corrupt field is the reliable
    // signal — it is non-null exactly for unparseable objects
    val corrupt   = "__corrupt"
    val augmented = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val opts      = new java.util.HashMap[String, String]()
    opts.put("columnNameOfCorruptRecord", corrupt)
    // Jackson (from_json) accepts trailing data after the first object,
    // where the reference's json.loads raises "Extra data" — so a
    // concatenated "}{"-line would wrongly pass the first parse and lose
    // its tail. Detect multi-object lines structurally: with every JSON
    // string literal stripped, `}` adjacent to `{` (over whitespace)
    // cannot occur in a single valid value — while a "}{" INSIDE a
    // quoted string (valid row) is stripped first and never triggers.
    val multiObject =
      regexp_replace(col("value"), "\"([^\"\\\\]|\\\\.)*\"", "\"\"").rlike("\\}\\s*\\{")
    val firstPass = raw.withColumn("__parsed", from_json(col("value"), augmented, opts))
    val okDirect = firstPass.filter(col(s"__parsed.$corrupt").isNull && !multiObject)
      .select(col("__parsed.*")).drop(corrupt)
    val needRepair = firstPass.filter(col(s"__parsed.$corrupt").isNotNull || multiObject)
      .select(col("value").as("__raw"))
    val reparsed = needRepair
      .select(col("__raw"), explode(repairedObjects(col("__raw"))).as("__obj"))
      .withColumn("__parsed", from_json(col("__obj"), augmented, opts))
    val okRepaired = reparsed.filter(col(s"__parsed.$corrupt").isNull)
      .select(col("__parsed.*")).drop(corrupt)
    val bad = reparsed.filter(col(s"__parsed.$corrupt").isNotNull)
      .select(col("__raw").as("raw_line")).distinct()
    (okDirect.unionByName(okRepaired), bad)
  }
}
