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

  /** Split a line into its top-level JSON objects with a brace/string
    * scanner: depth tracked OUTSIDE string literals (escape-aware), so
    * `}{` inside a quoted value never splits, and any run of
    * whitespace between concatenated objects is handled (the naive
    * literal-"}{" split lost every object after the first on "} {"
    * lines, and corrupted lines whose only defect was elsewhere).
    * A line with no complete top-level object (unbalanced braces or an
    * unterminated string) comes back whole and fails the re-parse into
    * quarantine.
    */
  private[sources] def splitTopLevelObjects(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var esc = false; var start = -1
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => if (depth > 0) inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += line.substring(start, i + 1); start = -1 }
          if (depth < 0) depth = 0
        case _ => ()
      }
      i += 1
    }
    // an incomplete trailing object (crash-truncated line, unterminated
    // string) must come back as the failing fragment, not vanish: its
    // re-parse failure is what routes the loss into quarantine —
    // dropping it here would silently lose the record
    if (start >= 0) out += line.substring(start)
    if (out.isEmpty) Seq(line) else out.toSeq
  }

  /** The JsonCoder repair rules per object: ":," / ":}" → null values,
    * then the stray-escape fixes in the reference's order — `\'`
    * always, `\"` only when no `\'` was present (JsonCoder.decode's
    * elif, dataflow_utils.py:60-73).
    */
  private[sources] def repairObject(o: String): String = {
    val f = o.replaceAll(":\\s*,", ": null,").replaceAll(":\\s*\\}", ": null}")
    if (f.contains("\\'")) f.replace("\\'", "'")
    else if (f.contains("\\\"")) f.replace("\\\"", "\"")
    else f
  }

  /** Repair one raw line into 0..N candidate JSON object strings.
    * A procedural scanner UDF is the right tool here (stateful
    * character scan); it runs ONLY on lines whose first parse failed —
    * the hot path stays pure expressions.
    */
  private val repairUdf = udf((line: String) =>
    if (line == null) Array.empty[String]
    else splitTopLevelObjects(line).map(repairObject).toArray)

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
      .select(col("__raw"), explode(repairUdf(col("__raw"))).as("__obj"))
      .withColumn("__parsed", from_json(col("__obj"), augmented, opts))
    val okRepaired = reparsed.filter(col(s"__parsed.$corrupt").isNull)
      .select(col("__parsed.*")).drop(corrupt)
    val bad = reparsed.filter(col(s"__parsed.$corrupt").isNotNull)
      .select(col("__raw").as("raw_line")).distinct()
    (okDirect.unionByName(okRepaired), bad)
  }
}
