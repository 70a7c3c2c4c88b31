package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Declared-schema registry.
  *
  * The reference keeps one flat, nullable-by-default Avro schema per
  * feed in a GCS bucket and drives three consumers from it — Avro
  * writing, BQ table creation, pandas loads (SURVEY §1.3;
  * dataflow_utils.py:836-841 `get_schema`, gcs_utils.py:249-268
  * `conv_avsc_to_bq_schema`). Here the registry holds `StructType`s:
  * one source of truth per feed for read enforcement and write
  * validation.
  */
object SchemaRegistry {

  /** A feed descriptor: schema + the semantic column roles the
    * pipelines need (keys, event-time, PII columns).
    */
  final case class Feed(
      name: String,
      schema: StructType,
      keyFields: Seq[String],
      timeFields: Seq[String] = Nil,
      piiFields: Seq[String] = Nil)

  /** All fields nullable — the reference's `["null", T]` unions. */
  def flatSchema(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  /** Parse a flat Avro `.avsc` record schema (the reference's external
    * schema artifacts: `get_schema` dataflow_utils.py:836-841,
    * `conv_avsc_to_bq_schema` gcs_utils.py:249-268) into a
    * `StructType`. Union types drop `"null"` and take the first
    * remaining branch; the BQ-oriented widenings from the reference
    * apply (`integer`→int64, `float`→float64). Unknown/logical types
    * degrade to string, matching the reference's pandas-load behavior.
    */
  def avscToStructType(avscJson: String): StructType = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(avscJson)
    val fields = root \ "fields" match {
      case JArray(fs) => fs
      case _ => throw new IllegalArgumentException("avsc has no fields array")
    }
    StructType(fields.map { f =>
      val name = f \ "name" match {
        case JString(s) => s
        case _ => throw new IllegalArgumentException(s"avsc field without name: $f")
      }
      val branches = f \ "type" match {
        case JString(t) => Seq(t)
        case JArray(ts) => ts.collect { case JString(t) => t }
        case _ => Nil
      }
      val tpe = branches.filterNot(_ == "null").headOption.getOrElse("string")
      StructField(name, avroTypeToSpark(tpe), nullable = true)
    })
  }

  /** Load + parse an `.avsc` file through the Hadoop `FileSystem` of
    * the path — schema files live beside the data on shared storage
    * (HDFS/object store) in production, not on a local disk.
    */
  def loadAvsc(path: String): StructType = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p  = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try avscToStructType(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  private def avroTypeToSpark(t: String): DataType = t match {
    case "string" => StringType
    case "int" | "integer" => LongType // reference widens to int64
    case "long" => LongType
    case "float" | "double" => DoubleType // reference widens to float64
    case "boolean" => BooleanType
    case "bytes" => BinaryType
    case _ => StringType
  }

  /** Schema-enforced ndjson read (with dirty-JSON repair). */
  def readFeed(spark: SparkSession, feed: Feed, path: String): (DataFrame, DataFrame) =
    JsonSource.readRepaired(spark, path, feed.schema)

  /** Write-side validation: select-cast to the declared schema — the
    * analog of the reference's Avro-schema validation on write. Extra
    * columns are an error; missing columns are an error (declared
    * schemas are exact); types are cast.
    */
  def conformToSchema(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    val want = schema.fields.map(_.name).toSet
    val missing = want -- have
    require(missing.isEmpty, s"missing declared columns: ${missing.mkString(", ")}")
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  /** The flagship 311-requests feed (FIXTURES.md §1 /
    * qalert_requests_dataflow.py:80-103 rename-target shape).
    */
  val qalertRequests: Feed = Feed(
    name = "qalert_requests",
    schema = flatSchema(
      "id" -> LongType,
      "parent_ticket_id" -> LongType,
      "status_code" -> IntegerType,
      "request_type_id" -> LongType,
      "request_type_name" -> StringType,
      "create_date_unix" -> LongType,
      "last_action_unix" -> LongType,
      "closed_date_unix" -> LongType,
      "street_num" -> StringType,
      "street_name" -> StringType,
      "cross_street_name" -> StringType,
      "city" -> StringType,
      "pii_lat" -> DoubleType,
      "pii_long" -> DoubleType,
      "pii_comments" -> StringType,
      "pii_private_notes" -> StringType,
      "origin" -> StringType,
      "dept" -> StringType),
    keyFields = Seq("id"),
    timeFields = Seq("create_date_unix", "last_action_unix", "closed_date_unix"),
    piiFields = Seq("pii_lat", "pii_long", "pii_comments", "pii_private_notes"))
}
