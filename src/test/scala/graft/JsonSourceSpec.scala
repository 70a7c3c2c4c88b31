package graft

import graft.sources.JsonSource
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Dirty-JSON repair rules (SURVEY §7.3 hard part #5; JsonCoder
  * dataflow_utils.py:41-75 + json_linter gcs_utils.py:949-974).
  */
class JsonSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  private def read(lines: String*): (Seq[(Option[Long], Option[String])], Long) = {
    val dir = tempDir("jsrc").toFile
    val f = new java.io.File(dir, "in.json")
    Files.write(f.toPath, lines.mkString("\n").getBytes)
    val (ok, bad) = JsonSource.readRepaired(spark, f.getPath, schema)
    val rows = ok.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getAs[String]("b")))).toSeq
    (rows, bad.count())
  }

  test("clean lines pass through") {
    val (rows, bad) = read("""{"a": 1, "b": "x"}""")
    assert(rows === Seq((Some(1L), Some("x"))) && bad === 0)
  }

  test("concatenated }{ objects split into N rows (json_linter)") {
    val (rows, bad) = read("""{"a": 1, "b": "x"}{"a": 2, "b": "y"}{"a": 3, "b": "z"}""")
    assert(rows.toSet === Set((Some(1L), Some("x")), (Some(2L), Some("y")), (Some(3L), Some("z"))))
    assert(bad === 0)
  }

  test("valid rows containing repair-trigger text in string values pass untouched (parse-gated repair)") {
    // json.loads succeeds on these, so the reference never lints them
    // (dataflow_utils.py:47-73) — the ':,'/'\'' repair regexes must not
    // mutate string VALUES of rows that already parse
    val (rows, bad) = read(
      """{"a": 1, "b": "tricky :, inside"}""",
      """{"a": 2, "b": "ends with :}"}""",
      """{"a": 3, "b": "brace pair }{ in string"}""")
    assert(rows.toSet === Set(
      (Some(1L), Some("tricky :, inside")),
      (Some(2L), Some("ends with :}")),
      (Some(3L), Some("brace pair }{ in string"))))
    assert(bad === 0)
  }

  test("concatenated objects separated by whitespace split too, and a " +
    "}{ inside a string literal never splits a repairable line") {
    // '} {' — the literal-}{-only split lost every object after the first
    val (rows, bad) = read("""{"a": 1, "b": "x"}  {"a": 2, "b": "y"}""")
    assert(rows.toSet === Set((Some(1L), Some("x")), (Some(2L), Some("y"))))
    assert(bad === 0)
    // the line only fails parse for the ':,' hole; the '}{' inside the
    // quoted value must not derail the repair
    val (rows2, bad2) = read("""{"a": 4, "extra":, "b": "pair }{ here"}""")
    assert(rows2 === Seq((Some(4L), Some("pair }{ here"))))
    assert(bad2 === 0)
  }

  test("stray escaped double quotes outside a string repaired " +
    "(JsonCoder elif, dataflow_utils.py:66-73)") {
    val (rows, bad) = read("""{"a": 5, "b": \"x\"}""")
    assert(rows === Seq((Some(5L), Some("x"))))
    assert(bad === 0)
  }

  test("':,' null hole repaired (JsonCoder rule)") {
    val (rows, bad) = read("""{"a":, "b": "x"}""")
    assert(rows === Seq((None, Some("x"))) && bad === 0)
  }

  test("trailing ':}' null hole repaired") {
    val (rows, bad) = read("""{"a": 7, "b":}""")
    assert(rows === Seq((Some(7L), None)) && bad === 0)
  }

  test("stray escaped single quote removed") {
    val (rows, bad) = read("""{"a": 1, "b": "it\'s"}""")
    assert(rows === Seq((Some(1L), Some("it's"))) && bad === 0)
  }

  test("unrepairable lines land in quarantine, good lines survive") {
    val (rows, bad) = read(
      """{"a": 1, "b": "ok"}""",
      """this is not json at all""",
      """{"a": 3, "b": "fine"}""")
    assert(rows.toSet === Set((Some(1L), Some("ok")), (Some(3L), Some("fine"))))
    assert(bad === 1)
  }

  test("crash-truncated trailing object quarantines the line instead of " +
    "silently vanishing; complete leading objects still recovered") {
    val (rows, bad) = read("""{"a": 1, "b": "x"}{"a": 2""")
    assert(rows === Seq((Some(1L), Some("x"))), rows.toString)
    assert(bad === 1, "the truncated fragment must route the line to quarantine")
  }

  test("empty lines skipped silently") {
    val (rows, bad) = read("""{"a": 1, "b": "x"}""", "", "   ")
    assert(rows.length === 1 && bad === 0)
  }

  test("avscToStructType parses reference-shaped avsc files (gcs_utils.py:249-268)") {
    val avsc =
      """{"name": "qalert_requests", "type": "record", "fields": [
        |  {"name": "id", "type": ["null", "long"]},
        |  {"name": "status", "type": ["null", "string"]},
        |  {"name": "priority", "type": ["null", "integer"]},
        |  {"name": "lat", "type": ["null", "float"]},
        |  {"name": "flag", "type": "boolean"},
        |  {"name": "payload", "type": ["null", "bytes"]},
        |  {"name": "created", "type": ["null", "timestamp"]}
        |]}""".stripMargin
    val st = graft.sources.SchemaRegistry.avscToStructType(avsc)
    assert(st.fields.map(f => f.name -> f.dataType).toSeq === Seq(
      "id" -> LongType, "status" -> StringType,
      "priority" -> LongType, // reference widens integer→int64
      "lat" -> DoubleType,    // reference widens float→float64
      "flag" -> BooleanType, "payload" -> BinaryType,
      "created" -> StringType)) // unknown/logical degrades to string
    assert(st.fields.forall(_.nullable))

    // file loader round-trip
    val dir = tempDir("avsc").toFile
    val f = new java.io.File(dir, "feed.avsc")
    Files.write(f.toPath, avsc.getBytes)
    assert(graft.sources.SchemaRegistry.loadAvsc(f.getPath) === st)
  }
}
