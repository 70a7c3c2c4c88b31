package graft

import graft.pipelines.TwilioPipeline
import java.nio.file.Files

class TwilioPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("transform: conditional kind, phone cast, empty→null, FINAL_COLS rename (§3.3)") {
    val raw = Seq(
      ("c1", "2024-01-01", "Inbound", "Yes", 4125551234L),
      ("c2", "2024-01-02", "Inbound", "No", 4125555678L),
      ("c3", "", "Outbound", "No", 4125550000L))
      .toDF("conversation_id", "date", "kind", "abandoned", "phone")
    val out = TwilioPipeline.transform(raw).orderBy("conversation_id").collect()
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("conversation_id", "conversation_date", "kind", "abandoned", "phone"))
    assert(out(0).getAs[String]("kind") === "Abandoned", "Abandoned==Yes overrides kind")
    assert(out(1).getAs[String]("kind") === "Inbound")
    assert(out(0).getAs[String]("phone") === "4125551234", "phone stringified")
    assert(out(2).isNullAt(1), "empty date => NULL")
  }

  test("runWindow: first run = full history, later runs resume from watermark") {
    val dir = Files.createTempDirectory("twilio").toFile
    val log = s"$dir/log.json"
    val (s1, e1) = TwilioPipeline.runWindow(log, nowUnix = 1000L)
    assert((s1, e1) === (0L, 1000L), "no log => full history")
    graft.state.Watermark.recordSuccess(log, currentRun = 1000L, recordsRetrieved = 5L)
    val (s2, e2) = TwilioPipeline.runWindow(log, nowUnix = 2000L)
    assert((s2, e2) === (1000L, 2000L), "resume from last successful run")
    // a failed run does not advance the watermark: re-running gives the same window
    val (s3, _) = TwilioPipeline.runWindow(log, nowUnix = 3000L)
    assert(s3 === 1000L)
  }
}
