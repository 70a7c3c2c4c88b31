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
    val dir = tempDir("twilio").toFile
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

  test("findBackfillDate: log lost => resume from the newest non-empty " +
    "file in the latest populated month partition, else yesterday") {
    import graft.state.Watermark
    val root = tempDir("backfill").toFile.getAbsolutePath
    val asOf = java.time.LocalDate.of(2024, 3, 15)
    // nothing listed anywhere => the reference's yesterday fallback
    assert(Watermark.findBackfillDate(root, asOf) === asOf.minusDays(1))
    // 2024/03 holds only a ZERO-byte drop (failed upload — reference
    // skips size-0 blobs); 2024/01 holds a real file: the probe must
    // walk past 03 and 02 and answer with 01's file date
    val mar = new java.io.File(s"$root/2024/03"); mar.mkdirs()
    val empty = new java.io.File(mar, "part-0000.ndjson")
    empty.createNewFile()
    val jan = new java.io.File(s"$root/2024/01"); jan.mkdirs()
    val real = new java.io.File(jan, "part-0000.ndjson")
    Files.write(real.toPath, "row".getBytes("UTF-8"))
    val stamp = java.time.LocalDate.of(2024, 1, 20)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    real.setLastModified(stamp)
    assert(Watermark.findBackfillDate(root, asOf) ===
      java.time.LocalDate.of(2024, 1, 20))
    // the year floor bounds the walk: asOf already at the floor year
    // probes nothing and falls back
    assert(Watermark.findBackfillDate(root,
      java.time.LocalDate.of(2017, 6, 1)) ===
      java.time.LocalDate.of(2017, 5, 31))
  }
}
