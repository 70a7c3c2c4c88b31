package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Incremental-ingest watermark state.
  *
  * The reference persists `successful_run_log/log.json` with
  * `{requests_retrieved, since, current_run, note}` and writes it only
  * AFTER a successful run (qalert_requests_gcs.py:27,62-68;
  * find_last_successful_run gcs_utils.py:893-904). A failed run leaves
  * the previous watermark in place, so the next run re-pulls the same
  * window — at-least-once with downstream dedup.
  *
  * Batch-incremental Spark analog: a tiny JSON state file read at job
  * start, atomically replaced (write-temp + move) at job end.
  */
object Watermark {

  final case class RunLog(since: Long, currentRun: Long, recordsRetrieved: Long)

  private val SinceRe   = "\"since\"\\s*:\\s*(\\d+)".r
  private val CurrentRe = "\"current_run\"\\s*:\\s*(\\d+)".r
  private val CountRe   = "\"records_retrieved\"\\s*:\\s*(\\d+)".r

  /** Read the last successful run's watermark; `default` (e.g. the
    * backfill epoch) when no log exists — the reference's
    * `find_backfill_date` fallback (airflow_utils.py:250-308).
    */
  def lastSuccessfulRun(path: String, default: Long = 0L): RunLog = {
    val p = Paths.get(path)
    if (!Files.exists(p)) RunLog(default, default, 0L)
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      RunLog(
        SinceRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(default),
        CurrentRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(default),
        CountRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L))
    }
  }

  /** Record a successful run: the next run's `since` is this run's
    * `current_run`. Atomic replace so a crash mid-write cannot corrupt
    * the watermark.
    */
  def recordSuccess(path: String, currentRun: Long, recordsRetrieved: Long): Unit = {
    val prev = lastSuccessfulRun(path)
    val json =
      s"""{"since": ${prev.currentRun}, "current_run": $currentRun, "records_retrieved": $recordsRetrieved}"""
    val p   = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
