package graft.state

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

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
  * start and replaced at job end through the Hadoop `FileSystem` of
  * the path — the production watermark lives on shared storage
  * (HDFS/object store), not an executor-local disk. Replacement is
  * write-temp → current-to-`.old` → temp-to-current; a crash between
  * the renames leaves `.old`, which the reader falls back to, so the
  * previous watermark is never lost (the reference's own contract).
  */
object Watermark {

  final case class RunLog(since: Long, currentRun: Long, recordsRetrieved: Long)

  private val SinceRe   = "\"since\"\\s*:\\s*(\\d+)".r
  private val CurrentRe = "\"current_run\"\\s*:\\s*(\\d+)".r
  // the reference's per-feed loaders each name the count after their
  // noun ("requests_retrieved" qalert_gcs.py:97, etc.); accept any
  // *_retrieved key so pointing at a migrated production log does not
  // silently read the count as 0, and write the generic form
  private val CountRe   = "\"[A-Za-z_]*retrieved\"\\s*:\\s*(\\d+)".r

  private def fsFor(path: String): FileSystem = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    new HPath(path).getFileSystem(conf)
  }

  private def readAll(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Read the last successful run's watermark; `default` (e.g. the
    * backfill epoch) when no log exists — the reference's
    * `find_backfill_date` fallback (airflow_utils.py:250-308). Falls
    * back to the `.old` snapshot if a crashed replace left no current
    * file.
    */
  def lastSuccessfulRun(path: String, default: Long = 0L): RunLog = {
    val fs = fsFor(path)
    Seq(new HPath(path), new HPath(path + ".old")).find(fs.exists) match {
      case None => RunLog(default, default, 0L)
      case Some(p) =>
        val s = readAll(fs, p)
        RunLog(
          SinceRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(default),
          CurrentRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(default),
          CountRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L))
    }
  }

  /** Record a successful run: the next run's `since` is this run's
    * `current_run`. Write-temp + two renames; the previous watermark
    * survives any single crash point (as current or as `.old`).
    */
  def recordSuccess(path: String, currentRun: Long, recordsRetrieved: Long): Unit = {
    val prev = lastSuccessfulRun(path)
    val json =
      s"""{"since": ${prev.currentRun}, "current_run": $currentRun, "records_retrieved": $recordsRetrieved}"""
    val fs  = fsFor(path)
    val p   = new HPath(path)
    val tmp = new HPath(path + ".tmp")
    val old = new HPath(path + ".old")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Hadoop rename/delete signal failure by RETURNING false; an
    // unchecked false here would silently drop the watermark update
    // (java.nio Files.move threw at the same point) — fail loudly so
    // the run is not recorded successful without its watermark
    def mustRename(src: HPath, dst: HPath): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"watermark rename $src -> $dst failed")
    if (fs.exists(p)) {
      if (fs.exists(old) && !fs.delete(old, false))
        throw new java.io.IOException(s"watermark delete $old failed")
      mustRename(p, old)
    }
    mustRename(tmp, p)
  }

  /** Listing-based backfill-date inference — the reference's
    * `find_backfill_date` (airflow_utils.py:250-308): when the run log
    * is MISSING (lost state, first deploy), infer the resume date from
    * the date-partitioned output tree itself. Walk month prefixes
    * `<dir>/yyyy/MM` backwards from `asOf`'s month while year >
    * `earliestYear` (the reference's hard 2017 floor); the first month
    * holding at least one NON-EMPTY file (the reference's size > 0 kb
    * guard — zero-byte drops are failed uploads) answers with the
    * LATEST modification date among those files; if no month
    * qualifies, fall back to yesterday (asOf − 1 day), the reference's
    * terminal default. Timestamps resolve in UTC — the engine-wide
    * session timezone — where the reference used the feed's local tz.
    *
    * Scale shape: driver-side metadata listing of at most one month
    * prefix per probe (never the whole tree), bounded by the year
    * floor; no data is read.
    */
  def findBackfillDate(dirPath: String, asOf: java.time.LocalDate,
                       earliestYear: Int = 2017): java.time.LocalDate = {
    val fs = fsFor(dirPath)
    var ym = java.time.YearMonth.from(asOf)
    while (ym.getYear > earliestYear) {
      val prefix = new HPath(
        f"$dirPath/${ym.getYear}%04d/${ym.getMonthValue}%02d")
      if (fs.exists(prefix)) {
        val it = fs.listFiles(prefix, true)
        var latest = Long.MinValue
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getLen > 0 && st.getModificationTime > latest)
            latest = st.getModificationTime
        }
        if (latest != Long.MinValue)
          return java.time.Instant.ofEpochMilli(latest)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate
      }
      ym = ym.minusMonths(1)
    }
    asOf.minusDays(1)
  }
}
