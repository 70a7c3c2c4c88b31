package graft

import graft.operators.AnalyticsOps
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("cohortRetention: first-day cohorts, per-day activity deduped, " +
    "offset-0 row is the cohort size") {
    val events = Seq(
      // u1: cohort Jan 1, active Jan 1 (x2 events), Jan 2, Jan 4
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-01 21:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-04 12:00:00")),
      // u2: cohort Jan 1, never returns
      (2L, ts("2024-01-01 10:00:00")),
      // u3: cohort Jan 2, returns Jan 4
      (3L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-04 23:00:00"))).toDF("user_id", "ts")
    val out = AnalyticsOps.cohortRetention(events)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L, // u1 + u2
      ("2024-01-01", 1L) -> 1L, // u1
      ("2024-01-01", 3L) -> 1L, // u1
      ("2024-01-02", 0L) -> 1L, // u3
      ("2024-01-02", 2L) -> 1L)) // u3
  }

  test("funnel: strictly-after ordering, same-timestamp events do NOT " +
    "advance, off-path users drop at the right stage") {
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, "view", ts("2024-01-01 08:00:00")),
      (1L, "click", ts("2024-01-01 08:05:00")),
      (1L, "purchase", ts("2024-01-01 08:10:00")),
      // u2's only click precedes the first view — stalls at view
      (2L, "click", ts("2024-01-01 07:00:00")),
      (2L, "view", ts("2024-01-01 09:00:00")),
      // u3's purchase precedes the click — stalls at click
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:30:00")),
      (3L, "click", ts("2024-01-01 09:00:00")),
      // u4 never views — never enters the funnel
      (4L, "purchase", ts("2024-01-01 08:00:00")),
      // u5's click shares the view's timestamp — strictly-after
      // semantics reject it
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = AnalyticsOps.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1, "view", 4L),     // u1, u2, u3, u5
      (2, "click", 2L),    // u1, u3 (u5's same-ts click rejected)
      (3, "purchase", 1L)) // u1
    )
  }

  test("funnel: earliest-completion semantics pick the min qualifying " +
    "event at every stage") {
    // u1 has two views; the click sits between them — only the
    // earliest view matters, so the click qualifies
    val events = Seq(
      (1L, "view", ts("2024-01-01 08:00:00")),
      (1L, "click", ts("2024-01-01 08:30:00")),
      (1L, "view", ts("2024-01-01 09:00:00"))).toDF("user_id", "event_type", "ts")
    val out = AnalyticsOps.funnel(events, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(out === Map(1 -> 1L, 2 -> 1L))
  }
}
