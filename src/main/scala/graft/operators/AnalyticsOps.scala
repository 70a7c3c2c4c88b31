package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-log product analytics: cohort retention and ordered funnels —
  * the classic warehouse queries every analytics engine ships (the
  * reference's Dashburgh/report families are the same genus: grouped
  * time-bucketed counts over an activity log).
  */
object AnalyticsOps {

  /** Cohort retention matrix: users are cohorted by the calendar day
    * of their FIRST event; `n_users` counts how many members of each
    * cohort were active again `day_offset` days later (offset 0 is
    * the cohort's own size).
    *
    * Scale shape: ONE shuffle keyed on the user — `collect_set` of
    * active days partial-aggregates map-side (set union), and a
    * user's distinct-active-day set is bounded by the calendar (≤
    * 3 653 entries for a 10-year log), so the buffer per key is small
    * and skew-proof however many raw events a user has. The exploded
    * (cohort, offset) frame then aggregates with map-side combine.
    * Each (user → cohort_day, day) pair appears exactly once after
    * the set-union, so `count(*)` IS the distinct-user count — no
    * count-distinct machinery needed.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val perUser = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .groupBy("__u")
      .agg(min(col("__d")).as("cohort_day"), collect_set(col("__d")).as("__days"))
    perUser
      .select(col("cohort_day"), explode(col("__days")).as("__d"))
      .withColumn("day_offset", datediff(col("__d"), col("cohort_day")).cast(LongType))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered conversion funnel: `steps` is the required event-type
    * sequence; a user reaches step i+1 only with an event of that type
    * STRICTLY AFTER their step-i completion time (earliest-completion
    * semantics: each step's completion is the min qualifying
    * timestamp, which maximizes the users who can reach later steps).
    * Returns one row per step: (step_idx 1-based, step, n_users).
    *
    * Scale shape: per step, one filter on the event type (pushed to
    * the scan), one join keyed on the user against the previous
    * step's (user, ts) frame — #users rows at most, shrinking every
    * step — and one min-aggregation keyed on the user. Stages run
    * EAGERLY (one count action each): each stage frame is persisted
    * only while the next stage consumes it, then released — no cache
    * handles survive the call, so repeated invocations (bench loops,
    * dashboards) cannot accumulate state. The k-row result frame is
    * driver-built, like every fixed-row report in this engine.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    var prev: Option[DataFrame] = None
    val rows = steps.zipWithIndex.map { case (step, i) =>
      val hits = events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      val reached = prev match {
        case None =>
          hits.groupBy("__u").agg(min(col("__ts")).as("__t"))
        case Some(p) =>
          hits.join(p, "__u")
            .filter(col("__ts") > col("__t"))
            .groupBy("__u").agg(min(col("__ts")).as("__t"))
      }
      reached.persist()
      val n = reached.count() // materializes before prev is released
      prev.foreach(_.unpersist())
      prev = Some(reached)
      (i + 1, step, n)
    }
    prev.foreach(_.unpersist())
    import spark.implicits._
    rows.toDF("step_idx", "step", "n_users")
  }
}
