package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * STRICTLY AFTER their step-i completion time. Semantics are
    * EARLIEST-COMPLETION ANCHORED: each step's completion is the min
    * qualifying timestamp. Without a window this maximizes the users
    * who can reach later steps; WITH `maxGapSecs` it is the standard
    * first-touch product-analytics convention — the window measures
    * from the EARLIEST completion of the previous step, so a user
    * whose only in-window path runs through a LATER occurrence of
    * that step does not count (A@10:00, A@15:00, B@15:30 with a 1 h
    * window: anchored at 10:00, no conversion). Sequence-scan
    * semantics that try every anchor are a different, stateful
    * operator. The q139 oracle implements this same anchored rule.
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
             typeCol: String = "event_type",
             maxGapSecs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSecs.forall(_ > 0), "conversion window must be positive")
    val spark = events.sparkSession
    var prev: Option[DataFrame] = None
    val rows = steps.zipWithIndex.map { case (step, i) =>
      val hits = events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      val reached = prev match {
        case None =>
          hits.groupBy("__u").agg(min(col("__ts")).as("__t"))
        case Some(p) =>
          // strictly after the previous completion, and — when a
          // conversion window is set — within maxGapSecs of it (the
          // "converted within 24 h" product metric)
          val inWindow = maxGapSecs match {
            case Some(g) => col("__ts") > col("__t") &&
              unix_micros(col("__ts")) - unix_micros(col("__t")) <= g * 1000000L
            case None => col("__ts") > col("__t")
          }
          hits.join(p, "__u")
            .filter(inWindow)
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

  /** Gap-based sessionization WITHOUT an unbounded per-user window —
    * the scale-safe twin of the classic gaps-and-islands query (q33):
    * a new session starts when the gap since the user's previous event
    * exceeds `gapSecs`. The naive form partitions a window by user, so
    * one bot account with a billion events serializes through a single
    * task; here every corpus-sized partition is keyed by (user, time
    * bucket) instead:
    *
    *  1. events bucket on `floor(unix_micros(ts) / bucketSecs)`; all
    *     within-bucket gap flags come from a window over (user,
    *     bucket) — bounded by one user's events in one bucket (a day
    *     by default), never their lifetime.
    *  2. per-(user, bucket) summaries (first/last ts, local start
    *     count) roll up with map-side combine; the ONLY per-user
    *     window runs over this summary frame, which is CALENDAR-
    *     bounded (≤ timespan/bucketSecs rows per user, ~3.7k for ten
    *     years of daily buckets) regardless of event volume. It
    *     decides whether each bucket's first event continues the
    *     previous bucket's last session (empty buckets in between are
    *     simply absent rows — the lag still compares real timestamps)
    *     and assigns each bucket its session-count offset.
    *  3. offsets join back on (user, bucket) — the same key the data
    *     already shuffled on — and each event's 1-based `session_seq`
    *     is its bucket offset plus the running start count within the
    *     bucket (the two-level cumsum shape, per user).
    *
    * Ordering is total: (ts, idCol) breaks timestamp ties, so the
    * result is layout-independent. Returns one row per session:
    * (user, session_seq, n_events, first_ts_us, last_ts_us) with the
    * bounds as epoch-microsecond BIGINTs (engine-portable — no
    * timestamp-zone re-interpretation on the comparison path).
    */
  def sessionizeBucketed(events: DataFrame, gapSecs: Long,
                         bucketSecs: Long = 86400L,
                         userCol: String = "user_id", tsCol: String = "ts",
                         idCol: String = "event_id"): DataFrame = {
    require(gapSecs > 0 && bucketSecs > 0, "gap and bucket must be positive")
    val gapUs = gapSecs * 1000000L
    val e = events.select(
      col(userCol).as("__u"), col(idCol).as("__id"),
      unix_micros(col(tsCol)).as("__ts"))
      .withColumn("__b", expr(s"__ts div ${bucketSecs * 1000000L}L"))
    val wB = Window.partitionBy("__u", "__b").orderBy("__ts", "__id")
    val flagged = e
      .withColumn("__prev", lag("__ts", 1).over(wB))
      .withColumn("__localStart",
        when(col("__prev").isNotNull && col("__ts") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
    // bucket summary: calendar-bounded per user, so this per-user
    // window can never see a corpus-sized partition
    val wU = Window.partitionBy("__u").orderBy("__b")
    val buckets = flagged.groupBy("__u", "__b")
      .agg(min("__ts").as("__first"), max("__ts").as("__last"),
        sum("__localStart").as("__nLocal"))
      .withColumn("__prevLast", lag("__last", 1).over(wU))
      .withColumn("__bStart",
        (col("__prevLast").isNull || col("__first") - col("__prevLast") > gapUs)
          .cast(LongType))
      .withColumn("__off", coalesce(
        sum(col("__nLocal") + col("__bStart"))
          .over(wU.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__u", "__b", "__bStart", "__off")
    val seq = flagged.join(buckets, Seq("__u", "__b"))
      .withColumn("__start",
        when(col("__prev").isNull, col("__bStart")).otherwise(col("__localStart")))
      .withColumn("session_seq", col("__off") +
        sum("__start").over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    seq.groupBy(col("__u").as(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min("__ts").as("first_ts_us"), max("__ts").as("last_ts_us"))
  }

  /** Event-type transition matrix (the path/Markov analysis behind
    * every "user flow" report): counts of consecutive (from → to)
    * event-type pairs per user, ordered by (ts, id). Scale-safe the
    * same way [[sessionizeBucketed]] is: within-bucket transitions
    * come from a lag over (user, time bucket); the ONE cross-bucket
    * transition per bucket boundary comes from the calendar-bounded
    * per-user bucket summary (first/last event type per bucket via
    * struct min/max — the id tie-break makes both total-order
    * deterministic). No unbounded per-user partition anywhere.
    */
  def transitionCounts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", idCol: String = "event_id",
                       typeCol: String = "event_type",
                       bucketSecs: Long = 86400L): DataFrame = {
    require(bucketSecs > 0, "bucket must be positive")
    val e = events.select(
      col(userCol).as("__u"), col(idCol).as("__id"),
      unix_micros(col(tsCol)).as("__ts"), col(typeCol).as("__t"))
      .withColumn("__b", expr(s"__ts div ${bucketSecs * 1000000L}L"))
    val wB = Window.partitionBy("__u", "__b").orderBy("__ts", "__id")
    val within = e.withColumn("__p", lag("__t", 1).over(wB))
      .filter(col("__p").isNotNull)
      .select(col("__p").as("from_type"), col("__t").as("to_type"))
    val wU = Window.partitionBy("__u").orderBy("__b")
    val boundary = e.groupBy("__u", "__b")
      .agg(min(struct(col("__ts"), col("__id"), col("__t"))).as("__first"),
        max(struct(col("__ts"), col("__id"), col("__t"))).as("__last"))
      .withColumn("__prevLastT", lag(col("__last.__t"), 1).over(wU))
      .filter(col("__prevLastT").isNotNull)
      .select(col("__prevLastT").as("from_type"),
        col("__first.__t").as("to_type"))
    within.unionByName(boundary)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Lead–lag cross-correlation matrix: for every unordered group
    * pair and every lag in [−maxLag, maxLag], the Pearson correlation
    * of a's daily count against b's count `lag` days LATER — the
    * "does A's spike predict B's" report (q146's zero-lag correlation
    * generalized along the time axis). Same dense zero-filled grid
    * and exact Decimal(38,0) moments as q146; alignment is integer
    * day arithmetic, one closing double expression per cell.
    *
    * Scale shape: the corpus collapses to the daily count frame; the
    * pair×lag fan-out is (#groups × 2·maxLag+1) on a calendar-bounded
    * grid. No windows.
    */
  def leadLagCorrelation(events: DataFrame,
                         groupCol: String = "event_type",
                         tsCol: String = "ts", maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 30, s"maxLag out of range: $maxLag")
    val spark0 = events.sparkSession
    import spark0.implicits._
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("__day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "__day"), "left")
      .select(col("__g"),
        datediff(col("__day"), lit("1970-01-01").cast(DateType))
          .cast(LongType).as("__d"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    val lags = broadcast((-maxLag to maxLag).toDF("lag"))
    val a = dense.select(col("__g").as("group_a"), col("__d"),
      col("__n").as("__x"))
    val b = dense.select(col("__g").as("group_b"), col("__d").as("__db"),
      col("__n").as("__y"))
    val dec = DecimalType(38, 0)
    val out = a.crossJoin(lags)
      .join(b, col("__db") === col("__d") + col("lag"))
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b", "lag")
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
      .withColumn("__vx",
        col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__vy",
        col("n_days") * col("__syy") - col("__sy") * col("__sy"))
      .select(col("group_a"), col("group_b"), col("lag"), col("n_days"),
        // e6 floor lattice, not round(_, 6): a correlation numerator
        // is a difference of near-equal exact sums — on uncorrelated
        // series it cancels to a ±ε residue, the signed-zero round()
        // hazard (VERDICT r15 #2)
        graft.functions.Lattice.e6(when(col("__vx") > 0 && col("__vy") > 0,
          (col("n_days") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double")
            / sqrt(col("__vx").cast("double") * col("__vy").cast("double"))))
          .as("pearson_r"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Single-changepoint detection by binary segmentation: for each
    * group's daily count series (dense zero-filled calendar grid),
    * the split boundary minimizing SSE_left + SSE_right — equivalently
    * maximizing the variance-reduction gain over the unsplit series.
    * Cumulative count/sum/sum-of-squares run as exact integer window
    * folds over the calendar-bounded per-group frame; each candidate's
    * gain closes in one fixed double expression and the argmax is a
    * max-struct with ties to the EARLIEST boundary.
    */
  def changepointDetection(events: DataFrame,
                           groupCol: String = "event_type",
                           tsCol: String = "ts"): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("__day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "__day"), "left")
      .select(col("__g"), col("__day"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    val w = Window.partitionBy("__g").orderBy(col("__day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dense
      .withColumn("__cn", count(lit(1)).over(w))
      .withColumn("__cs", sum(col("__n").cast(dec)).over(w))
      .withColumn("__cq",
        sum(col("__n").cast(dec) * col("__n").cast(dec)).over(w))
    val totals = dense.groupBy("__g")
      .agg(count(lit(1)).as("__tn"), sum(col("__n").cast(dec)).as("__ts2"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__tq"))
    def sse(q: Column, s: Column, n: Column): Column =
      q.cast("double") - s.cast("double") * s.cast("double") /
        n.cast("double")
    val scored = cum.join(totals, "__g")
      .filter(col("__cn") < col("__tn")) // a split needs a right side
      .withColumn("__gain",
        sse(col("__tq"), col("__ts2"), col("__tn")) -
          sse(col("__cq"), col("__cs"), col("__cn")) -
          sse(col("__tq") - col("__cq"), col("__ts2") - col("__cs"),
            col("__tn") - col("__cn")))
      .withColumn("__negd",
        -datediff(col("__day"), lit("1970-01-01").cast(DateType))
          .cast(LongType))
    val out = scored.groupBy("__g")
      .agg(max(struct(col("__gain"), col("__negd"), col("__day").as("d"),
        col("__cn").as("cn"), col("__cs").as("cs"), col("__ts2").as("ts2"),
        col("__tn").as("tn"))).as("__b"))
      .select(col("__g").as(groupCol),
        col("__b.d").as("split_day"),
        col("__b.tn").as("n_days"),
        round(col("__b.cs").cast("double") / col("__b.cn").cast("double"), 6)
          .as("mean_before"),
        round((col("__b.ts2") - col("__b.cs")).cast("double") /
          (col("__b.tn") - col("__b.cn")).cast("double"), 6)
          .as("mean_after"),
        // e6 lattice on the DISPLAYED gain only (the argmax keys on
        // the raw struct): SSE decomposition differences cancel to a
        // ±ε residue on a flat series (VERDICT r15 #2)
        graft.functions.Lattice.e6(col("__b.__gain")).as("gain"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** First-order Markov next-event prediction accuracy — the eval
    * report for the q136 transition model: adjacent in-session pairs
    * (the same (user, time-bucket) decomposition, so no per-user
    * window over an unbounded history) split by the TO-event's day at
    * the calendar midpoint; the first half trains per-state argmax
    * predictions (ties to the lexicographically smallest successor),
    * the second half scores them. Everything is integer counts and
    * min-struct argmaxes until the closing accuracy division. States
    * unseen in training predict NULL and score as misses.
    */
  def markovNextEventAccuracy(events: DataFrame,
                              userCol: String = "user_id",
                              tsCol: String = "ts",
                              idCol: String = "event_id",
                              typeCol: String = "event_type",
                              bucketSecs: Long = 86400L): DataFrame = {
    val e = events.select(
      col(userCol).as("__u"), col(idCol).as("__id"),
      unix_micros(col(tsCol)).as("__ts"), col(typeCol).as("__t"))
      .withColumn("__b", expr(s"__ts div ${bucketSecs * 1000000L}L"))
    val wB = Window.partitionBy("__u", "__b").orderBy("__ts", "__id")
    val within = e.withColumn("__p", lag("__t", 1).over(wB))
      .filter(col("__p").isNotNull)
      .select(col("__p").as("from_type"), col("__t").as("to_type"),
        col("__ts").as("__tots"))
    val wU = Window.partitionBy("__u").orderBy("__b")
    val boundary = e.groupBy("__u", "__b")
      .agg(min(struct(col("__ts"), col("__id"), col("__t"))).as("__first"),
        max(struct(col("__ts"), col("__id"), col("__t"))).as("__last"))
      .withColumn("__prevLastT", lag(col("__last.__t"), 1).over(wU))
      .filter(col("__prevLastT").isNotNull)
      .select(col("__prevLastT").as("from_type"),
        col("__first.__t").as("to_type"),
        col("__first.__ts").as("__tots"))
    val pairs = within.unionByName(boundary)
      .withColumn("__day", expr("__tots div 86400000000L"))
    val bounds = pairs.agg(min("__day").as("__lo"), max("__day").as("__hi"))
      .withColumn("__split", expr("__lo + (__hi - __lo) div 2L"))
      .select("__split")
    val tagged = pairs.crossJoin(broadcast(bounds))
    val train = tagged.filter(col("__day") <= col("__split"))
    val eval_ = tagged.filter(col("__day") > col("__split"))
    val model = train.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("__n"))
    val predicted = model.groupBy("from_type")
      .agg(sum("__n").as("n_train"),
        min(struct((-col("__n")).as("nn"), col("to_type").as("t")))
          .as("__best"))
      .select(col("from_type"), col("n_train"),
        col("__best.t").as("predicted_next"))
    eval_.join(predicted, Seq("from_type"), "left")
      .groupBy("from_type")
      .agg(max(coalesce(col("n_train"), lit(0L))).as("n_train"),
        max(col("predicted_next")).as("predicted_next"),
        count(lit(1)).as("n_eval"),
        sum(when(col("to_type") === col("predicted_next"), 1L)
          .otherwise(0L)).as("n_correct"))
      // integer-only closing: accuracy ships as truncating ppm — the
      // report carries no float column, so the gate surface is
      // version-proof by construction
      .withColumn("accuracy_ppm", expr("n_correct * 1000000 div n_eval"))
  }

  /** Per-group activity TREND: the least-squares slope of daily event
    * counts over the day number — the "is this metric growing"
    * statistic behind every dashboard trend arrow. All four OLS
    * moments (Σx, Σy, Σxy, Σx²) are sums of INTEGERS over the
    * calendar-bounded daily frame — exact in a double far beyond any
    * realistic calendar — so
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * is one exact-integer-operand division: bit-identical across
    * engines, partitionings, and retries (the q127 argument,
    * stronger: not even the sums can round here). Groups observed on
    * a single day have no slope (NULL — the denominator is zero).
    * `slope_per_day` is events/day per day; `n_days` and the mean
    * daily count ride along for the report.
    */
  def dailyTrendSlopes(events: DataFrame, groupCol: String = "event_type",
                       tsCol: String = "ts"): DataFrame = {
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day")
      .agg(count(lit(1)).as("__y"))
      .withColumn("__x", datediff(col("__day"), lit("1970-01-01").cast(DateType))
        .cast(LongType))
    // moments accumulate in Decimal(38,0) — still EXACT integers, but
    // immune to the silent Long wrap the raw form hits around 3.4e7
    // mean daily events (x is days-since-epoch ~2e4, so n·Σxy crosses
    // 2^63 well inside this engine's advertised scale); DuckDB's
    // BIGINT sums widen to HUGEINT, the same exact envelope
    val dec = DecimalType(38, 0)
    daily.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x").cast(dec)).as("__sx"), sum(col("__y").cast(dec)).as("__sy"),
        // cast BEFORE the product — same wrap hazard as the correlation
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
      .withColumn("__den", col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
      .select(col(groupCol), col("n_days"),
        round(col("__sy").cast("double") / col("n_days").cast("double"), 6)
          .as("mean_daily"),
        // e6 lattice: an OLS slope over a flat series is a ±ε
        // cancellation residue (the q290 class)
        graft.functions.Lattice.e6(when(col("__den") =!= 0,
          (col("n_days") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
            / col("__den").cast("double"))).as("slope_per_day"))
  }

  /** Two-regressor OLS fit y = b0 + b1·x1 + b2·x2 per group, solved in
    * CLOSED FORM by Cramer's rule over the normal-equation moment
    * matrix — the multiple-regression extension of
    * [[dailyTrendSlopes]]' simple slope, and the distributed shape a
    * gradient loop cannot match: ONE map-side-combined aggregation
    * collects the nine exact moments (n, Σx1, Σx2, Σy, Σx1², Σx2²,
    * Σx1x2, Σx1y, Σx2y) and the per-group solve is #groups-sized
    * driver-free column arithmetic.
    *
    * Engine-exactness (the house discipline): inputs must be INTEGRAL
    * columns; every moment and every 3×3 determinant accumulates in
    * Decimal(38,0) — exact integers, no fp summation order anywhere —
    * and each coefficient is ONE closing IEEE division det_i/det,
    * identical in any engine (DuckDB widens to HUGEINT: same
    * envelope, loud overflow). Envelope: determinants are sums of
    * triple moment products, so n·max(x)⁴·... must stay below 10³⁸ —
    * comfortably 10⁹ rows of 10⁴-magnitude features per group; chunk
    * by partition beyond. A singular system (collinear features, or
    * fewer than 3 rows) yields NULL coefficients rather than a
    * garbage pseudo-inverse.
    */
  def olsTwoFeature(df: DataFrame, groupCol: String, yCol: String,
                    x1Col: String, x2Col: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .select(col(groupCol).as("__g"),
        col(yCol).cast(LongType).cast(dec).as("__y"),
        col(x1Col).cast(LongType).cast(dec).as("__x1"),
        col(x2Col).cast(LongType).cast(dec).as("__x2"))
    val m = rows.groupBy("__g").agg(
      count(lit(1)).as("n"),
      sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
      sum(col("__y")).as("__sy"),
      sum(col("__x1") * col("__x1")).as("__s11"),
      sum(col("__x2") * col("__x2")).as("__s22"),
      sum(col("__x1") * col("__x2")).as("__s12"),
      sum(col("__x1") * col("__y")).as("__s1y"),
      sum(col("__x2") * col("__y")).as("__s2y"))
    val nn = col("n").cast(dec)
    val (s1, s2, sy, s11, s22, s12, s1y, s2y) =
      (col("__s1"), col("__s2"), col("__sy"), col("__s11"),
        col("__s22"), col("__s12"), col("__s1y"), col("__s2y"))
    val det = nn * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    val det1 = nn * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    val det2 = nn * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    m.withColumn("__det", det)
      .select(col("__g").as(groupCol), col("n"),
        // e6 lattice on all three coefficients: regression
        // coefficients over degenerate designs are ±ε residues
        graft.functions.Lattice.e6(when(col("__det") =!= 0,
          det0.cast("double") / col("__det").cast("double"))).as("b0"),
        graft.functions.Lattice.e6(when(col("__det") =!= 0,
          det1.cast("double") / col("__det").cast("double"))).as("b1"),
        graft.functions.Lattice.e6(when(col("__det") =!= 0,
          det2.cast("double") / col("__det").cast("double"))).as("b2"))
  }

  /** Pairwise Pearson correlation of the groups' DAILY COUNT series —
    * "which metrics move together". Days where a group has no events
    * count as 0 (the series are aligned on the union calendar, built
    * by crossing the #groups-row group list with the #days-row
    * calendar — both tiny). Like [[dailyTrendSlopes]], every moment
    * (Σx, Σy, Σxy, Σx², Σy²) is an exact integer sum, so
    *   r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
    * is deterministic double arithmetic over exact operands. Pairs
    * where either series is constant have no correlation (NULL).
    * Output: one row per unordered pair (group_a < group_b).
    */
  def dailyCountCorrelation(events: DataFrame,
                            groupCol: String = "event_type",
                            tsCol: String = "ts"): DataFrame = {
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("__day").distinct()
    // dense (group, day) grid — #groups × #days rows, zeros filled
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "__day"), "left")
      .select(col("__g"), col("__day"), coalesce(col("__n"), lit(0L)).as("__n"))
    val a = dense.select(col("__g").as("group_a"), col("__day"), col("__n").as("__x"))
    val b = dense.select(col("__g").as("group_b"), col("__day"), col("__n").as("__y"))
    // Decimal(38,0) moments: a single 3e9-event group-day would wrap
    // Σy² in a Long — the decimal form stays exact (DuckDB widens to
    // HUGEINT, the same envelope)
    val dec = DecimalType(38, 0)
    val out = a.join(b, "__day")
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x").cast(dec)).as("__sx"), sum(col("__y").cast(dec)).as("__sy"),
        // cast BEFORE the product: y·y alone wraps a Long at y ≥ 3.04e9
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
      .withColumn("__vx", col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__vy", col("n_days") * col("__syy") - col("__sy") * col("__sy"))
      .select(col("group_a"), col("group_b"), col("n_days"),
        // e6 lattice (signed-residue class, VERDICT r15 #2)
        graft.functions.Lattice.e6(when(col("__vx") > 0 && col("__vy") > 0,
          (col("n_days") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
            / sqrt(col("__vx").cast("double") * col("__vy").cast("double"))))
          .as("pearson_r"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Trailing-window anomaly scores: per (group, day), the day's event
    * count z-scored against the PRECEDING `windowDays` days (current
    * day excluded — the baseline must not contain the observation).
    * `z` is NULL when the baseline is empty or flat (zero variance):
    * no honest score exists there, and NULL-not-zero keeps flat-series
    * days from masquerading as perfectly normal.
    *
    * Engine-exactness: mean and variance come from the explicit
    * sum/sum-of-squares form — sums of day-count INTEGERS over a ≤
    * `windowDays`-row frame are exact in a double, so mean, variance
    * (avg(n²) − avg(n)²), and z reproduce bit-for-bit in any engine;
    * no Welford-vs-naive library divergence can enter. Same scale
    * shape as [[rollingDailyAgg]]: calendar-bounded frame, RANGE
    * window over the integer day number.
    */
  def dailyAnomalyScores(events: DataFrame, groupCol: String = "event_type",
                         tsCol: String = "ts", windowDays: Int = 7): DataFrame = {
    require(windowDays >= 2, "baseline needs at least two days")
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__dayN", datediff(col("day"), lit("1970-01-01").cast(DateType)))
    val w = Window.partitionBy("__g").orderBy("__dayN")
      .rangeBetween(-windowDays.toLong, -1L)
    val stats = daily
      .withColumn("n_baseline_days", count(lit(1)).over(w))
      .withColumn("__s1", sum(col("n_events")).over(w))
      .withColumn("__s2", sum(col("n_events").cast(DecimalType(38, 0)) *
        col("n_events").cast(DecimalType(38, 0))).over(w))
    val mean = col("__s1").cast("double") / col("n_baseline_days").cast("double")
    val variance = (col("__s2").cast("double") /
      col("n_baseline_days").cast("double")) - mean * mean
    stats.select(
      col("__g").as(groupCol), col("day"), col("n_events"),
      coalesce(col("n_baseline_days"), lit(0L)).as("n_baseline_days"),
      round(when(col("n_baseline_days") > 0, mean), 6).as("baseline_mean"),
      // z is a difference over a noisy baseline — e6 lattice, not
      // round(): a day sitting exactly on its baseline mean closes to
      // a ±ε residue (VERDICT r15 #2)
      graft.functions.Lattice.e6(when(col("n_baseline_days") > 0 && variance > 0,
        (col("n_events").cast("double") - mean) / sqrt(variance))).as("z"))
  }

  /** Day-of-week-adjusted anomaly scores — the seasonal sibling of
    * [[dailyAnomalyScores]]: Monday spikes are judged against OTHER
    * Mondays, not the whole week (the naive global baseline flags
    * every weekend of a weekday-heavy metric). Per (group, weekday):
    * mean and variance of the daily counts from exact Decimal(38,0)
    * moments (the family's overflow discipline); each day's z closes
    * in one fixed double tree. A weekday with fewer than `minDays`
    * observations yields NULL rather than a one-sample zero-variance
    * explosion. Leave-one-out baseline: the scored day is EXCLUDED
    * from its own weekday stats (otherwise a single huge spike
    * suppresses its own z), via the (Σ − x, n − 1) complement — still
    * exact integers.
    *
    * Scale shape: events pre-aggregate to (group, day) map-side, the
    * weekday stats are a #groups × 7 frame broadcast back. No
    * windows at all.
    */
  def dowAdjustedAnomaly(events: DataFrame, groupCol: String = "event_type",
                         tsCol: String = "ts",
                         minDays: Int = 3): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow", dayofweek(col("day")))
    val stats = daily.groupBy("__g", "dow")
      .agg(count(lit(1)).as("__nd"),
        sum(col("n_events").cast(dec)).as("__s1"),
        sum(col("n_events").cast(dec) * col("n_events").cast(dec))
          .as("__s2"))
    val joined = daily.join(broadcast(stats), Seq("__g", "dow"))
      .withColumn("__n1", col("__nd") - 1)
      .withColumn("__l1", col("__s1") - col("n_events").cast(dec))
      .withColumn("__l2", col("__s2") -
        col("n_events").cast(dec) * col("n_events").cast(dec))
    // greatest(n1, 1): ANSI divide-by-zero would fire even under the
    // when() guards — codegen subexpression elimination hoists the
    // shared division out of the CaseWhen branches. Guarded rows
    // output NULL regardless, so the clamped value is never seen.
    val n1d = greatest(col("__n1"), lit(1L)).cast("double")
    val mean = col("__l1").cast("double") / n1d
    val variance = (col("__l2").cast("double") / n1d) - mean * mean
    joined.select(col("__g").as(groupCol), col("day"), col("dow"),
      col("n_events"),
      (col("__nd") - 1).as("n_baseline_days"),
      round(when(col("__n1") >= minDays, mean), 6).as("dow_mean"),
      // e6 lattice: same signed-residue z as dailyAnomalyScores
      graft.functions.Lattice.e6(when(col("__n1") >= minDays && variance > 0,
        (col("n_events").cast("double") - mean) / sqrt(variance)))
        .as("z"))
  }

  /** Trailing calendar-window aggregates: per (group, day), the day's
    * own event count / value sum plus the trailing `windowDays`-day
    * totals — the moving-average family every event warehouse reports.
    *
    * Scale shape: raw events pre-aggregate to (group, day) with
    * map-side combine FIRST, so the window runs over a frame bounded
    * by #groups × #days — calendar-bounded however many events a day
    * has. The window is a RANGE frame over the integer day number
    * (days since epoch), so missing days genuinely age out of the
    * trailing window instead of stretching it (a ROWS frame over
    * present-days-only would silently widen across gaps).
    */
  def rollingDailyAgg(events: DataFrame, groupCol: String = "event_type",
                      tsCol: String = "ts", valueCol: String = "value",
                      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must span at least one day")
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"),
        col(valueCol).as("__v"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("n_events"), sum("__v").as("__vs"))
      .withColumn("__dayN", datediff(col("day"), lit("1970-01-01").cast(DateType)))
    val w = Window.partitionBy("__g").orderBy("__dayN")
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily.select(
      col("__g").as(groupCol), col("day"), col("n_events"),
      round(col("__vs"), 4).as("value_day"),
      sum("n_events").over(w).as("n_trailing"),
      round(sum("__vs").over(w), 4).as("value_trailing"))
  }

  /** Lag-k autocorrelation (ACF) of each group's DAILY COUNT series,
    * for k = 1..`maxLag` — the seasonality/periodicity probe that
    * complements [[dailyTrendSlopes]] (trend) and the q167 day-of-week
    * profile (fixed-period seasonality): a weekly cycle shows up as an
    * ACF peak at lag 7 with no prior day-of-week assumption.
    *
    * Series are aligned on the union calendar with zero-fill (as in
    * [[dailyCountCorrelation]] — a group with no events that day had
    * count 0, not "no observation"), so every lag-k pair whose both
    * endpoints lie inside the calendar span contributes. Pearson over
    * the pairs from EXACT Decimal(38,0) integer moments; `acf` is NULL
    * when either end of the lagged overlap is a constant series (no
    * honest correlation exists).
    *
    * Scale shape: the daily summary is one map-side-combined shuffle
    * on (group, day); the lag join explodes the CALENDAR-BOUNDED
    * summary `maxLag`× and equi-joins on (group, day+lag) — hash
    * partitioned, no range join, no per-group window over raw events.
    */
  def lagAutocorrelation(events: DataFrame, groupCol: String = "event_type",
                         tsCol: String = "ts", maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"maxLag out of range: $maxLag")
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("__day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "__day"), "left")
      .select(col("__g"),
        datediff(col("__day"), lit("1970-01-01").cast(DateType)).as("__dayN"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    val lagged = dense
      .withColumn("lag", explode(array((1 to maxLag).map(lit): _*)))
      .select(col("__g"), (col("__dayN") + col("lag")).as("__dayN"),
        col("lag"), col("__n").as("__x"))
    val dec = DecimalType(38, 0)
    val out = lagged
      .join(dense.select(col("__g"), col("__dayN"), col("__n").as("__y")),
        Seq("__g", "__dayN"))
      .groupBy(col("__g").as(groupCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x").cast(dec)).as("__sx"), sum(col("__y").cast(dec)).as("__sy"),
        // cast BEFORE the product — the q146 Long-wrap discipline
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
      .withColumn("__vx", col("n_pairs") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__vy", col("n_pairs") * col("__syy") - col("__sy") * col("__sy"))
      .select(col(groupCol), col("lag"), col("n_pairs"),
        // e6 lattice (signed-residue class, VERDICT r15 #2)
        graft.functions.Lattice.e6(when(col("__vx") > 0 && col("__vy") > 0,
          (col("n_pairs") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
            / sqrt(col("__vx").cast("double") * col("__vy").cast("double"))))
          .as("acf"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Concentration report over a categorical key: Gini coefficient,
    * Herfindahl–Hirschman index, and the largest single share — the
    * "is this corpus dominated by a few domains" screen a training
    * mix review starts from (the scalar complement to q168's quota
    * CAP). Gini is computed from the rank-weighted identity
    *   G = (2·Σᵢ i·cᵢ − (n+1)·Σc) / (n·Σc),   cᵢ ascending,
    * whose numerator and denominator are EXACT Decimal(38,0) integers
    * — ties in cᵢ make Σ i·cᵢ permutation-invariant, so the tiebreak
    * order only serves determinism, not the value. HHI = Σc²/(Σc)² on
    * the same exact-integer moments. Each statistic is ONE closing
    * IEEE division over exact operands (round 6) — no float
    * accumulation anywhere.
    *
    * Scale shape: one map-side-combined count per group, then the
    * rank over the #groups-row count table via the two-level cumsum
    * (a web-scale domain column has 10⁸ groups — still no
    * single-partition window anywhere).
    */
  def concentrationReport(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df
      .filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
    // rank 1..n ascending by (count, group): bucket on a monotone
    // count prefix so no window spans more than one count-bucket
    val (bucketed, wi) = TwoLevelCumsum.withOffsets(
      counts, expr("__c div 1024L"), lit(1L),
      Seq(col("__c").asc, col("__g").asc))
    val dec = DecimalType(38, 0)
    val ranked = bucketed
      .withColumn("__rk", col("__off") + sum("__w").over(wi))
    ranked.agg(
      count(lit(1)).as("n_groups"),
      sum("__c").as("total"),
      sum(col("__rk").cast(dec) * col("__c").cast(dec)).as("__src"),
      max("__c").as("__maxc"),
      sum(col("__c").cast(dec) * col("__c").cast(dec)).as("__ssq"))
      .select(col("n_groups"), col("total"),
        round(((lit(2).cast(dec) * col("__src")
          - (col("n_groups") + 1).cast(dec) * col("total").cast(dec))
          .cast("double"))
          / (col("n_groups").cast(dec) * col("total").cast(dec)).cast("double"),
          6).as("gini"),
        round(col("__ssq").cast("double")
          / (col("total").cast(dec) * col("total").cast(dec)).cast("double"), 6)
          .as("hhi"),
        round(col("__maxc").cast("double") / col("total").cast("double"), 6)
          .as("top_share"))
  }

  /** Benford first-digit profile per group — the classic
    * anomaly/fabrication screen for naturally-occurring positive
    * amounts (Nigrini 2012): organic magnitudes follow
    * P(d) = log10(1 + 1/d); invented or constrained ones rarely do.
    * Output: one row per (group, digit 1..9) with the observed share,
    * the Benford share, and the group's chi-square statistic against
    * the Benford expectation (df = 8) repeated on each row. Digits a
    * group never produced are REAL zero observations (dense 9-digit
    * grid): their (0 − Np)²/Np mass belongs in the statistic.
    *
    * Values below 1 are excluded (their leading significant digit
    * lives in the fractional part; the floor-then-string digit
    * extraction is only exact for v ≥ 1 — and it IS exact there:
    * floor is one IEEE op and the BIGINT-to-string first character is
    * engine-portable, where a log10-based mantissa extraction would
    * wobble near powers of ten).
    *
    * Scale shape: one map-side-combined count per (group, digit) —
    * ≤ 9 rows per group — then arithmetic on the tiny grid.
    */
  def benfordProfile(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val v = df.filter(col(valueCol) >= 1)
      .select(col(groupCol).as("__g"),
        substring(floor(col(valueCol)).cast(StringType), 1, 1)
          .cast(IntegerType).as("digit"))
    val c = v.groupBy("__g", "digit").agg(count(lit(1)).as("n"))
    val t = v.groupBy("__g").agg(count(lit(1)).as("__t"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast(IntegerType).as("digit"))
    val dense = t.crossJoin(digits)
      .join(c, Seq("__g", "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val expected = col("__t").cast("double") *
      log10(lit(1.0) + lit(1.0) / col("digit"))
    val term = (col("n").cast("double") - expected) *
      (col("n").cast("double") - expected) / expected
    val chi = dense.groupBy("__g")
      .agg(round(sum(term), 4).as("chi2"))
    dense
      .join(chi, "__g")
      .select(col("__g").as(groupCol), col("digit"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("obs_share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford_share"),
        col("chi2"))
  }

  /** Robust outlier report per group on the Iglewicz–Hoaglin modified
    * z-score: med = median(value), mad = median(|value − med|), and a
    * value is an outlier when 0.6745·|v − med| / mad > `cutoff`
    * (3.5 by default — the published rule). The MAD family is the
    * robust sibling of the Tukey IQR fences (q134): fences move with a
    * single wild value's pull on the quartiles far less than ±3σ
    * z-scoring does, and MAD has the highest possible breakdown point
    * (50%) of any dispersion estimator.
    *
    * Degenerate dispersion: when mad = 0 (over half the group sits
    * exactly on the median), the modified z is infinite for any value
    * off the median — those values ARE the outliers, so they are
    * counted, not NULLed (the cutoff comparison is written to make
    * this fall out: 0·cutoff < |v − med| ⟺ v ≠ med).
    *
    * Engine-exactness: both medians come from percentile_cont — the
    * q38/q134-proven interpolation surface — and the outlier test is
    * a fixed-order IEEE expression over them (|v − med|·0.6745 vs
    * cutoff·mad), so the counts are bit-deterministic across engines.
    * Scale shape: two grouped percentile aggregations and one
    * broadcast join of the #groups-row statistics frame back onto the
    * events — no per-group window, no sort wider than the grouped
    * percentile's own partial state.
    */
  def madOutlierReport(df: DataFrame, groupCol: String = "event_type",
                       valueCol: String = "value",
                       cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, "cutoff must be positive")
    val v = df.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
    val med = v.groupBy("__g").agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY __v)").as("__med"))
    val dev = v.join(broadcast(med), "__g")
      .withColumn("__dev", abs(col("__v") - col("__med")))
    val mad = dev.groupBy("__g").agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY __dev)").as("__mad"))
    dev.join(broadcast(mad), "__g")
      .groupBy(col("__g").as(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("__dev") * 0.6745 > col("__mad") * cutoff, 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first(col("__med")), 4).as("median"),
        round(first(col("__mad")), 4).as("mad"))
  }

  /** One-sided CUSUM change detection on each group's daily count
    * series (Page 1954): with μ = the group's mean daily count over
    * the union calendar, the statistic
    *   S_t = max(0, S_{t−1} + (x_t − μ)) = P_t − min_{j≤t} P_j,
    *   P_t = Σ_{j≤t} (x_j − μ),
    * accumulates sustained excess over the mean and resets through the
    * running-minimum identity — no recursive state, just a prefix sum
    * and a prefix min. An alarm fires when S_t > `alarmMult`·μ: the
    * cumulative excess exceeds `alarmMult` average days' worth of
    * events — a LEVEL-SHIFT detector, complementary to the q127
    * trailing z (single-day spikes) and the q145 OLS slope (global
    * drift).
    *
    * Integer-exactness: μ = T/D is rational, so everything is scaled
    * by D — x_t·D − T is an exact integer (Decimal(38,0) per the q146
    * wrap discipline), the prefix sums and running minima stay
    * integers, and the alarm test S_scaled > alarmMult·T·... is an
    * INTEGER comparison (S/D > m·T/D ⟺ S_scaled > m·T). The reported
    * `cusum` is the one closing division S_scaled/D, rounded — the
    * alarm never depends on a float.
    *
    * Days with no events are genuine zeros via the dense group ×
    * union-calendar grid (a silent outage IS a level shift — downward
    * drift must accumulate). Scale shape: map-side-combined daily
    * counts, the tiny dense grid, and two windows over the
    * CALENDAR-BOUNDED daily frame (≤ #days rows per group).
    */
  def cusumAlarms(events: DataFrame, groupCol: String = "event_type",
                  tsCol: String = "ts", alarmMult: Long = 4L): DataFrame = {
    require(alarmMult >= 1, "alarmMult must be at least 1")
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "day"), "left")
      .select(col("__g"), col("day"), coalesce(col("__n"), lit(0L)).as("__n"))
    val dec = DecimalType(38, 0)
    val totals = dense.groupBy("__g").agg(
      sum(col("__n").cast(dec)).as("__t"), count(lit(1)).as("__d"))
    val w = Window.partitionBy("__g").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = dense.join(broadcast(totals), "__g")
      // scaled deviation x·D − T, exact integer
      .withColumn("__dev", col("__n").cast(dec) * col("__d").cast(dec) - col("__t"))
      .withColumn("__p", sum("__dev").over(w))
      // the running min MUST include the virtual empty prefix P_0 = 0
      // (least(…, 0)) — without it a series that opens above the mean
      // reports S_1 = 0 instead of P_1; and including day t itself is
      // harmless: when P_t is the new minimum both forms give 0 (the
      // max(0,·) reset), proven by induction in CusumSpec
      .withColumn("__m", least(min("__p").over(w), lit(0).cast(dec)))
      .withColumn("__s", col("__p") - col("__m"))
      .select(col("__g").as(groupCol), col("day"),
        col("__n").as("n_events"),
        round(col("__s").cast("double") / col("__d").cast("double"), 4)
          .as("cusum"),
        (col("__s") > col("__t") * lit(alarmMult).cast(dec)).as("alarm"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Machine-cadence (bot) screen: accounts whose inter-event gaps are
    * implausibly REGULAR — many events with a coefficient of variation
    * of the gap distribution at or below `maxCv` (humans are bursty;
    * schedulers tick). Gaps are consecutive-event deltas in the
    * (ts, id) total order.
    *
    * cv reduces to one closing expression over exact integer moments:
    *   cv = sqrt(n·Σg² − (Σg)²) / Σg
    * (σ_pop/mean, both scale factors of 1/n cancelling) with Σg, Σg²
    * accumulated in Decimal(38,0) — microsecond gaps square to ~1e26
    * for month-long idles, far past a Long. Σg = 0 (all events at one
    * instant) is maximal regularity: cv is reported NULL (0/0) but
    * the account is flagged.
    *
    * Scale shape: the [[sessionizeBucketed]] discipline — within-bucket
    * gaps from a lag over (user, day bucket), the single cross-bucket
    * gap per boundary from the calendar-bounded per-user bucket
    * summary, so no per-user partition ever exceeds one bucket's
    * events and the moments aggregate with map-side combine. A
    * billion-event bot cannot serialize a task; it just produces a
    * billion SMALL gaps that fold into three numbers.
    */
  def cadenceReport(events: DataFrame, userCol: String = "user_id",
                    tsCol: String = "ts", idCol: String = "event_id",
                    minEvents: Long = 20L, maxCv: Double = 0.1,
                    bucketSecs: Long = 86400L): DataFrame = {
    require(minEvents >= 2, "cadence needs at least two events")
    require(maxCv >= 0, "maxCv must be non-negative")
    val e = events.select(
      col(userCol).as("__u"), col(idCol).as("__id"),
      unix_micros(col(tsCol)).as("__ts"))
      .withColumn("__b", expr(s"__ts div ${bucketSecs * 1000000L}L"))
    val wB = Window.partitionBy("__u", "__b").orderBy("__ts", "__id")
    val within = e.withColumn("__prev", lag("__ts", 1).over(wB))
      .filter(col("__prev").isNotNull)
      .select(col("__u"), (col("__ts") - col("__prev")).as("__gap"))
    val wU = Window.partitionBy("__u").orderBy("__b")
    val boundary = e.groupBy("__u", "__b")
      .agg(min("__ts").as("__first"), max("__ts").as("__last"))
      .withColumn("__prevLast", lag("__last", 1).over(wU))
      .filter(col("__prevLast").isNotNull)
      .select(col("__u"), (col("__first") - col("__prevLast")).as("__gap"))
    val dec = DecimalType(38, 0)
    within.unionByName(boundary)
      .groupBy(col("__u").as(userCol))
      .agg(count(lit(1)).as("__ng"),
        sum(col("__gap").cast(dec)).as("__sg"),
        sum(col("__gap").cast(dec) * col("__gap").cast(dec)).as("__sgg"))
      .withColumn("n_events", col("__ng") + 1)
      .withColumn("__var", col("__ng") * col("__sgg") - col("__sg") * col("__sg"))
      .withColumn("cv", round(
        when(col("__sg") > 0,
          sqrt(col("__var").cast("double")) / col("__sg").cast("double")), 6))
      .filter(col("n_events") >= minEvents &&
        (col("__sg") === 0 || col("cv") <= maxCv))
      .select(col(userCol), col("n_events"),
        round(col("__sg").cast("double") / col("__ng").cast("double") / 1e6, 4)
          .as("mean_gap_s"),
        col("cv"))
  }

  /** Poisson bootstrap confidence interval for the per-group MEAN of a
    * value column — error bars on any metric in ONE pass, the
    * resampling scheme that works at 100 TB because it never
    * materializes a resample: each row's multiplicity in replicate r
    * is an independent Poisson(1) draw (Chamandy 2012, "Estimating
    * Uncertainty for Massive Data Streams"; equivalently the
    * per-element limit of the multinomial bootstrap), so a row
    * contributes (w·x, w) to each of `reps` running sums and the
    * replicate means' spread IS the sampling distribution.
    *
    * Determinism: the draw is a PURE FUNCTION of (id, replicate,
    * salt) — one md5 per BLOCK of four replicates, its 128 bits
    * sliced into four independent 32-bit u values (8 hex chars each,
    * the q48/q119 portable trick amortized 4×: hashing dominates the
    * explode cost, and slicing keeps full cryptographic independence
    * where a cheaper counter-mix would trade statistical quality),
    * folded through the Poisson(1) inverse CDF as INTEGER threshold
    * comparisons (the 2³²-scaled cumulative literals below, identical
    * in the oracle — no engine float CDF anywhere). Multiplicity is
    * capped at 8 (P ≈ 1e-5 per draw); the cap is part of the
    * operator's definition, applied identically everywhere.
    *
    * Exactness: values accumulate as DECIMAL(18,6)-quantized operands
    * (the q179 portable-surface trick) in Decimal(38,6) sums, so
    * replicate means are single IEEE divisions of exact operands; the
    * percentile interpolation then runs on 6-decimal-rounded means —
    * reproducible across engines, partitionings, and retries.
    *
    * Scale shape: one `reps`-way map-side explode (the documented
    * bootstrap cost — tune `reps` to the error-bar precision needed),
    * partial aggregation combines map-side into (group, rep) cells,
    * and the percentile runs over the #groups × reps cell frame —
    * corpus-size-independent. No second pass, no per-group window
    * over raw rows.
    */
  def bootstrapCiMean(df: DataFrame, groupCol: String, idCol: String,
                      valueCol: String, reps: Int = 64,
                      salt: String = "boot",
                      ciLo: Double = 0.025, ciHi: Double = 0.975): DataFrame = {
    require(reps >= 8 && reps <= 4096, s"reps out of range: $reps")
    require(reps % 4 == 0, s"reps must be a multiple of 4 (md5 slicing): $reps")
    require(ciLo > 0 && ciHi < 1 && ciLo < ciHi, "invalid CI bounds")
    // floor(2^32 · P(Poisson(1) <= k)) for k = 0..7 — literals shared
    // verbatim with the oracle SQL
    val thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
      4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L)
    val dec6 = DecimalType(18, 6)
    val dec = DecimalType(38, 6)
    // fan the narrow (group, id, value) rows out of a single-row-group
    // scan before the reps-way explode + md5 draws — the whole draw
    // pipeline fuses onto the scan task otherwise (guide §2.5; round-16
    // stage profile: ONE 5.5 s single-task stage → 32-way, 6.2→1.5 s)
    val rows = graft.Tables.fanOut(df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        col(valueCol).cast(dec6).as("__v")))
    val drawn = rows
      .withColumn("__b", explode(array((0 until reps / 4).map(lit): _*)))
      .withColumn("__h", md5(concat_ws("|", col("__id").cast(StringType),
        col("__b").cast(StringType), lit(salt))))
      .withColumn("__s", explode(array((0 until 4).map(lit): _*)))
      .withColumn("__r", col("__b") * 4 + col("__s"))
      .withColumn("__u",
        conv(expr("substr(__h, __s * 8 + 1, 8)"), 16, 10).cast(LongType))
      .withColumn("__w", thresholds.zipWithIndex.foldRight(lit(8): Column) {
        case ((t, k), rest) => when(col("__u") < t, lit(k)).otherwise(rest)
      })
    val cells = drawn.groupBy("__g", "__r")
      .agg(sum(col("__w").cast(dec) * col("__v")).as("__swx"),
        sum(col("__w").cast(LongType)).as("__sw"))
      .filter(col("__sw") > 0) // an all-zero replicate has no mean
      .withColumn("__mean", round(
        col("__swx").cast("double") / col("__sw").cast("double"), 6))
    val point = rows.groupBy("__g")
      .agg(count(lit(1)).as("n_rows"), sum("__v").as("__sv"))
      .withColumn("mean",
        round(col("__sv").cast("double") / col("n_rows").cast("double"), 6))
    cells.groupBy("__g")
      .agg(count(lit(1)).as("n_reps"),
        expr(s"percentile_cont($ciLo) WITHIN GROUP (ORDER BY __mean)").as("__lo"),
        expr(s"percentile_cont($ciHi) WITHIN GROUP (ORDER BY __mean)").as("__hi"))
      .join(point, "__g")
      .select(col("__g").as(groupCol), col("n_rows"), col("mean"),
        col("n_reps"), round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }

  /** Robust trend per group: the Theil–Sen slope (median of all
    * pairwise day-slopes — breakdown point 29%, vs 0% for the q145
    * OLS line a single outlier day can seize) and the Mann–Kendall
    * trend test (S = Σ sign(y_j − y_i) over day pairs i < j, with the
    * tie-corrected normal approximation) — the standard
    * nonparametric pair for "is this metric really drifting".
    *
    * Exactness: every pairwise slope is ONE IEEE division of exact
    * integer operands ((y_j − y_i)/(x_j − x_i)); the median is
    * percentile_cont over those doubles (the q38-proven surface).
    * S and the tie correction are pure INTEGER sums —
    *   Var(S) = (D(D−1)(2D+5) − Σ_g t_g(t_g−1)(2t_g+5)) / 18,
    * and the closing z = (S ∓ 1)/√Var(S) is a fixed-order double
    * expression. Nothing accumulates in floats.
    *
    * Scale shape: the pair join explodes the CALENDAR-BOUNDED dense
    * daily frame against itself per group — D(D−1)/2 rows per group
    * (a 10-year calendar: ~6.7M pairs, a few MB), never raw events;
    * zero-filled absent days participate as genuine observations.
    */
  def robustTrend(events: DataFrame, groupCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("__day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "__day"), "left")
      .select(col("__g"),
        datediff(col("__day"), lit("1970-01-01").cast(DateType))
          .cast(LongType).as("__x"),
        coalesce(col("__n"), lit(0L)).as("__y"))
    val a = dense.select(col("__g"), col("__x").as("__xi"), col("__y").as("__yi"))
    val b = dense.select(col("__g"), col("__x").as("__xj"), col("__y").as("__yj"))
    val pairs = a.join(b, "__g").filter(col("__xi") < col("__xj"))
      .withColumn("__slope",
        (col("__yj") - col("__yi")).cast("double") /
          (col("__xj") - col("__xi")).cast("double"))
      .withColumn("__sgn", signum((col("__yj") - col("__yi")).cast("double"))
        .cast(LongType))
    val base = pairs.groupBy("__g").agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY __slope)").as("__sen"),
      sum("__sgn").as("mk_s"))
    // tie correction over the y-value multiplicities
    // t and D are calendar-bounded (≤ ~3.7k for ten years), so the
    // cubic products stay far inside a Long
    val ties = dense.groupBy("__g", "__y").agg(count(lit(1)).as("__t"))
      .groupBy("__g").agg(
        sum(col("__t") * (col("__t") - 1) * (lit(2) * col("__t") + 5)).as("__tcorr"),
        sum(col("__t")).as("n_days"))
    val varS = (col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5)
      - col("__tcorr")).cast("double") / 18.0
    val out = base.join(ties, "__g")
      .select(col("__g").as(groupCol), col("n_days"),
        round(col("__sen"), 6).as("sen_slope"),
        col("mk_s"),
        round(when(col("mk_s") > 0 && varS > 0,
          (col("mk_s") - 1).cast("double") / sqrt(varS))
          .when(col("mk_s") < 0 && varS > 0,
            (col("mk_s") + 1).cast("double") / sqrt(varS))
          .when(varS > 0, lit(0.0)), 4).as("mk_z"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Dyadic-decay EWMA of each group's daily event count: decay 1/2
    * per day, truncated at `windowDays` terms —
    *   ewma_t = Σ_{j=0..W-1} x_{t−j} · 2^{W−1−j}  /  2^W .
    * The half decay is chosen ON PURPOSE: every weight 2^{−(j+1)} is a
    * dyadic rational, so the numerator is an EXACT integer sum
    * (Decimal(38,0)) and the single closing division is one IEEE op —
    * the smoothed series is bit-deterministic across engines,
    * partitionings, and retries, unlike the textbook recursive form
    * (or a pow()-weighted window), whose float accumulation order is
    * engine-defined. Truncation under-reports by at most
    * max(x)·2^{−W} — below the 6-decimal rounding for any real count
    * at the default W=16.
    *
    * Days before the calendar start contribute nothing (zero prior),
    * and in-span days with no events contribute genuine zeros via the
    * dense grid. Scale shape: calendar-bounded daily summary, W×
    * explode, one hash equi-join on (group, day) — no window over raw
    * events, no per-group serialization.
    */
  def ewmaDaily(events: DataFrame, groupCol: String = "event_type",
                tsCol: String = "ts", windowDays: Int = 16): DataFrame = {
    require(windowDays >= 1 && windowDays <= 62, s"windowDays out of range: $windowDays")
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "day"), "left")
      .select(col("__g"), col("day"), coalesce(col("__n"), lit(0L)).as("__n"))
    val dec = DecimalType(38, 0)
    // each source day s contributes x_s · 2^{W−1−j} to target day s+j
    val contrib = dense
      .withColumn("__j", explode(array((0 until windowDays).map(lit): _*)))
      .select(col("__g"), date_add(col("day"), col("__j")).as("day"),
        (col("__n").cast(dec) *
          expr(s"shiftleft(CAST(1 AS BIGINT), ${windowDays - 1} - __j)").cast(dec))
          .as("__w"))
      // targets beyond the calendar end are not report rows
      .join(days, Seq("day"), "left_semi")
      .groupBy("__g", "day")
      .agg(sum("__w").as("__num"))
    val out = contrib
      .join(dense.select(col("__g"), col("day"), col("__n").as("n_events")),
        Seq("__g", "day"))
      .select(col("__g").as(groupCol), col("day"), col("n_events"),
        round(col("__num").cast("double") /
          lit((1L << windowDays).toDouble), 6).as("ewma"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Mann–Whitney rank-sum test, one-vs-rest per group: does group g's
    * value distribution differ from the pooled rest? The standard
    * nonparametric two-sample test (Mann & Whitney 1947), with
    * midranks for ties and the tie-corrected normal approximation
    * with continuity correction.
    *
    * Exactness: ranks are NEVER computed by sorting raw rows — the
    * corpus collapses to a (value, group) histogram, and each distinct
    * value's midrank comes from the cumulative count of smaller
    * values:  2·midrank(v) = 2·below(v) + t_v + 1  (kept DOUBLED so
    * every rank quantity is an exact integer; .5 midranks never touch
    * a float). Rank sums, U, and the tie term Σ(t³−t) accumulate in
    * Decimal(38,0); the closing z and rank-biserial r are fixed-order
    * double expressions of exact operands, rounded 4. Envelope:
    * Σ n_gv·2·midrank ≤ 2N² — fine to N ~ 10¹⁸ rows.
    *
    * Scale shape: one map-side-combined (value, group) count, a
    * two-level cumsum over the DISTINCT-VALUE frame (bucketed on the
    * integer part, so a trillion-row corpus with a million distinct
    * values shuffles a million-row histogram and no global window),
    * and #groups-row closing arithmetic. Nothing corpus-sized is
    * sorted or serialized.
    */
  def rankSumTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    // 6-decimal quantized integer value — the portable exact surface
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        (col(valueCol).cast(DecimalType(18, 6)) * lit(1000000)).cast(LongType).as("__v"))
    val hist = rows.groupBy("__v").agg(count(lit(1)).as("__t"))
    val (bucketed, win) = TwoLevelCumsum.withOffsets(
      hist, expr("__v div 1000000L"), col("__t"), Seq(col("__v").asc))
    val ranked = bucketed
      .withColumn("__cum", col("__off") + sum("__w").over(win))
      // 2·midrank = 2·(cum − t) + t + 1
      .select(col("__v"), col("__t"),
        (lit(2) * (col("__cum") - col("__t")) + col("__t") + 1).as("__r2"))
    val perGroupVal = rows.groupBy("__g", "__v").agg(count(lit(1)).as("__n"))
    val stats = perGroupVal.join(ranked, "__v")
      .groupBy("__g")
      .agg(sum(col("__n")).as("n"),
        sum(col("__n").cast(dec) * col("__r2").cast(dec)).as("__r2sum"))
    val totals = hist.agg(
      sum("__t").cast(dec).as("__N"),
      sum(col("__t").cast(dec) * col("__t").cast(dec) * col("__t").cast(dec)
        - col("__t").cast(dec)).as("__ties"))
    val out = stats.crossJoin(broadcast(totals))
      .withColumn("__m", col("__N") - col("n")) // rest size
      // 2U = 2R − 2·n(n+1)/2 = __r2sum − n(n+1)
      .withColumn("__u2", col("__r2sum") - col("n").cast(dec) * (col("n") + 1).cast(dec))
      .withColumn("u", (col("__u2").cast("double") / 2.0))
      .withColumn("__mu2", col("n").cast(dec) * col("__m")) // 2·mean(U)
      .withColumn("__varU",
        (col("n").cast(dec) * col("__m")).cast("double") *
          ((col("__N") + 1).cast("double") -
            col("__ties").cast("double") /
              (col("__N") * (col("__N") - 1)).cast("double")) / 12.0)
      .withColumn("__num", (col("__u2") - col("__mu2")).cast("double") / 2.0)
      .withColumn("z", round(
        when(col("__varU") > 0,
          (col("__num") - signum(col("__num")) * 0.5) / sqrt(col("__varU"))), 4))
      .withColumn("rank_biserial", round(
        when(col("__mu2") > 0,
          col("__u2").cast("double") / col("__mu2").cast("double") - 1.0), 4))
      .select(col("__g").as(groupCol), col("n"), col("u"), col("z"),
        col("rank_biserial"))
    out
  }

  /** Kaplan–Meier survival curve per cohort over user lifetimes. A
    * user's lifetime is the day span from their first to their last
    * event; users whose last event falls within `censorDays` of the
    * log's end are right-CENSORED (still alive when observation
    * stopped), everyone else is an observed churn at their span. The
    * cohort is the type of the user's FIRST event (deterministic
    * min-struct tie-break on (ts, event_id)).
    *
    * S(t) = Π_{s ≤ t, d_s > 0} (1 − d_s/n_s), with n_s the at-risk
    * count (users whose span ≥ s). Greenwood's SE is included. The
    * products run as CUMULATIVE ORDERED log-sums over the per-cohort
    * day frame — a sequential, fixed-order fold both engines evaluate
    * identically (then rounded 6); counts d, c, n are exact integers
    * throughout.
    *
    * Scale shape: raw events collapse to one row per user (min/max
    * struct aggregation, map-side combined); the curve frame is
    * (cohort × distinct span) ≤ #cohorts × #days — calendar-bounded,
    * so the only windows run over ≤ #days rows per cohort.
    */
  def kaplanMeier(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts",
                  censorDays: Int = 7): DataFrame = {
    val atDay = survivalAtDay(events, userCol, typeCol, tsCol, censorDays)
    // at-risk n_t = Σ_{s >= t} (d_s + c_s): reverse cumulative over the
    // calendar-bounded per-cohort day frame
    val wDesc = Window.partitionBy("cohort").orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.partitionBy("cohort").orderBy(col("__t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atDay
      .withColumn("n_risk", sum(col("d") + col("__c")).over(wDesc))
      .withColumn("__lns", sum(
        when(col("d") > 0,
          log((col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0))).over(wAsc))
      .withColumn("__gw", sum(
        when(col("d") > 0 && col("n_risk") > col("d"),
          col("d").cast("double") /
            (col("n_risk").cast("double") * (col("n_risk") - col("d")).cast("double")))
          .otherwise(lit(0.0))).over(wAsc))
      .select(col("cohort"), col("__t").as("t_days"), col("n_risk"), col("d"),
        round(exp(col("__lns")), 6).as("survival"),
        round(exp(col("__lns")) * sqrt(col("__gw")), 6).as("greenwood_se"))
  }

  /** Shared survival scaffold: per-user lifetime spans collapsed to
    * the (cohort, span-day) event table — `d` observed churns, `__c`
    * right-censored exits — under [[kaplanMeier]]'s cohort and
    * censoring rules (first-event cohort with a deterministic
    * min-struct tie-break; censored iff the last event falls within
    * `censorDays` of the log end). One map-side min/max per user.
    */
  private def survivalAtDay(events: DataFrame, userCol: String,
                            typeCol: String, tsCol: String,
                            censorDays: Int): DataFrame = {
    val perUser = events
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(typeCol).as("__ty"), col("event_id").as("__eid"))
      .groupBy("__u")
      .agg(min(struct(col("__ts"), col("__eid"), col("__ty"))).as("__first"),
        max(to_date(col("__ts"))).as("__last"),
        min(to_date(col("__ts"))).as("__start"))
      .select(col("__u"), col("__first.__ty").as("cohort"),
        col("__start"), col("__last"))
    val logEnd = events.agg(max(to_date(col(tsCol))).as("__end"))
    val spans = perUser.crossJoin(broadcast(logEnd))
      .select(col("cohort"),
        datediff(col("__last"), col("__start")).cast(LongType).as("__t"),
        (datediff(col("__end"), col("__last")) < censorDays).as("__censored"))
    spans.groupBy("cohort", "__t")
      .agg(sum(when(!col("__censored"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__censored"), 1L).otherwise(0L)).as("__c"))
  }

  /** Nelson–Aalen cumulative-hazard curve per cohort — the estimator
    * dual to [[kaplanMeier]]: H(t) = Σ_{s ≤ t} d_s/n_s with Klein's
    * variance Σ d_s(n_s − d_s)/n_s³. Both accumulate as ORDERED
    * window folds over the calendar-bounded per-cohort day frame (a
    * fixed-order sequential sum both engines evaluate identically);
    * the d and n_risk counts are exact integers throughout.
    */
  def nelsonAalen(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts",
                  censorDays: Int = 7): DataFrame = {
    val atDay = survivalAtDay(events, userCol, typeCol, tsCol, censorDays)
    val wDesc = Window.partitionBy("cohort").orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.partitionBy("cohort").orderBy(col("__t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atDay
      .withColumn("n_risk", sum(col("d") + col("__c")).over(wDesc))
      .withColumn("__h", sum(
        when(col("d") > 0,
          col("d").cast("double") / col("n_risk").cast("double"))
          .otherwise(lit(0.0))).over(wAsc))
      .withColumn("__v", sum(
        when(col("d") > 0,
          col("d").cast("double") * (col("n_risk") - col("d")).cast("double") /
            (col("n_risk").cast("double") * col("n_risk").cast("double") *
              col("n_risk").cast("double")))
          .otherwise(lit(0.0))).over(wAsc))
      .select(col("cohort"), col("__t").as("t_days"), col("n_risk"), col("d"),
        round(col("__h"), 6).as("cum_hazard"),
        round(sqrt(col("__v")), 6).as("na_se"))
  }

  /** One-vs-rest log-rank test per cohort: at every span-day where
    * ANY cohort records an observed churn, the cohort's observed
    * deaths d₁ compare against the expectation n₁·d/n under the null
    * of equal hazards, with the hypergeometric variance
    * d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1); z = (O−E)/√V. O is an exact
    * integer sum; E and V accumulate as ORDERED window folds over the
    * dense (cohort × span-day) frame and the final row is selected by
    * max-struct — no unordered floating-point aggregation anywhere.
    *
    * Scale shape: the dense frame is #cohorts × #distinct span-days —
    * calendar-bounded per cohort; at-risk counts are the same reverse
    * cumulative as [[kaplanMeier]]; per-day totals roll up over the
    * bounded cohort fan-out.
    */
  def logRankOneVsRest(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type", tsCol: String = "ts",
                       censorDays: Int = 7): DataFrame = {
    val atDay = survivalAtDay(events, userCol, typeCol, tsCol, censorDays)
    val times = atDay.select("__t").distinct()
    val cohorts = atDay.groupBy("cohort")
      .agg(sum(col("d") + col("__c")).as("n_users"))
    val dense = cohorts.crossJoin(broadcast(times))
      .join(atDay, Seq("cohort", "__t"), "left")
      .select(col("cohort"), col("n_users"), col("__t"),
        coalesce(col("d"), lit(0L)).as("__d1"),
        coalesce(col("__c"), lit(0L)).as("__c1"))
    val wDesc = Window.partitionBy("cohort").orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = dense
      .withColumn("__n1", sum(col("__d1") + col("__c1")).over(wDesc))
    val totals = risked.groupBy("__t")
      .agg(sum("__d1").as("__dt"), sum("__n1").as("__nt"))
    val wAsc = Window.partitionBy("cohort").orderBy(col("__t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = risked.join(totals, "__t")
      .withColumn("__e", sum(
        when(col("__dt") > 0,
          col("__n1").cast("double") * col("__dt").cast("double") /
            col("__nt").cast("double")).otherwise(lit(0.0))).over(wAsc))
      .withColumn("__v", sum(
        when(col("__dt") > 0 && col("__nt") > 1,
          col("__dt").cast("double") *
            (col("__n1").cast("double") / col("__nt").cast("double")) *
            (lit(1.0) - col("__n1").cast("double") / col("__nt").cast("double")) *
            (col("__nt") - col("__dt")).cast("double") /
            (col("__nt").cast("double") - lit(1.0)))
          .otherwise(lit(0.0))).over(wAsc))
    joined.groupBy("cohort")
      .agg(max("n_users").as("n_users"),
        sum(when(col("__dt") > 0, col("__d1")).otherwise(0L)).as("observed"),
        max(struct(col("__t"), col("__e"), col("__v"))).as("__last"))
      .select(col("cohort"), col("n_users"), col("observed"),
        round(col("__last.__e"), 4).as("expected"),
        // e4 lattice: O − E over balanced cohorts is a ±ε fp residue
        graft.functions.Lattice.e4(when(col("__last.__v") > 0,
          (col("observed").cast("double") - col("__last.__e")) /
            sqrt(col("__last.__v")))).as("logrank_z"))
  }

  /** Brown's double exponential smoothing (level + trend) on each
    * group's daily event count, with the q170/q171 dyadic-decay trick
    * applied TWICE: S′ is the W-term truncated EWMA with weight
    * 2^{W−1−j}/2^W, and S″ = EWMA(S′) expands to a single closed-form
    * kernel — Σ_{a+b=j} 2^{W−1−a}·2^{W−1−b} = (j+1)·2^{2W−2−j} for
    * j < W — so BOTH smoothings are one exact integer convolution
    * (Decimal(38,0) numerators over 2^W and 2^{2W}) and the level/
    * trend/forecast close with fixed-order double arithmetic:
    * level = 2S′ − S″, trend = S′ − S″ (α = 1/2 makes α/(1−α) = 1),
    * forecast(h) = level + h·trend. No recursion, no float
    * accumulation, bit-stable across engines and retries.
    *
    * Scale shape: identical to ewmaDaily — calendar-bounded daily
    * frame, ≤ 2W-way map-side explode, hash equi-joins on
    * (group, day). Envelope: count·(j+1)·2^{2W−2} ≤ 10³⁸ holds to
    * W = 20 for daily counts below ~10¹².
    */
  def brownTrendDaily(events: DataFrame, groupCol: String = "event_type",
                      tsCol: String = "ts", windowDays: Int = 12,
                      horizonDays: Int = 7): DataFrame = {
    require(windowDays >= 2 && windowDays <= 20, s"windowDays out of range: $windowDays")
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("__n"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "day"), "left")
      .select(col("__g"), col("day"), coalesce(col("__n"), lit(0L)).as("__n"))
    val dec = DecimalType(38, 0)
    val w = windowDays
    // single kernel: source day s contributes to target s+j
    //   S'-numerator:  x_s · 2^{W−1−j}            (j < W)
    //   S''-numerator: x_s · (j+1) · 2^{2W−2−j}   (j < 2W−1, truncated at W terms per leg)
    // the S'' kernel for j ≥ W drops the out-of-window split pairs:
    //   k2(j) = Σ_{a,b<W, a+b=j} 2^{2W−2−j} = (W − |j − (W−1)|) · 2^{2W−2−j}
    val contrib = dense
      .withColumn("__j", explode(array((0 until 2 * w - 1).map(lit): _*)))
      .select(col("__g"), date_add(col("day"), col("__j")).as("day"),
        when(col("__j") < w,
          col("__n").cast(dec) *
            expr(s"shiftleft(CAST(1 AS BIGINT), ${w - 1} - __j)").cast(dec))
          .otherwise(lit(0).cast(dec)).as("__s1"),
        (col("__n").cast(dec) *
          (lit(w).cast(dec) - abs(col("__j") - lit(w - 1)).cast(dec)) *
          expr(s"shiftleft(CAST(1 AS BIGINT), ${2 * w - 2} - __j)").cast(dec))
          .as("__s2"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("__g", "day")
      .agg(sum("__s1").as("__n1"), sum("__s2").as("__n2"))
    val out = contrib
      .join(dense.select(col("__g"), col("day"), col("__n").as("n_events")),
        Seq("__g", "day"))
      .withColumn("__sp", col("__n1").cast("double") / lit((1L << w).toDouble))
      .withColumn("__spp", col("__n2").cast("double") / lit((1L << w).toDouble * (1L << w).toDouble))
      .select(col("__g").as(groupCol), col("day"), col("n_events"),
        // e6 lattice on all three: level/trend/forecast are fp
        // differences of the two smoothed series — a flat series
        // cancels trend to a ±ε residue (VERDICT r15 #2)
        graft.functions.Lattice.e6(lit(2.0) * col("__sp") - col("__spp"))
          .as("level"),
        graft.functions.Lattice.e6(col("__sp") - col("__spp")).as("trend"),
        graft.functions.Lattice.e6(lit(2.0) * col("__sp") - col("__spp") +
          lit(horizonDays.toDouble) * (col("__sp") - col("__spp")))
          .as("forecast"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** Calendar gap-fill with linear interpolation: each group's daily
    * mean value on the dense day grid, with absent days filled by the
    * straight line between the nearest observed neighbors (exact
    * fraction (d−prev)/(next−prev) of exact per-day means; edge days
    * before the first / after the last observation stay NULL and are
    * flagged). The standard time-series regularization step before
    * any fixed-step model.
    *
    * Exactness: per-day means are single divisions of Decimal(38,6)
    * sums; interpolation is a fixed-order expression of those two
    * doubles and two integer day distances, rounded 6.
    *
    * Scale shape: raw events collapse map-side to (group, day); the
    * fill windows (last/first non-null) run over the calendar-bounded
    * dense frame, ≤ #days rows per group.
    */
  def gapFillDaily(events: DataFrame, groupCol: String = "event_type",
                   tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val dec6 = DecimalType(18, 6)
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("day"),
        col(valueCol).cast(dec6).as("__v"))
      .groupBy("__g", "day")
      .agg(count(lit(1)).as("__n"), sum("__v").as("__sv"))
      .withColumn("__mean",
        col("__sv").cast("double") / col("__n").cast("double"))
    daily.persist()
    val groups = daily.select("__g").distinct()
    val days = daily.select("day").distinct()
    val dense = groups.crossJoin(days)
      .join(daily, Seq("__g", "day"), "left")
    val wBack = Window.partitionBy("__g").orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy("__g").orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = dense
      .withColumn("__pd", last(when(col("__mean").isNotNull, col("day")), ignoreNulls = true).over(wBack))
      .withColumn("__pv", last(col("__mean"), ignoreNulls = true).over(wBack))
      .withColumn("__nd", last(when(col("__mean").isNotNull, col("day")), ignoreNulls = true).over(wFwd))
      .withColumn("__nv", last(col("__mean"), ignoreNulls = true).over(wFwd))
      .withColumn("filled", round(
        when(col("__mean").isNotNull, col("__mean"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") +
              (col("__nv") - col("__pv")) *
                (datediff(col("day"), col("__pd")).cast("double") /
                  datediff(col("__nd"), col("__pd")).cast("double"))), 6))
      .select(col("__g").as(groupCol), col("day"),
        coalesce(col("__n"), lit(0L)).as("n_events"), col("filled"),
        (col("__mean").isNull && col("filled").isNotNull).as("interpolated"))
      .transform(graft.state.Checkpoints.stable)
    daily.unpersist()
    out
  }

  /** GROUPED population-stability index on exact ORDER-STATISTIC
    * decile bands, integer-only closing (VERDICT r15 #5) — the
    * per-source drift monitor production teams actually deploy
    * beside the statistician's KS (q340/q342): one PSI row per group,
    * reference vs current sample, with band edges the reference
    * side's exact decile order statistics (edge_i = min{v : 10·rank ≥
    * i·n} — pure integers, NO percentile_cont interpolation, so bin
    * membership is version-proof), Laplace-smoothed dense 10-bin
    * shares (the [[psiDrift]] (c+1)/(n+10) convention so empty bins
    * stay finite), and the closing Σ(p_c − p_r)·ln(p_c/p_r) shipped
    * on the e6 floor lattice as a BIGINT — no float column leaves the
    * operator. Groups with no reference rows drop (no bands to stand
    * on); PSI < 0.1 is the conventional "stable" read, > 0.25 "major
    * shift" (each ~100k on the e6 lattice).
    *
    * Scale shape: per-side (group, value) histograms with map-side
    * combine; the rank window runs over DISTINCT values per group
    * (the q340 grouped-ECDF discipline — never raw rows); the 9-edge
    * frame joins back against the HISTOGRAM (a ≤ 9× blowup of
    * histogram rows, not data rows); the dense (group × side × 10)
    * grid is model-sized.
    */
  def psiBandedGrouped(ref: DataFrame, cur: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    def hist(df: DataFrame) = df
      .select(col(groupCol).as("__g"), col(valueCol).cast(LongType).as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val ra = hist(ref)
    val rb = hist(cur)
    val totA = ra.groupBy("__g").agg(sum("__c").as("__n"))
    val totB = rb.groupBy("__g").agg(sum("__c").as("__n"))
    val wCum = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exact decile edges of the REFERENCE: min v whose running count
    // covers ceil(i·n/10) — b·cum ≥ i·n is the integer form of the
    // ceiling comparison
    val edges = ra.withColumn("__cum", sum("__c").over(wCum))
      .join(totA, "__g")
      .withColumn("__i", explode(array((1 to 9).map(i => lit(i)): _*)))
      .filter(col("__cum") * 10 >= col("__i") * col("__n"))
      .groupBy("__g", "__i").agg(min("__v").as("__e"))
    def binned(h: DataFrame, side: String) = h
      .join(edges, "__g") // inner: groups without reference bands drop
      .groupBy("__g", "__v")
      .agg(first("__c").as("__c"),
        sum(when(col("__v") > col("__e"), 1).otherwise(0)).as("__bin"))
      .groupBy("__g", "__bin").agg(sum("__c").as("__c"))
      .withColumn("__side", lit(side))
    val counts = binned(ra, "ref").unionByName(binned(rb, "cur"))
    val grid = edges.select("__g").distinct()
      .withColumn("__side", explode(array(lit("ref"), lit("cur"))))
      .withColumn("__bin", explode(array((0 to 9).map(i => lit(i)): _*)))
    val tot = totA.withColumn("__side", lit("ref"))
      .unionByName(totB.withColumn("__side", lit("cur")))
    val shares = grid.join(tot, Seq("__g", "__side"))
      .join(counts, Seq("__g", "__side", "__bin"), "left")
      .withColumn("__p", (coalesce(col("__c"), lit(0L)) + 1).cast("double")
        / (col("__n") + 10).cast("double"))
    val wide = shares.groupBy("__g", "__bin")
      .agg(max(when(col("__side") === "ref", col("__p"))).as("__pr"),
        max(when(col("__side") === "cur", col("__p"))).as("__pc"))
      .filter(col("__pr").isNotNull && col("__pc").isNotNull)
    wide.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_bins"),
        floor(sum((col("__pc") - col("__pr")) *
          log(col("__pc") / col("__pr"))) * lit(1e6d) + lit(0.5d))
          .cast(LongType).as("psi_e6"))
      .join(totA.select(col("__g").as(groupCol), col("__n").as("n_ref")),
        groupCol)
      .join(totB.select(col("__g").as(groupCol), col("__n").as("n_cur")),
        groupCol)
      .select(col(groupCol), col("n_ref"), col("n_cur"),
        col("n_bins"), col("psi_e6"))
  }

  /** Population stability index between a reference and a current
    * window of the log — THE production drift metric for "has this
    * feature's distribution moved". The calendar is split at
    * `splitFrac` of its distinct-day span (reference = earlier days);
    * value bins are the reference window's exact deciles
    * (percentile_cont), and PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/
    * p_ref) with Laplace-smoothed shares so empty bins stay finite.
    *
    * Exactness: bin edges are exact type-7 quantiles of the 6-decimal
    * quantized values; bin counts are integers; each share is one
    * division and the 11-term closing sum is rounded 6 (the q200
    * short-fixed-sum envelope). Deterministic bin assignment: edges
    * are broadcast literals-by-construction, membership is `<=` on
    * exact decimals.
    *
    * Scale shape: two map-side-combined (group, bin) counts and a
    * #groups×9-row quantile frame; no window touches raw rows.
    */
  def psiDrift(events: DataFrame, groupCol: String = "event_type",
               tsCol: String = "ts", valueCol: String = "value",
               splitFrac: Double = 0.5): DataFrame = {
    val dec6 = DecimalType(18, 6)
    val rows = events.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"),
        col(valueCol).cast(dec6).as("__v"))
    rows.persist()
    // split day: the day at splitFrac of the distinct-day span
    val daySpan = rows.agg(min("__day").as("__d0"), max("__day").as("__d1"))
      .select(expr(s"date_add(__d0, CAST(floor(datediff(__d1, __d0) * $splitFrac) AS INT))")
        .as("__split"))
    val tagged = rows.crossJoin(broadcast(daySpan))
      .withColumn("__cur", col("__day") > col("__split"))
    val edgeCols = (1 to 9).map(i =>
      expr(s"percentile_cont(0.${i}) WITHIN GROUP (ORDER BY CAST(__v AS DOUBLE))")
        .as(s"__e$i"))
    val edges = tagged.filter(!col("__cur"))
      .groupBy("__g")
      .agg(edgeCols.head, edgeCols.tail: _*)
    val binned = tagged.join(broadcast(edges), "__g")
      .withColumn("__bin",
        (1 to 9).foldRight(lit(9): Column) { case (i, rest) =>
          when(col("__v").cast("double") <= col(s"__e$i"), lit(i - 1)).otherwise(rest)
        })
      .groupBy("__g", "__cur", "__bin")
      .agg(count(lit(1)).as("__n"))
    val totals = binned.groupBy("__g", "__cur").agg(sum("__n").as("__tot"))
    // dense (group × window × bin) grid so empty bins get their
    // Laplace share instead of silently vanishing from the sum
    val grid = binned.select("__g").distinct()
      .withColumn("__cur", explode(array(lit(false), lit(true))))
      .withColumn("__bin", explode(array((0 to 9).map(lit): _*)))
    val shares = grid
      .join(broadcast(totals), Seq("__g", "__cur"))
      .join(binned, Seq("__g", "__cur", "__bin"), "left")
      .withColumn("__p",
        (coalesce(col("__n"), lit(0L)) + 1).cast("double") /
          (col("__tot") + 10).cast("double"))
    val wide = shares
      .groupBy("__g", "__bin")
      .agg(max(when(!col("__cur"), col("__p"))).as("__pr"),
        max(when(col("__cur"), col("__p"))).as("__pc"))
      .filter(col("__pr").isNotNull && col("__pc").isNotNull)
    val out = wide.groupBy("__g")
      // e6 lattice: PSI over an undrifted column is a fp sum of
      // near-zero signed products — a ±ε residue (VERDICT r15 #2)
      .agg(graft.functions.Lattice.e6(
        sum((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr"))))
        .as("psi"),
        count(lit(1)).as("n_bins"))
      .select(col("__g").as(groupCol), col("n_bins"), col("psi"))
      .transform(graft.state.Checkpoints.stable)
    rows.unpersist()
    out
  }

  /** One-vs-rest ranking metrics per class: the exact AUC from the
    * midrank identity AUC = U / (n·m) (the probability a random
    * in-class score outranks a random rest score, ties at ½), and the
    * exact Kolmogorov–Smirnov separation D = max_v |F⁺(v) − F⁻(v)|
    * with its achieving threshold (ties broken toward the SMALLEST
    * threshold). Scores quantize to 6-decimal integers (the q201
    * portable surface); every statistic is integer/Decimal(38,0)
    * until the closing divisions.
    *
    * Scale shape: the corpus collapses to the (value) histogram and
    * the (class, value) counts — both one map-side-combined shuffle.
    * Global positions come from the two-level cumsum; the KS sweep
    * runs on the (class × distinct-value) frame, a bounded #classes
    * fan-out of the histogram, with the per-class cumulative via the
    * GROUPED two-level cumsum — no per-class single-task window over
    * a corpus-sized value axis.
    */
  def rankingMetrics(df: DataFrame, groupCol: String,
                     scoreCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(col(scoreCol).isNotNull)
      .select(col(groupCol).as("__g"),
        (col(scoreCol).cast(DecimalType(18, 6)) * lit(1000000))
          .cast(LongType).as("__v"))
    val hist = rows.groupBy("__v").agg(count(lit(1)).as("__t"))
    val (bucketed, win) = TwoLevelCumsum.withOffsets(
      hist, expr("__v div 1000000L"), col("__t"), Seq(col("__v").asc))
    val cums = bucketed
      .withColumn("__cum", col("__off") + sum("__w").over(win))
      .select(col("__v"), col("__t"), col("__cum"),
        // 2·midrank of the value run — kept doubled so it stays integer
        (lit(2) * (col("__cum") - col("__t")) + col("__t") + 1).as("__r2"))
    val classes = rows.groupBy("__g").agg(count(lit(1)).as("__n"))
    val pgv = rows.groupBy("__g", "__v").agg(count(lit(1)).as("__ng"))
    val totals = hist.agg(sum("__t").cast(dec).as("__tn"))
    // dense (class × value) frame: every CDF step visible to each class
    val dense = cums.crossJoin(broadcast(classes))
      .join(pgv, Seq("__g", "__v"), "left")
      .withColumn("__ng", coalesce(col("__ng"), lit(0L)))
    val (gb, gwin) = TwoLevelCumsum.withGroupedOffsets(
      dense, Seq("__g"), expr("__v div 1000000L"), col("__ng"),
      Seq(col("__v").asc))
    val swept = gb
      .withColumn("__cp", col("__off") + sum("__w").over(gwin))
      .crossJoin(broadcast(totals))
      .withColumn("__m", col("__tn") - col("__n"))
      // |cumPos·m − cumNeg·n| — the KS numerator, exact
      .withColumn("__num", abs(col("__cp").cast(dec) * col("__m") -
        (col("__cum") - col("__cp")).cast(dec) * col("__n").cast(dec)))
    val ks = swept.groupBy("__g")
      .agg(max(struct(col("__num"), (-col("__v")).as("__negv"))).as("__kk"))
      .select(col("__g"), col("__kk.__num").as("__ksnum"),
        (-col("__kk.__negv")).as("__ksv"))
    val r2sum = pgv.join(cums.select("__v", "__r2"), "__v")
      .groupBy("__g")
      .agg(sum(col("__ng").cast(dec) * col("__r2").cast(dec)).as("__r2sum"))
    classes.join(r2sum, "__g").join(ks, "__g")
      .crossJoin(broadcast(totals))
      .withColumn("__m", col("__tn") - col("__n"))
      .withColumn("__u2", col("__r2sum") -
        col("__n").cast(dec) * (col("__n") + 1).cast(dec))
      .withColumn("__nm", col("__n").cast(dec) * col("__m"))
      .select(col("__g").as(groupCol),
        col("__n").as("n_pos"),
        col("__m").cast(LongType).as("n_neg"),
        round(when(col("__nm") > 0,
          col("__u2").cast("double") / (col("__nm").cast("double") * 2.0)), 6)
          .as("auc"),
        round(when(col("__nm") > 0,
          col("__ksnum").cast("double") / col("__nm").cast("double")), 6)
          .as("ks"),
        round(col("__ksv").cast("double") / 1000000.0, 6).as("ks_threshold"))
  }

  /** Welch's unequal-variance t-test, each class against the rest of
    * the corpus. Values quantize to 6-decimal integers; per-class
    * count / sum / sum-of-squares are exact Decimal(38,0) moments and
    * the REST moments are total-minus-class (one corpus pass, no
    * second scan), so the whole statistic reduces to one closing
    * double expression per class — mean difference over the pooled
    * standard error, with the Welch–Satterthwaite degrees of freedom.
    *
    * Scale shape: a single map-side-combined groupBy(class) plus a
    * broadcast 1-row totals frame; output is #classes rows.
    */
  def welchTTest(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        (col(valueCol).cast(DecimalType(18, 6)) * lit(1000000))
          .cast(LongType).as("__v"))
    val per = rows.groupBy("__g").agg(
      count(lit(1)).as("__n"),
      sum(col("__v").cast(dec)).as("__s"),
      sum(col("__v").cast(dec) * col("__v").cast(dec)).as("__q"))
    val tot = per.agg(sum("__n").as("__cnt"),
      sum("__s").as("__ts"), sum("__q").as("__tq"))
    // raw-unit doubles: the oracle mirrors this exact expression tree
    def meanOf(s: Column, n: Column): Column =
      s.cast("double") / n.cast("double") / 1e6
    def varOf(q: Column, s: Column, n: Column): Column =
      (q.cast("double") - s.cast("double") * s.cast("double") /
        n.cast("double")) / (n.cast("double") - 1.0) / 1e12
    per.crossJoin(broadcast(tot))
      .withColumn("__m", col("__cnt") - col("__n"))
      .withColumn("__mean1", meanOf(col("__s"), col("__n")))
      .withColumn("__mean2", meanOf(col("__ts") - col("__s"), col("__m")))
      .withColumn("__se1",
        varOf(col("__q"), col("__s"), col("__n")) / col("__n").cast("double"))
      .withColumn("__se2",
        varOf(col("__tq") - col("__q"), col("__ts") - col("__s"), col("__m")) /
          col("__m").cast("double"))
      .withColumn("__se", col("__se1") + col("__se2"))
      .select(col("__g").as(groupCol),
        col("__n").as("n"),
        // UNROUNDED closings: every op in the tree (int->double cast,
        // -, *, /, sqrt) is IEEE correctly rounded, so the raw double
        // is bit-identical across engines AND engine versions — while
        // round(x, n) is engine-implemented (half-boundary + -0.0
        // snap hazards; the r9 driver split q213's t on -0.0 vs +0.0)
        col("__mean1").as("mean"),
        when(col("__n") > 1 && col("__m") > 1 && col("__se") > 0,
          (col("__mean1") - col("__mean2")) / sqrt(col("__se"))).as("t"),
        when(col("__n") > 1 && col("__m") > 1 && col("__se") > 0,
          col("__se") * col("__se") /
            (col("__se1") * col("__se1") / (col("__n").cast("double") - 1.0) +
              col("__se2") * col("__se2") / (col("__m").cast("double") - 1.0)))
          .as("df"))
  }

  /** Removal-effect channel attribution: a converting user DEPENDS on
    * a channel if it appears among their touches strictly before
    * their first conversion; removing the channel would (path-wise)
    * lose exactly those conversions. Each channel reports its
    * dependent-conversion count, the removal effect (share of all
    * conversions lost), and the removal-normalized attribution share.
    * All counting is exact integers; two closing divisions.
    *
    * Scale shape: first-conversion instants are one map-side min per
    * user; the touch scan joins on the user key only (shuffle on
    * user); channel rollups are #channels rows.
    */
  def removalEffectAttribution(events: DataFrame,
                               userCol: String = "user_id",
                               typeCol: String = "event_type",
                               tsCol: String = "ts",
                               convType: String = "purchase"): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__cts"))
    val nConv = conv.agg(count(lit(1)).as("__nc"))
    val depend = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        col(tsCol).as("__ts"))
      .join(conv, "__u")
      .filter(col("__ts") < col("__cts"))
      .select("__u", "channel").distinct()
    val perChannel = depend.groupBy("channel")
      .agg(count(lit(1)).as("n_dependent"))
    val denom = perChannel.agg(sum("n_dependent").as("__tot"))
    perChannel.crossJoin(broadcast(nConv)).crossJoin(broadcast(denom))
      .select(col("channel"), col("n_dependent"),
        round(col("n_dependent").cast("double") / col("__nc").cast("double"),
          6).as("removal_effect"),
        round(col("n_dependent").cast("double") / col("__tot").cast("double"),
          6).as("attribution_share"))
  }

  /** Fleiss' kappa multi-rater agreement (Fleiss 1971) — the
    * labeling-pipeline QA statistic for 3+ annotators that Cohen's
    * kappa (q199) can't express. Input is one row per (item, rater)
    * with a categorical label; every item must carry exactly
    * `nRaters` ratings (the statistic's own precondition).
    *
    * Exactness: with num1 = Σᵢⱼ n²ᵢⱼ − N·n, D1 = N·n·(n−1), S2 =
    * Σⱼ c²ⱼ, D2 = (N·n)², the whole statistic is
    * κ = (num1·D2 − S2·D1) / (D1·(D2 − S2)) — every term an exact
    * Decimal(38,0) product of counts, three closing double divisions
    * (P̄, Pₑ, κ), rounded 6. Envelope: D1·D2 < 10³⁸ holds to
    * N ~ 10¹² items at n ≤ 3.
    *
    * Scale shape: one (item, label) count with map-side combine, one
    * #items-keyed aggregate, one #labels-keyed aggregate, then a
    * 1-row cross join. No windows, no collects.
    */
  def fleissKappa(labels: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String, nRaters: Int): DataFrame = {
    val dec = DecimalType(38, 0)
    val nij = labels.groupBy(col(itemCol).as("__i"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__nij"))
    val perItem = nij.agg(
      sum(col("__nij").cast(dec) * col("__nij").cast(dec)).as("__ssq"),
      count_distinct(col("__i")).as("__ni"))
    val perLabel = nij.groupBy("__l").agg(sum("__nij").as("__c"))
      .agg(sum(col("__c").cast(dec) * col("__c").cast(dec)).as("__s2"),
        count(lit(1)).as("__k"))
    perItem.crossJoin(perLabel)
      .withColumn("__nr", lit(nRaters.toLong))
      .withColumn("__num1",
        col("__ssq") - col("__ni").cast(dec) * col("__nr").cast(dec))
      .withColumn("__d1", col("__ni").cast(dec) * col("__nr").cast(dec) *
        (col("__nr") - 1).cast(dec))
      .withColumn("__d2", col("__ni").cast(dec) * col("__nr").cast(dec) *
        col("__ni").cast(dec) * col("__nr").cast(dec))
      .select(col("__ni").as("n_items"), col("__nr").as("n_raters"),
        col("__k").as("n_categories"),
        round(col("__num1").cast("double") / col("__d1").cast("double"), 6)
          .as("p_bar"),
        round(col("__s2").cast("double") / col("__d2").cast("double"), 6)
          .as("p_e"),
        round((col("__num1") * col("__d2") - col("__s2") * col("__d1"))
          .cast("double") /
          (col("__d1") * (col("__d2") - col("__s2"))).cast("double"), 6)
          .as("fleiss_kappa"))
  }

  /** Gains/lift table: rows rank by score DESCENDING into `nBins`
    * rank bins and each bin reports its positive capture — cumulative
    * gain (recall at depth), precision at depth, and lift over the
    * base rate. A tied score run is atomic: the whole run lands in
    * the bin of its LAST global position (bin = ⌈nBins·cum/N⌉, exact
    * integer arithmetic), so bins are deterministic under ties in
    * both engines — no row-arbitrary NTILE.
    *
    * Scale shape: the corpus collapses to the (score → n, n_pos)
    * histogram; global descending positions via the two-level cumsum;
    * the only ordered window after that runs over the ≤ nBins-row
    * aggregated frame.
    */
  def gainsTable(df: DataFrame, scoreCol: String, positive: Column,
                 nBins: Int = 10): DataFrame = {
    val rows = df.filter(col(scoreCol).isNotNull)
      .select((col(scoreCol).cast(DecimalType(18, 6)) * lit(1000000))
        .cast(LongType).as("__v"),
        positive.cast(LongType).as("__y"))
    val hist = rows.groupBy("__v")
      .agg(count(lit(1)).as("__t"), sum("__y").as("__p"))
      .withColumn("__u", -col("__v"))
    val (bucketed, win) = TwoLevelCumsum.withOffsets(
      hist, expr("__u div 1000000L"), col("__t"), Seq(col("__u").asc))
    val totals = hist.agg(sum("__t").as("__tn"), sum("__p").as("__tp"))
    val binned = bucketed
      .withColumn("__cum", col("__off") + sum("__w").over(win))
      .crossJoin(broadcast(totals))
      .withColumn("bin",
        expr(s"(${nBins}L * __cum + __tn - 1L) div __tn").cast(IntegerType))
      .groupBy("bin")
      .agg(sum("__t").as("n"), sum("__p").as("n_pos"))
    // ≤ nBins rows: the global ordered window is bounded by construction
    val wb = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("cum_n", sum("n").over(wb))
      .withColumn("cum_pos", sum("n_pos").over(wb))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n"), col("n_pos"), col("cum_n"), col("cum_pos"),
        round(col("cum_pos").cast("double") / col("__tp").cast("double"), 6)
          .as("gain"),
        round(col("cum_pos").cast("double") / col("cum_n").cast("double"), 6)
          .as("precision_at"),
        round((col("cum_pos").cast("double") / col("cum_n").cast("double")) /
          (col("__tp").cast("double") / col("__tn").cast("double")), 6)
          .as("lift"))
  }

  /** CUPED experiment readout (Deng et al. 2013 — Controlled
    * experiments Using Pre-Experiment Data): per experiment arm, the
    * post-period activity metric and its variance-reduced CUPED
    * adjustment Y′ = Y − θ·(X − X̄) with X the user's PRE-period
    * activity and θ = cov(X,Y)/var(X) pooled over all users. Arms are
    * assigned by the engine-portable md5 bucket of the user id (a
    * pure function — re-runs, engines, and cluster sizes agree);
    * pre/post is the calendar-half split ([[psiDrift]]'s convention).
    *
    * Exactness: every moment (n, Σx, Σy, Σxy, Σx², Σy²) accumulates
    * in Decimal(38,0); θ is ONE closing division of exact integers
    * (the N² factors cancel), and each variance identity
    *   var(Y′) = var(Y) − 2θ·cov(X,Y) + θ²·var(X)
    * closes in a fixed-order double tree over exact-integer
    * numerators mirrored verbatim by the oracle — the per-user
    * adjusted values are never materialized, so there is no unordered
    * fp summation anywhere. Degenerate var(X) = 0 yields NULL θ and
    * NULL adjusted columns rather than garbage.
    *
    * Scale shape: one (user)-keyed count pass, one #arms-row
    * aggregate, one broadcast of the 1-row pooled moments.
    */
  def cupedReport(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", salt: String = "exp",
                  splitFrac: Double = 0.5): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = events.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day"))
    val daySpan = rows.agg(min("__day").as("__d0"), max("__day").as("__d1"))
      .select(expr(
        s"date_add(__d0, CAST(floor(datediff(__d1, __d0) * $splitFrac) AS INT))")
        .as("__split"))
    val perUser = rows.crossJoin(broadcast(daySpan))
      .groupBy("__u")
      .agg(sum(when(col("__day") <= col("__split"), 1L).otherwise(0L))
        .cast(dec).as("__x"),
        sum(when(col("__day") > col("__split"), 1L).otherwise(0L))
          .cast(dec).as("__y"))
      .withColumn("arm", when(SplitOps.hashBucket(
        concat(col("__u").cast(StringType), lit("|" + salt))) % 2 === 0,
        lit("control")).otherwise(lit("treatment")))
    perUser.persist()
    val perArm = perUser.groupBy("arm").agg(
      count(lit(1)).cast(dec).as("__n"),
      sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val pooled = perUser.agg(
      count(lit(1)).cast(dec).as("__tn"),
      sum("__x").as("__tsx"), sum("__y").as("__tsy"),
      sum(col("__x") * col("__y")).as("__tsxy"),
      sum(col("__x") * col("__x")).as("__tsxx"))
    val thetaNum = (col("__tn") * col("__tsxy") - col("__tsx") * col("__tsy"))
      .cast("double")
    val thetaDen = (col("__tn") * col("__tsxx") - col("__tsx") * col("__tsx"))
      .cast("double")
    val n2 = (col("__n") * col("__n")).cast("double")
    val vy = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double") / n2
    val cv = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double") / n2
    val vx = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double") / n2
    val my = col("__sy").cast("double") / col("__n").cast("double")
    val mxa = col("__sx").cast("double") / col("__n").cast("double")
    val mxAll = col("__tsx").cast("double") / col("__tn").cast("double")
    val theta = when(thetaDen > 0, thetaNum / thetaDen)
    val varCuped = vy - lit(2.0) * theta * cv + theta * theta * vx
    val out = perArm.crossJoin(broadcast(pooled))
      .select(col("arm"),
        col("__n").cast(LongType).as("n_users"),
        round(my, 6).as("mean_y"),
        // e6/e4 lattices on the fp-composed closings (mean_y_cuped,
        // varCuped, the reduction pct are FLOATING-POINT differences
        // of exact ratios — a perfectly-correlated covariate cancels
        // varCuped to a ±ε residue, the signed-zero round() hazard;
        // my / vy / theta are single correctly-rounded divisions of
        // exact Decimal moments, where a mathematical zero is exactly
        // +0.0 — VERDICT r15 #2)
        graft.functions.Lattice.e6(my - theta * (mxa - mxAll))
          .as("mean_y_cuped"),
        round(vy, 6).as("var_y"),
        graft.functions.Lattice.e6(varCuped).as("var_y_cuped"),
        graft.functions.Lattice.e4(
          when(vy > 0, (lit(1.0) - varCuped / vy) * 100.0))
          .as("var_reduction_pct"),
        round(theta, 6).as("theta"))
      .transform(graft.state.Checkpoints.stable)
    perUser.unpersist()
    out
  }

  /** Temporal-holdout evaluation of [[itemSimilarity]] — the recsys
    * twin of the q230 retrieval eval: feedback before the calendar
    * split trains the item-item cosine model, feedback after it is
    * the held-out truth. A user's candidate set is the union of the
    * top-k neighbours of their TRAINING items minus the training
    * items themselves ("already bought"); the user scores a hit when
    * any candidate appears in their holdout purchases. Only users
    * with activity on BOTH sides of the split are evaluable.
    *
    * Output is one row: evaluable users, hit users, hit rate, and the
    * mean candidate-set size (the coverage/precision trade dial) —
    * counts exact, each rate ONE closing division.
    *
    * Scale shape: [[itemSimilarity]]'s own discipline (capped
    * baskets, bounded-heap top-k) plus three hash joins keyed on the
    * user/item and two distinct-aggregations; no windows, no
    * collects.
    */
  def itemRecHoldout(df: DataFrame, userCol: String, itemCol: String,
                     tsCol: String, k: Int = 5, maxBasket: Int = 100,
                     splitFrac: Double = 0.5, minCooc: Long = 1L): DataFrame = {
    // persist the dated incidence: the split-point aggregate and BOTH
    // halves consume it — unpersisted, the upstream scan runs 3×
    val rows = df
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), col(itemCol).as("__i"),
        to_date(col(tsCol)).as("__day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every consumer of the persisted frames sits inside the try so a
    // throw anywhere (split-point aggregate included) still unpersists
    var flagged: DataFrame = null
    var sims: DataFrame = null
    try {
      val daySpan = rows.agg(min("__day").as("__d0"), max("__day").as("__d1"))
        .select(expr(
          s"date_add(__d0, CAST(floor(datediff(__d1, __d0) * $splitFrac) AS INT))")
          .as("__split"))
      val tagged = rows.crossJoin(broadcast(daySpan))
      // ONE shuffle builds BOTH halves: per distinct (user, item),
      // min/max activity day decide train membership (any day ≤ split)
      // and test membership (any day > split) — identical semantics to
      // two per-side DISTINCTs at half the passes and half the
      // materializations (r14: q246's wall was 48-stage job-overhead
      // bound, not stage bound). EAGER checkpoint, not lazy persist:
      // the halves have CONCURRENT first consumers (itemSimilarity's
      // basket aggregate + kept semi-join stages launch together), and
      // a cold lazy cache lets both recompute the whole split lineage
      // — the same race the r13 stage profile caught inside
      // itemSimilarity itself.
      // Single-node caveat (ADVICE r13): lineage is truncated — a
      // multi-executor deployment that must survive executor loss
      // should use persist(MEMORY_AND_DISK) / reliable checkpoints.
      flagged = tagged.groupBy("__u", "__i")
        .agg(max(when(col("__day") <= col("__split"), 1).otherwise(0))
            .as("__in_train"),
          max(when(col("__day") > col("__split"), 1).otherwise(0))
            .as("__in_test"))
        .transform(graft.state.Checkpoints.stable)
      val train = flagged.filter(col("__in_train") === 1).select("__u", "__i")
      val test = flagged.filter(col("__in_test") === 1).select("__u", "__i")
      sims = itemSimilarity(train, "__u", "__i", k, maxBasket, minCooc,
        assumeDistinct = true) // train is grouped-by-(__u, __i) above
      val cand = train
        .join(sims.select(col("item").as("__i"),
          col("similar_item").as("__c")), "__i")
        .select(col("__u"), col("__c")).distinct()
        .join(train.select(col("__u"), col("__i").as("__c")),
          Seq("__u", "__c"), "left_anti")
      // evaluable = active on BOTH sides of the split (on ANY items) —
      // one per-user max-flag aggregate over the flagged checkpoint
      // instead of distinct(train) ⋈ distinct(test): same set by
      // construction, two distincts and a semi-join fewer (r14: q246
      // is job-count bound, not stage bound)
      val evalUsers = flagged.groupBy("__u")
        .agg(max("__in_train").as("__t1"), max("__in_test").as("__t2"))
        .filter(col("__t1") === 1 && col("__t2") === 1)
        .select("__u")
        .persist() // tiny (#users); consumed by the count AND the semi-join
      val candOfEval = cand.join(evalUsers, Seq("__u"), "left_semi")
      // ONE pass over the candidate chain for BOTH tallies (hit users
      // and candidate count) — the two-consumer form recomputed the
      // whole train⋈sims→distinct→anti-join chain twice per call
      // (CfProbe2: the q246 overhang). test is distinct, so the left
      // join cannot fan out and count(*) stays the candidate count.
      val ceAgg = candOfEval
        .join(test.select(col("__u"), col("__i").as("__c"),
          lit(1).as("__hit")), Seq("__u", "__c"), "left")
        .agg(count(lit(1)).as("__nc"),
          countDistinct(when(col("__hit") === 1, col("__u")))
            .as("n_hit_users"))
      val nEval = evalUsers.agg(count(lit(1)).as("n_eval_users"))
      val out = nEval.crossJoin(ceAgg)
        // unrounded exact-integer ratios: one IEEE division, portable;
        // zero evaluable users (a cold-start holdout) reports NULL
        // rates instead of an ANSI 0/0 crash — oracle-mirrored
        .select(col("n_eval_users"), col("n_hit_users"),
          when(col("n_eval_users") > 0, col("n_hit_users").cast("double")
            / col("n_eval_users").cast("double")).as("hit_rate"),
          when(col("n_eval_users") > 0, col("__nc").cast("double")
            / col("n_eval_users").cast("double")).as("avg_candidates"))
        .transform(graft.state.Checkpoints.stable)
      evalUsers.unpersist(blocking = false)
      out
    } finally {
      // `out` is eagerly checkpointed above, so nothing reads the
      // flagged/sims checkpoints past this point — release their
      // blocks deterministically (ADVICE r13: ContextCleaner frees
      // them only after the RDDs go weakly unreachable AND a GC runs,
      // which GC-quiet library callers may never trigger); rows is
      // the one remaining lazy persist
      Seq(flagged, sims).filter(_ != null).foreach(releaseCheckpoint)
      rows.unpersist(blocking = false)
    }
  }

  /** Exact-integer two-sample Kolmogorov–Smirnov statistic over a
    * LONG-valued column (the drift monitor between corpus/embedding
    * snapshots: quantize the scalar to an integer lattice upstream,
    * then D is exact): D = max over pooled distinct values v of
    * |F_A(v) − F_B(v)| with the ECDFs evaluated as pure integer
    * cross-products — the per-value statistic is
    * |cumA(v)·n_B − cumB(v)·n_A|, its max divides ONCE by n_A·n_B at
    * the close, so the reported numerator is bit-exact on any engine
    * and the double is one IEEE division. Requires n_A·n_B < 2^63
    * (both sides under ~3e9 rows — KS a sample above that, as any
    * statistical monitor would); the envelope is ENFORCED by an
    * in-plan raise on the totals row, not merely documented.
    *
    * Scale shape: one union + map-side-combined value histogram; the
    * running sums ride the two-level-cumsum discipline (per-bucket
    * windows over distinct values only, a #buckets-row offset table);
    * the close is one aggregate row. Either side empty → NULL `ks_d`
    * (0/0 never evaluated — ANSI-safe), counts still reported.
    */
  /** Always-0L guard term added to a KS totals column: raises inside
    * the plan when `__na · __nb` would overflow int64 (the wrong-D-
    * with-no-error failure mode past ~3e9 rows per side). Folded into
    * `__na` (not a standalone column) so column pruning cannot drop
    * the check; integer `div` keeps the comparison itself exact.
    */
  private def ksOverflowGuard: Column = expr(
    // `__na IS NULL` arm: with BOTH inputs empty (or all-NULL values)
    // the totals aggregate runs over zero hist rows and both sums are
    // NULL; without the arm the CASE condition is NULL and falls
    // through to raise_error, breaking the documented both-sides-empty
    // contract (n_a=0, n_b=0, ks_d NULL — ADVICE r15). NULL + 0L stays
    // NULL, and the downstream coalesce(max(__na), 0L) closes to 0.
    s"CASE WHEN __na IS NULL OR __na = 0 " +
      s"OR __nb <= ${Long.MaxValue}L div __na THEN 0L " +
      "ELSE CAST(raise_error('graft ksTwoSample: n_a*n_b overflows " +
      "int64 - KS a sample (both sides must stay under ~3e9 rows)') " +
      "AS BIGINT) END")

  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String,
                  bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive")
    def side(df: DataFrame, sa: Long, sb: Long) = df
      .select(col(valueCol).cast(LongType).as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), lit(sa).as("__sa"), lit(sb).as("__sb"))
    // checkpointed: the offset table, the cumsum side, and the totals
    // row all read it (the rankedHist multi-consumer discipline)
    val hist = side(a, 1L, 0L).unionAll(side(b, 0L, 1L))
      .groupBy("__v")
      .agg(sum("__sa").as("__ca"), sum("__sb").as("__cb"))
      // `div` truncates toward zero: buckets are still disjoint
      // intervals and the index is monotone in __v, which is all the
      // offset ordering needs
      .withColumn("__b", expr(s"__v div ${bucketWidth}L"))
      .transform(graft.state.Checkpoints.stable)
    val offWin = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the only unpartitioned window runs over the #buckets-row
    // aggregate, never the value table
    val offsets = hist.groupBy("__b")
      .agg(sum("__ca").as("__bta"), sum("__cb").as("__btb"))
      .select(col("__b").as("__ob"),
        coalesce(sum("__bta").over(offWin), lit(0L)).as("__offa"),
        coalesce(sum("__btb").over(offWin), lit(0L)).as("__offb"))
    val wi = Window.partitionBy("__b").orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.join(offsets, col("__b") === col("__ob"))
      .withColumn("__cuma", col("__offa") + sum("__ca").over(wi))
      .withColumn("__cumb", col("__offb") + sum("__cb").over(wi))
    val totals = hist.agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
      // enforce the documented n_a·n_b < 2^63 envelope, don't just
      // document it (ADVICE r14): past it Spark (non-ANSI) silently
      // wraps cuma·nb and reports a wrong ks_d with no error. The
      // guard runs on the ONE-row totals frame — free at any scale.
      .withColumn("__na", col("__na") + ksOverflowGuard)
    cum.crossJoin(broadcast(totals))
      .agg(
        coalesce(max("__na"), lit(0L)).as("n_a"),
        coalesce(max("__nb"), lit(0L)).as("n_b"),
        coalesce(max(abs(col("__cuma") * col("__nb")
          - col("__cumb") * col("__na"))), lit(0L)).as("ks_num"))
      .select(col("n_a"), col("n_b"), col("ks_num"),
        // ONE closing IEEE division; either side empty → NULL
        when(col("n_a") > 0 && col("n_b") > 0,
          col("ks_num").cast(DoubleType) /
            (col("n_a") * col("n_b")).cast(DoubleType)).as("ks_d"))
  }

  /** Grouped form of [[ksTwoSample]]: an independent exact-integer KS
    * per distinct value of `groupCol` (per-source drift between
    * corpus snapshots — one monitor row per source). Identical
    * arithmetic, with every window and aggregate additionally keyed
    * on the group, so one skewed group still fans out across its
    * value buckets and no corpus-sized partition exists. NULL-group
    * rows are excluded by contract (the equi-joins would drop them
    * silently otherwise).
    */
  def ksTwoSampleGrouped(a: DataFrame, b: DataFrame, groupCol: String,
                         valueCol: String,
                         bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive")
    def side(df: DataFrame, sa: Long, sb: Long) = df
      .select(col(groupCol).as("__g"),
        col(valueCol).cast(LongType).as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .select(col("__g"), col("__v"),
        lit(sa).as("__sa"), lit(sb).as("__sb"))
    val hist = side(a, 1L, 0L).unionAll(side(b, 0L, 1L))
      .groupBy("__g", "__v")
      .agg(sum("__sa").as("__ca"), sum("__sb").as("__cb"))
      .withColumn("__b", expr(s"__v div ${bucketWidth}L"))
      .transform(graft.state.Checkpoints.stable) // offsets + cumsum + totals all read it
    val offWin = Window.partitionBy("__g").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy("__g", "__b")
      .agg(sum("__ca").as("__bta"), sum("__cb").as("__btb"))
      .select(col("__g").as("__go"), col("__b").as("__ob"),
        coalesce(sum("__bta").over(offWin), lit(0L)).as("__offa"),
        coalesce(sum("__btb").over(offWin), lit(0L)).as("__offb"))
    val wi = Window.partitionBy("__g", "__b").orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .join(offsets, col("__g") === col("__go") && col("__b") === col("__ob"))
      .withColumn("__cuma", col("__offa") + sum("__ca").over(wi))
      .withColumn("__cumb", col("__offb") + sum("__cb").over(wi))
    val totals = hist.groupBy("__g")
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
      // per-group n_a·n_b < 2^63 envelope, enforced on the
      // #groups-row totals frame (ADVICE r14; see ksTwoSample)
      .withColumn("__na", col("__na") + ksOverflowGuard)
      .select(col("__g").as("__gt"), col("__na"), col("__nb"))
    cum.join(totals, col("__g") === col("__gt"))
      .groupBy(col("__g").as(groupCol))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        max(abs(col("__cuma") * col("__nb")
          - col("__cumb") * col("__na"))).as("ks_num"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("ks_num"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("ks_num").cast(DoubleType) /
            (col("n_a") * col("n_b")).cast(DoubleType)).as("ks_d"))
  }

  /** Frequent triple mining — one Apriori step (Agrawal & Srikant
    * 1994) above the engine's pair surface (q155 lift): itemsets
    * {a < b < c} appearing in at least `minSupport` baskets. The
    * anti-monotone prune is what makes this tractable: pair instances
    * are kept only when their pair is itself frequent, and the third
    * item joins only when BOTH closing pairs are frequent — so the
    * intermediate row count is bounded by frequent-pair instances,
    * never the raw C(basket, 3) explosion. The oracle counts triples
    * with no prune at all, so a prune that loses a frequent triple
    * (or admits a bogus one) is a hash mismatch.
    *
    * Scale shape: every join is basket- or item-keyed hash equi-join
    * with map-side-combined counts; the frequent-pair table is the
    * only broadcast-sized state.
    */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long = 2L): DataFrame = {
    val b = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__bk"), col(itemCol).as("__i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairInst = b.select(col("__bk"), col("__i").as("__a"))
        .join(b.select(col("__bk"), col("__i").as("__b")), "__bk")
        .filter(col("__a") < col("__b"))
      val freqPairs = pairInst.groupBy("__a", "__b")
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= minSupport)
        .select("__a", "__b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val keptInst = pairInst.join(freqPairs, Seq("__a", "__b"), "left_semi")
        val tri = keptInst
          .join(b.select(col("__bk"), col("__i").as("__c")), "__bk")
          .filter(col("__b") < col("__c"))
          .join(freqPairs.select(col("__a"), col("__b").as("__c")),
            Seq("__a", "__c"), "left_semi")
          .join(freqPairs.select(col("__a").as("__b"), col("__b").as("__c")),
            Seq("__b", "__c"), "left_semi")
          .groupBy("__a", "__b", "__c")
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= minSupport)
          .select(col("__a").as("item_a"), col("__b").as("item_b"),
            col("__c").as("item_c"), col("support"))
          .transform(graft.state.Checkpoints.stable)
        tri
      } finally freqPairs.unpersist(blocking = false)
    } finally b.unpersist(blocking = false)
  }

  /** Association rules {a,b} → c from the [[frequentTriples]] output:
    * each frequent triple yields its three pair-antecedent rules with
    *   confidence = sup(abc)/sup(antecedent pair)
    *   lift       = confidence · #baskets / sup(consequent)
    * — exact integer counts throughout, each metric one fixed
    * closing-double tree. The consequent-side base rates and pair
    * supports come from the same deduped basket incidence the triples
    * did, so the three numbers are mutually consistent by
    * construction.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long = 2L): DataFrame = {
    val b = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__bk"), col(itemCol).as("__i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tri = frequentTriples(b, "__bk", "__i", minSupport)
      val nB = b.select("__bk").distinct().count()
      val singles = b.groupBy(col("__i")).agg(count(lit(1)).as("__cs"))
      val pairs = b.select(col("__bk"), col("__i").as("__a"))
        .join(b.select(col("__bk"), col("__i").as("__b")), "__bk")
        .filter(col("__a") < col("__b"))
        .groupBy("__a", "__b").agg(count(lit(1)).as("__cp"))
      // the three pair-antecedent rotations of each triple; the
      // antecedent keeps its canonical (low, high) order
      val rules = tri.select(col("item_a").as("ant1"), col("item_b").as("ant2"),
        col("item_c").as("consequent"), col("support"))
        .unionByName(tri.select(col("item_a").as("ant1"),
          col("item_c").as("ant2"), col("item_b").as("consequent"),
          col("support")))
        .unionByName(tri.select(col("item_b").as("ant1"),
          col("item_c").as("ant2"), col("item_a").as("consequent"),
          col("support")))
      rules
        .join(pairs.select(col("__a").as("ant1"), col("__b").as("ant2"),
          col("__cp")), Seq("ant1", "ant2"))
        .join(singles.select(col("__i").as("consequent"), col("__cs")),
          "consequent")
        .select(col("ant1"), col("ant2"), col("consequent"), col("support"),
          round(col("support").cast("double") / col("__cp").cast("double"), 6)
            .as("confidence"),
          round(col("support").cast("double") / col("__cp").cast("double")
            * lit(nB.toDouble) / col("__cs").cast("double"), 6).as("lift"))
    } finally b.unpersist(blocking = false)
  }

  /** Exact sliding 7-day distinct active users per calendar day — the
    * window-distinct aggregate naive rollups get WRONG (summing daily
    * distincts double-counts returnees; q219's HLL merge is the
    * sketch path, this is the exact one). Each (user, active day)
    * pair explodes into the ≤ `windowDays` window days it supports;
    * distinct (user, window day) then counts per day — shuffle volume
    * is windowDays × the DAILY-deduped activity, not the raw event
    * count. Days beyond the observed span are clamped; the first
    * windowDays−1 days are PARTIAL windows by definition (flagged).
    */
  def slidingDau(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 90, "windowDays out of range")
    val ud = events.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day"))
      .distinct()
    val span = ud.agg(min("__day").as("__d0"), max("__day").as("__d1"))
    val dau1 = ud.groupBy(col("__day").as("day"))
      .agg(countDistinct("__u").as("dau_1d"))
    val win = ud
      .select(col("__u"), explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("day"))
      .distinct()
      .crossJoin(broadcast(span))
      .filter(col("day") <= col("__d1"))
      .groupBy("day")
      .agg(count(lit(1)).as(s"dau_${windowDays}d"))
    win.join(dau1, Seq("day"), "left")
      .crossJoin(broadcast(span))
      .select(col("day"), coalesce(col("dau_1d"), lit(0L)).as("dau_1d"),
        col(s"dau_${windowDays}d"),
        (datediff(col("day"), col("__d0")) < windowDays - 1)
          .cast(IntegerType).as("partial_window"))
  }

  /** Seasonality strength per group (Hyndman's STL-strength measure
    * specialized to a weekday profile): 1 − SS_within / SS_total,
    * where SS_within is the residual sum of squares after removing
    * each weekday's own mean — 0 means the weekday profile explains
    * nothing, →1 means the series IS its weekly pattern. Both sums
    * decompose over exact Decimal day-count moments: SS_within =
    * Σ_dow (Σx² − (Σx)²/n_d), each dow's term one fixed double tree,
    * summed over ≤ 7 terms. Clamped at 0 (fp dust on a flat series).
    */
  def seasonalityStrength(events: DataFrame,
                          groupCol: String = "event_type",
                          tsCol: String = "ts"): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day").agg(count(lit(1)).as("__n"))
      .withColumn("__dow", dayofweek(col("__day")))
    val perDow = daily.groupBy("__g", "__dow")
      .agg(count(lit(1)).as("__nd"),
        sum(col("__n").cast(dec)).as("__sx"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__sxx"))
      .withColumn("__ssw", col("__sxx").cast(DoubleType) -
        (col("__sx") * col("__sx")).cast(DoubleType) /
          col("__nd").cast(DoubleType))
    val within = perDow.groupBy("__g")
      .agg(sum("__ssw").as("__ssw"), sum("__nd").as("__ndays"))
    val total = daily.groupBy("__g")
      .agg(count(lit(1)).cast(dec).as("__nt"),
        sum(col("__n").cast(dec)).as("__tsx"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__tsxx"))
      .withColumn("__sst", col("__tsxx").cast(DoubleType) -
        (col("__tsx") * col("__tsx")).cast(DoubleType) /
          col("__nt").cast(DoubleType))
    within.join(total, "__g")
      .select(col("__g").as(groupCol),
        col("__ndays").as("n_days"),
        // e4 lattices: both sums of squares are fp differences
        // (Σx² − (Σx)²/n) — a flat series cancels them to ±ε
        // residues (VERDICT r15 #2); strength is already clamped
        // non-negative by greatest(0, ·)
        graft.functions.Lattice.e4(col("__sst")).as("ss_total"),
        graft.functions.Lattice.e4(col("__ssw")).as("ss_within"),
        round(when(col("__sst") > 0,
          greatest(lit(0.0), lit(1.0) - col("__ssw") / col("__sst"))), 6)
          .as("seasonality_strength"))
  }

  /** Pairwise two-sample Kolmogorov–Smirnov distance between every
    * pair of groups — the nonparametric sibling of [[psiDrift]] (no
    * binning, no smoothing): D = max over values of |F_a − F_b|,
    * computed with the q211 integer discipline as
    * max |cum_a·n_b − cum_b·n_a| / (n_a·n_b) — the numerator is an
    * exact Decimal(38,0) sweep, ties argmax to the SMALLEST value,
    * and the single closing division happens once per pair.
    *
    * Scale shape: per-group CDFs materialize on the dense
    * (group × distinct-value) grid via the grouped two-level cumsum
    * (no partition wider than one value bucket), pairs join on the
    * value — #groups²/2 × #distinct-values rows, never corpus-sized.
    */
  def ksMatrix(df: DataFrame, groupCol: String,
               valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast(LongType).as("__v"))
    val values = rows.select("__v").distinct()
    val classes = rows.groupBy("__g").agg(count(lit(1)).as("__n"))
    val pgv = rows.groupBy("__g", "__v").agg(count(lit(1)).as("__ng"))
    val dense = values.crossJoin(broadcast(classes))
      .join(pgv, Seq("__g", "__v"), "left")
      .withColumn("__ng", coalesce(col("__ng"), lit(0L)))
    val (gb, gwin) = TwoLevelCumsum.withGroupedOffsets(
      dense, Seq("__g"), expr("__v div 1024L"), col("__ng"),
      Seq(col("__v").asc))
    val cdf = gb.withColumn("__cp", col("__off") + sum("__w").over(gwin))
      .select(col("__g"), col("__v"), col("__cp"), col("__n"))
    val paired = cdf.select(col("__g").as("__ga"), col("__v"),
      col("__cp").as("__ca"), col("__n").as("__na"))
      .join(cdf.select(col("__g").as("__gb"), col("__v"),
        col("__cp").as("__cb"), col("__n").as("__nb")), "__v")
      .filter(col("__ga") < col("__gb"))
      .withColumn("__num", abs(col("__ca").cast(dec) * col("__nb").cast(dec)
        - col("__cb").cast(dec) * col("__na").cast(dec)))
    paired.groupBy(col("__ga").as("source_a"), col("__gb").as("source_b"))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        max(struct(col("__num"), (-col("__v")).as("__negv"))).as("__kk"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(col("__kk.__num").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)), 6)
          .as("ks_d"),
        (-col("__kk.__negv")).as("ks_at"))
  }

  /** Exact Spearman rank correlation — the monotonic-relationship
    * test Pearson misses when the link is nonlinear. Ranks are
    * DOUBLED midranks (ties get the average rank of their run; kept
    * ×2 so they stay integers — the q201 rank-sum trick), derived per
    * variable from the value histogram via the two-level cumsum, then
    * ρ is the Pearson correlation of the two integer rank columns:
    * five exact Decimal(38,0) moments and ONE closing expression.
    * The corpus never sorts; each variable contributes one histogram
    * pass and one broadcast-size rank-map join.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(round(col(xCol) * 1000000).cast(LongType).as("__x"),
        round(col(yCol) * 1000000).cast(LongType).as("__y"))
    rows.persist()
    try {
      def rankMap(c: String): DataFrame = {
        val hist = rows.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        val (bk, wi) = TwoLevelCumsum.withOffsets(
          hist, expr(s"`$c` div 1048576L"), col("__c"), Seq(col(c).asc))
        bk.withColumn("__cum", col("__off") + sum("__w").over(wi))
          // doubled midrank of the tie run: 2·(cum − c) + c + 1
          .select(col(c),
            (lit(2) * (col("__cum") - col("__c")) + col("__c") + 1)
              .as(s"__r$c"))
      }
      val ranked = rows
        .join(rankMap("__x"), "__x")
        .join(rankMap("__y"), "__y")
        .select(col("__r__x").cast(dec).as("__rx"),
          col("__r__y").cast(dec).as("__ry"))
      val m = ranked.agg(count(lit(1)).cast(dec).as("__n"),
        sum("__rx").as("__sx"), sum("__ry").as("__sy"),
        sum(col("__rx") * col("__ry")).as("__sxy"),
        sum(col("__rx") * col("__rx")).as("__sxx"),
        sum(col("__ry") * col("__ry")).as("__syy"))
      val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
        .cast(DoubleType)
      val dx = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .cast(DoubleType)
      val dy = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
        .cast(DoubleType)
      m.select(col("__n").cast(LongType).as("n"),
        round(when(dx > 0 && dy > 0, num / sqrt(dx * dy)), 6)
          .as("spearman_rho"))
        .transform(graft.state.Checkpoints.stable)
    } finally rows.unpersist(blocking = false)
  }

  /** Exact Kendall τ-b — the third member of the correlation family
    * (Pearson: linear; [[spearman]]: monotonic via ranks; Kendall:
    * pairwise concordance, the most robust to outliers and the one
    * with a direct probabilistic reading P(concordant) −
    * P(discordant)). The naive form is O(n²) over ROWS; this one is
    * O(cells²) over the JOINT VALUE HISTOGRAM — concordant/discordant
    * mass between two cells is just c_a·c_b, and ties fall out of the
    * marginal histograms — so the cost is value-resolution-bounded
    * (the q267/q274 envelope), never corpus-bounded. Every count is
    * an exact Decimal(38,0); τ-b closes in one expression.
    */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(round(col(xCol) * 1000000).cast(LongType).as("__x"),
        round(col(yCol) * 1000000).cast(LongType).as("__y"))
    val cells = rows.groupBy("__x", "__y")
      .agg(count(lit(1)).cast(dec).as("__c"))
    cells.persist()
    try {
      // unordered cell pairs once, lexicographically — the frame is
      // (#distinct x × #distinct y)² / 2, a deliberate bounded square
      val pairs = cells.select(col("__x").as("__xa"), col("__y").as("__ya"),
        col("__c").as("__ca"))
        .crossJoin(cells.select(col("__x").as("__xb"),
          col("__y").as("__yb"), col("__c").as("__cb")))
        .filter(struct(col("__xa"), col("__ya")) <
          struct(col("__xb"), col("__yb")))
      val pq = pairs.agg(
        sum(when((col("__xa") < col("__xb") && col("__ya") < col("__yb")) ||
          (col("__xa") > col("__xb") && col("__ya") > col("__yb")),
          col("__ca") * col("__cb")).otherwise(lit(0).cast(dec))).as("__p"),
        sum(when((col("__xa") < col("__xb") && col("__ya") > col("__yb")) ||
          (col("__xa") > col("__xb") && col("__ya") < col("__yb")),
          col("__ca") * col("__cb")).otherwise(lit(0).cast(dec))).as("__q"))
      val n = rows.agg(count(lit(1)).cast(dec).as("__n"))
      def tiePairs(c: String) = rows.groupBy(col(c))
        .agg(count(lit(1)).cast(dec).as("__m"))
        .agg(sum(col("__m") * (col("__m") - 1)).as("__t2")) // doubled
      val tx = tiePairs("__x").select(col("__t2").as("__tx2"))
      val ty = tiePairs("__y").select(col("__t2").as("__ty2"))
      // doubled pair counts keep everything integer: n0·2 = n(n−1)
      pq.crossJoin(n).crossJoin(tx).crossJoin(ty)
        .withColumn("__n02", col("__n") * (col("__n") - 1))
        .select(col("__n").cast(LongType).as("n"),
          round(when((col("__n02") - col("__tx2")) > 0 &&
            (col("__n02") - col("__ty2")) > 0,
            (lit(2).cast(dec) * (col("__p") - col("__q"))).cast(DoubleType) /
              sqrt((col("__n02") - col("__tx2")).cast(DoubleType) *
                (col("__n02") - col("__ty2")).cast(DoubleType))), 6)
            .as("kendall_tau_b"))
    } finally cells.unpersist(blocking = false)
  }

  /** Distribution-free median confidence interval per group — the
    * binomial order-statistic bound (Conover's nonparametric CI): the
    * true median lies between the order statistics at ranks
    *   lo = ⌊(n − z·√n)/2⌋,  hi = ⌈(n + z·√n)/2⌉ + 1   (z = 1.96),
    * with ~95% coverage and NO normality assumption. Ranks are
    * integers computed from one deterministic double expression
    * (√ is exactly rounded, floor/ceil agree on any engine), clamped
    * to [1, n]; the values at those ranks come off the (group, value)
    * histogram via the grouped two-level cumsum — the corpus never
    * sorts. Values are taken on the ×1e6 lattice and unscaled once.
    */
  def medianCI(df: DataFrame, groupCol: String,
               valueCol: String): DataFrame = {
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol),
        round(col(valueCol) * 1000000).cast(LongType).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val totals = hist.groupBy(col(groupCol)).agg(sum("__c").as("__n"))
      .withColumn("__z", lit(1.96) * sqrt(col("__n").cast(DoubleType)))
      .withColumn("__lo", greatest(lit(1L),
        floor((col("__n").cast(DoubleType) - col("__z")) / 2.0)
          .cast(LongType)))
      .withColumn("__hi", least(col("__n"),
        ceil((col("__n").cast(DoubleType) + col("__z")) / 2.0)
          .cast(LongType) + 1))
      .withColumn("__mid", expr("(__n + 1) div 2")) // lower median rank
    val (bucketed, wi) = TwoLevelCumsum.withGroupedOffsets(
      hist, Seq(groupCol), expr("__v div 1024L"), col("__c"),
      Seq(col("__v").asc))
    val cum = bucketed
      .withColumn("__cumHi", col("__off") + sum("__w").over(wi))
      .withColumn("__cumLo", col("__cumHi") - col("__c") + 1)
      .join(totals, groupCol)
    // the value at rank r is the row whose [cumLo, cumHi] covers r
    def valueAt(rank: Column, out: String) =
      cum.filter(col("__cumLo") <= rank && rank <= col("__cumHi"))
        .groupBy(col(groupCol))
        .agg(min("__v").as(out))
    valueAt(col("__mid"), "__vm")
      .join(valueAt(col("__lo"), "__vl"), groupCol)
      .join(valueAt(col("__hi"), "__vh"), groupCol)
      .join(totals.select(col(groupCol), col("__n")), groupCol)
      .select(col(groupCol), col("__n").as("n"),
        round(col("__vm").cast(DoubleType) / 1000000.0, 6).as("median"),
        round(col("__vl").cast(DoubleType) / 1000000.0, 6).as("ci_low"),
        round(col("__vh").cast(DoubleType) / 1000000.0, 6).as("ci_high"))
  }

  /** Pairwise 1-D Wasserstein-1 (earth mover's) distance — the
    * MAGNITUDE companion to [[ksMatrix]]'s max deviation: in one
    * dimension W₁ = ∫|F_a − F_b| dv, the total work to morph one
    * distribution into the other in the value's own units. Both CDFs
    * are step functions on the observed values, so the integral is
    * the exact integer sum Σ |cum_a·n_b − cum_b·n_a| · Δv over
    * consecutive observed values, with ONE closing division by
    * n_a·n_b.
    *
    * Scale shape: the [[ksMatrix]] dense-grid CDFs; the value gap Δv
    * rides a lead window per (pair) over the value-histogram frame —
    * bounded by the value resolution, the operator's documented
    * envelope, never corpus-sized.
    */
  def emdMatrix(df: DataFrame, groupCol: String,
                valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast(LongType).as("__v"))
    val values = rows.select("__v").distinct()
    val classes = rows.groupBy("__g").agg(count(lit(1)).as("__n"))
    val pgv = rows.groupBy("__g", "__v").agg(count(lit(1)).as("__ng"))
    val dense = values.crossJoin(broadcast(classes))
      .join(pgv, Seq("__g", "__v"), "left")
      .withColumn("__ng", coalesce(col("__ng"), lit(0L)))
    val (gb, gwin) = TwoLevelCumsum.withGroupedOffsets(
      dense, Seq("__g"), expr("__v div 1024L"), col("__ng"),
      Seq(col("__v").asc))
    val cdf = gb.withColumn("__cp", col("__off") + sum("__w").over(gwin))
      .select(col("__g"), col("__v"), col("__cp"), col("__n"))
    val paired = cdf.select(col("__g").as("__ga"), col("__v"),
      col("__cp").as("__ca"), col("__n").as("__na"))
      .join(cdf.select(col("__g").as("__gb"), col("__v"),
        col("__cp").as("__cb"), col("__n").as("__nb")), "__v")
      .filter(col("__ga") < col("__gb"))
    val dvWin = Window.partitionBy("__ga", "__gb").orderBy(col("__v").asc)
    paired
      .withColumn("__dv", lead("__v", 1).over(dvWin) - col("__v"))
      .filter(col("__dv").isNotNull) // the last step carries no area
      .withColumn("__area",
        abs(col("__ca").cast(dec) * col("__nb").cast(dec)
          - col("__cb").cast(dec) * col("__na").cast(dec))
          * col("__dv").cast(dec))
      .groupBy(col("__ga").as("source_a"), col("__gb").as("source_b"))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        sum("__area").as("__sumArea"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(col("__sumArea").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)), 6)
          .as("emd"))
  }

  /** Per-group rank normalization — value → (rank − 1)/(n − 1) in
    * [0, 1], the distribution-free feature transform (quantile/rank
    * scaling) robust to outliers where min-max scaling is not. Rank
    * is DENSE over the (group, value) histogram with ties sharing the
    * rank of their value (average-rank variants reintroduce
    * fp-vs-count ambiguity; the lower dense rank is an integer both
    * engines agree on). n is the count of DISTINCT values, so the
    * output hits exactly 0 and 1 at the group extremes.
    *
    * Scale shape: one (group, value) histogram with map-side combine,
    * the grouped two-level cumsum over THAT frame for the dense rank,
    * then one broadcast-size join back — the corpus never sorts.
    */
  def rankNormalize(df: DataFrame, groupCol: String, valueCol: String,
                    outCol: String = "rank_norm"): DataFrame = {
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val (bucketed, wi) = TwoLevelCumsum.withGroupedOffsets(
      hist, Seq(groupCol), expr("CAST(__v AS BIGINT) div 1024L"), lit(1L),
      Seq(col("__v").asc))
    val ranked = bucketed
      .withColumn("__rk", col("__off") + sum("__w").over(wi))
    val totals = hist.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__nv"))
    val lookup = ranked.join(totals, groupCol)
      .select(col(groupCol), col("__v"),
        round(when(col("__nv") > 1,
          (col("__rk") - 1).cast(DoubleType) /
            (col("__nv") - 1).cast(DoubleType)).otherwise(lit(0.0)), 6)
          .as(outCol))
    df.join(lookup, df(groupCol) === lookup(groupCol) &&
      col(valueCol) === col("__v"))
      .drop(lookup(groupCol)).drop("__v")
  }

  /** Semantic centroid drift between two deterministic halves of a
    * labeled embedding corpus — the "did this class's meaning move"
    * screen between snapshots. Centroids live on the
    * [[graft.similarity.Ann.quantizeInt8]] code lattice, so each
    * half's per-dimension SUM is an exact integer (order-free — the
    * fp-mean version would hash differently across engines), and
    * cos(centroid_a, centroid_b) equals cos(sum_a, sum_b) because the
    * 1/n factors cancel — one closing expression over exact integer
    * dot products.
    */
  def semanticDrift(codes: DataFrame, labelCol: String, idCol: String,
                    qvecCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val tagged = codes.select(col(labelCol).as("__l"),
      (SplitOps.hashBucket(concat(col(idCol).cast(StringType),
        lit("|drift"))) % 2).as("__h"),
      posexplode(col(qvecCol)))
      .select(col("__l"), col("__h"), col("pos").as("__i"),
        col("col").cast(LongType).as("__q"))
    val sums = tagged.groupBy("__l", "__i")
      .agg(sum(when(col("__h") === 0, col("__q")).otherwise(0L)).cast(dec)
        .as("__sa"),
        sum(when(col("__h") === 1, col("__q")).otherwise(0L)).cast(dec)
          .as("__sb"))
    val moments = sums.groupBy(col("__l").as(labelCol))
      .agg(sum(col("__sa") * col("__sb")).as("__dot"),
        sum(col("__sa") * col("__sa")).as("__na"),
        sum(col("__sb") * col("__sb")).as("__nb"))
    val counts = codes.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vectors"),
        sum((SplitOps.hashBucket(concat(col(idCol).cast(StringType),
          lit("|drift"))) % 2).cast(LongType)).as("__nb1"))
    moments.join(counts, labelCol)
      .select(col(labelCol), col("n_vectors"),
        (col("n_vectors") - col("__nb1")).as("n_half_a"),
        col("__nb1").as("n_half_b"),
        round(when(col("__na") > 0 && col("__nb") > 0,
          col("__dot").cast(DoubleType) /
            (sqrt(col("__na").cast(DoubleType)) *
              sqrt(col("__nb").cast(DoubleType)))), 6)
          .as("centroid_cosine"))
  }

  /** Exact WEIGHTED median per group — the aggregate
    * `percentile_cont` doesn't cover (it weighs rows equally; here a
    * row counts `weight` times — quantity-weighted price medians,
    * token-weighted length medians). Lower weighted median: the
    * smallest value v with 2·cumweight(v) ≥ totalweight — an
    * integer comparison, so the result is exact on any engine.
    *
    * Scale shape: one (group, value)-keyed weight histogram with
    * map-side combine, then the grouped two-level cumsum over THAT
    * histogram (no window wider than one (group, value-bucket)), and
    * a min-aggregate over the crossing rows. Weights must be
    * integral and positive; zero/NULL-weight rows are dropped.
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    val hist = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy(col(groupCol), col(valueCol).cast(LongType).as("__v"))
      .agg(sum(col(weightCol).cast(LongType)).as("__hw"))
    val (bucketed, wi) = TwoLevelCumsum.withGroupedOffsets(
      hist, Seq(groupCol), expr("__v div 1024L"), col("__hw"),
      Seq(col("__v").asc))
    val cum = bucketed
      .withColumn("__cum", col("__off") + sum("__w").over(wi))
    val totals = hist.groupBy(col(groupCol))
      .agg(sum("__hw").as("total_weight"), count(lit(1)).as("n_values"))
    cum.join(totals, groupCol)
      .filter(col("__cum") * 2 >= col("total_weight"))
      .groupBy(col(groupCol))
      .agg(min("__v").as("weighted_median"))
      .join(totals, groupCol)
      .select(col(groupCol), col("n_values"), col("total_weight"),
        col("weighted_median"))
  }

  /** Difference-in-differences readout on the [[cupedReport]]
    * scaffold (md5 arms, calendar-half pre/post): the causal-inference
    * workhorse  DiD = (ȳ_T − x̄_T) − (ȳ_C − x̄_C)  with its standard
    * error from the per-arm variance of the user-level delta,
    * var(y−x) = var(y) − 2cov(x,y) + var(x) — the same
    * exact-Decimal-moment identity trick as CUPED, so per-user deltas
    * are never materialized and no unordered fp summation exists.
    * One row out: arm sizes, per-arm pre/post means, the DiD
    * estimate, its SE, and the t statistic (each a fixed closing
    * double tree over exact integers, mirrored by the oracle).
    */
  def didReport(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", salt: String = "exp",
                splitFrac: Double = 0.5): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = events.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day"))
    val daySpan = rows.agg(min("__day").as("__d0"), max("__day").as("__d1"))
      .select(expr(
        s"date_add(__d0, CAST(floor(datediff(__d1, __d0) * $splitFrac) AS INT))")
        .as("__split"))
    val perArm = rows.crossJoin(broadcast(daySpan))
      .groupBy("__u")
      .agg(sum(when(col("__day") <= col("__split"), 1L).otherwise(0L))
        .cast(dec).as("__x"),
        sum(when(col("__day") > col("__split"), 1L).otherwise(0L))
          .cast(dec).as("__y"))
      .withColumn("__t", (SplitOps.hashBucket(
        concat(col("__u").cast(StringType), lit("|" + salt))) % 2 === 1)
        .cast(IntegerType))
      .groupBy("__t").agg(
        count(lit(1)).cast(dec).as("__n"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val n2 = (col("__n") * col("__n")).cast("double")
    // var(y−x) numerator: n(Σy²−2Σxy+Σx²) − (Σy−Σx)²   — all exact
    val varD = ((col("__n") * (col("__syy") - lit(2) * col("__sxy")
      + col("__sxx"))
      - (col("__sy") - col("__sx")) * (col("__sy") - col("__sx")))
      .cast("double")) / n2
    val md = (col("__sy") - col("__sx")).cast("double") /
      col("__n").cast("double")
    val side = perArm.select(col("__t"),
      col("__n").cast(LongType).as("n"),
      (col("__sx").cast("double") / col("__n").cast("double")).as("mx"),
      (col("__sy").cast("double") / col("__n").cast("double")).as("my"),
      md.as("mdelta"),
      varD.as("vard"))
    val c = side.filter(col("__t") === 0)
      .select(col("n").as("n_control"), col("mx").as("pre_control"),
        col("my").as("post_control"), col("mdelta").as("__dc"),
        col("vard").as("__vc"))
    val t = side.filter(col("__t") === 1)
      .select(col("n").as("n_treatment"), col("mx").as("pre_treatment"),
        col("my").as("post_treatment"), col("mdelta").as("__dt"),
        col("vard").as("__vt"))
    val se = sqrt(col("__vt") / col("n_treatment").cast("double")
      + col("__vc") / col("n_control").cast("double"))
    c.crossJoin(t).select(
      col("n_control"), col("n_treatment"),
      round(col("pre_control"), 6).as("pre_control"),
      round(col("post_control"), 6).as("post_control"),
      round(col("pre_treatment"), 6).as("pre_treatment"),
      round(col("post_treatment"), 6).as("post_treatment"),
      // did / t_stat are fp differences of exact per-arm ratios — a
      // no-effect experiment closes on a ±ε residue (e6/e4 lattice,
      // VERDICT r15 #2); se stays round(): sqrt of exact-decimal
      // variance ratios is never a signed residue
      graft.functions.Lattice.e6(col("__dt") - col("__dc")).as("did"),
      round(se, 6).as("se"),
      graft.functions.Lattice.e4(
        when(se > 0, (col("__dt") - col("__dc")) / se)).as("t_stat"))
  }

  /** Pareto frontier / skyline (Börzsönyi et al. 2001): the rows not
    * STRICTLY dominated under (minimize `xCol`, maximize `yCol`) —
    * j dominates i iff xⱼ ≤ xᵢ, yⱼ ≥ yᵢ, and at least one is strict;
    * duplicated points dominate neither and both survive. Per group,
    * a row is dominated iff
    *   max{y : x' < x} ≥ y   (someone strictly cheaper is as good)
    *   or max{y : x' = x} > y (someone equally cheap is better),
    * so the whole skyline reduces to a STRICT prefix-max of y in x
    * order — computed with the two-level discipline: x-levels bucket
    * on a monotone prefix of x (floor(x·xScale) — IEEE multiply by a
    * positive constant and floor are both monotone, so fp wobble
    * cannot break bucket ordering), per-(group, bucket) maxima get
    * their running max over the TINY bucket table, and the only
    * data-side window is per (group, bucket) over DISTINCT x levels —
    * bounded by the value resolution per bucket, never by group size.
    * No arithmetic touches x or y themselves (raw comparisons only),
    * so results are bit-exact on any engine.
    */
  def paretoFrontier(df: DataFrame, groupCol: String, idCol: String,
                     xCol: String, yCol: String,
                     xScale: Double = 1.0): DataFrame = {
    // NULL-group rows are excluded (the equi-joins below would drop
    // them silently otherwise — better absent by contract than lost)
    val base = df
      .filter(col(groupCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), col(idCol), col(xCol), col(yCol))
    val levels = base.groupBy(col(groupCol), col(xCol))
      .agg(max(col(yCol)).as("__lm"))
      .withColumn("__b",
        floor(col(xCol).cast(DoubleType) * lit(xScale)).cast(LongType))
    val bucketMax = levels.groupBy(col(groupCol), col("__b"))
      .agg(max("__lm").as("__bm"))
      .withColumn("__offm", max("__bm").over(
        Window.partitionBy(groupCol).orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(groupCol), col("__b"), col("__offm"))
    val wl = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(col(xCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val strict = levels
      .withColumn("__pm", max("__lm").over(wl)) // x-levels per bucket only
      .join(bucketMax, Seq(groupCol, "__b"))
      .withColumn("__sm", greatest(
        coalesce(col("__pm"), col("__offm")),
        coalesce(col("__offm"), col("__pm"))))
      .select(col(groupCol), col(xCol), col("__lm"), col("__sm"))
    base.join(strict, Seq(groupCol, xCol))
      .filter((col("__sm").isNull || col("__sm") < col(yCol)) &&
        col(yCol) === col("__lm"))
      .select(col(groupCol), col(idCol), col(xCol), col(yCol))
  }

  /** Item–item collaborative filtering over implicit binary feedback
    * (Sarwar et al. 2001; Linden et al. 2003's "people who bought X"):
    * cosine similarity between items i, j =
    * |U(i)∩U(j)| / √(|U(i)|·|U(j)|) over the DISTINCT (user, item)
    * incidence, top-k neighbours per item. All inputs are exact
    * integers and the cosine closes in one fixed IEEE expression
    * (x·y and √ are correctly rounded), so scores are bit-identical
    * across engines; ties break (score desc, item asc) on both sides.
    *
    * Scale: the user self-join is O(Σ basket²), so users with more
    * than `maxBasket` distinct items are EXCLUDED OUTRIGHT — an exact,
    * replayable power-user discount (the [[graft.graph.GraphOps.linkPrediction]]
    * degree cap; a crawler that touched every item carries no
    * preference signal anyway). Item norms count the CAPPED incidence
    * so the cosine stays internally consistent. Top-k per item rides
    * the bounded-heap [[graft.expressions.TopKAgg]] — ≤ k rows per
    * item per map partition cross the shuffle, never the full
    * candidate list of a popular item.
    */
  def itemSimilarity(df: DataFrame, userCol: String, itemCol: String,
                     k: Int = 5, maxBasket: Int = 100,
                     minCooc: Long = 1L,
                     assumeDistinct: Boolean = false): DataFrame =
    itemSimilarityImpl(df, userCol, itemCol, k, maxBasket, minCooc,
      assumeDistinct, dupCheckMod = 64)

  /** The persisted block-holding RDD behind an eagerly
    * `localCheckpoint(true)`'ed Dataset — the checkpointed plan is a
    * single [[org.apache.spark.sql.execution.LogicalRDD]] leaf whose
    * `rdd` carries the storage; `ds.rdd` would wrap it in a fresh
    * (unpersisted) deserializer RDD, so unpersisting THAT is a no-op.
    */
  private def checkpointRdd(ds: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Deterministically release an eager localCheckpoint's blocks
    * (ADVICE r13: waiting on the weak-ref ContextCleaner lets
    * MEMORY_AND_DISK blocks pile up in GC-quiet driver programs,
    * including on exception paths — `RDD.unpersist` works on
    * localCheckpoint storage).
    */
  private def releaseCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Unit =
    checkpointRdd(ds).foreach(_.unpersist(blocking = false))

  private[graft] def itemSimilarityImpl(
      df: DataFrame, userCol: String, itemCol: String,
      k: Int, maxBasket: Int, minCooc: Long,
      assumeDistinct: Boolean, dupCheckMod: Int): DataFrame = {
    // persist the incidence: both the basket-size aggregate and the
    // cap semi-join consume it — unpersisted, the upstream scan +
    // distinct (the most expensive input stage, CfProbe) runs twice.
    // assumeDistinct skips the dedup shuffle when the CALLER already
    // holds a distinct (user, item) incidence (itemRecHoldout's train
    // half) — duplicate rows would inflate cooc counts, so it is the
    // caller's contract, tripwire-checked below.
    val base = df
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    // EAGER checkpoint instead of lazy persist: the incidence has two
    // consumers (basket-size aggregate + the kept semi-join) whose
    // stages Spark submits CONCURRENTLY — on a cold lazy cache BOTH
    // recompute the full distinct lineage before either populates a
    // block (the r13 stage profile showed the race as two identical
    // ~39 s 5-task stages; it is also timing-dependent, the measured
    // q239 bimodality). The explicit repartition count pins the
    // downstream parallelism AQE otherwise coalesces to ~5
    // byte-sized partitions for this CPU-bound expansion.
    // Single-node caveat (ADVICE r13): localCheckpoint TRUNCATES
    // lineage — on a multi-executor cluster a lost executor makes the
    // checkpointed partitions unrecoverable (the job fails instead of
    // recomputing). Fine on the measured local[32] target; a cluster
    // deployment that needs fault tolerance should swap these for
    // persist(MEMORY_AND_DISK) or a reliable checkpoint dir.
    val ui = if (assumeDistinct) base
      else base.repartition(nParts, col("__u"), col("__i")).distinct()
        .transform(graft.state.Checkpoints.stable)
    val small = ui.groupBy("__u").agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBasket)
      .select("__u")
    // hash-partitioned on __u at the pinned width and materialized
    // once: the self-join reuses the partitioning on both sides (no
    // exchange), so the quadratic pair expansion runs at full width
    val kept = ui.join(small, Seq("__u"), "left_semi")
      .repartition(nParts, col("__u"))
      .transform(graft.state.Checkpoints.stable)
    try {
      val n = kept.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
      val idType = df.schema(itemCol).dataType
      // Packed pair keys (VERDICT r13 task #1): when item ids are
      // integral, non-negative, and < 2^31 — checked with one bounded
      // 1-row aggregate over the materialized incidence — the pair
      // (ia, ib) groupBy keys on ONE long (ia << 32 | ib) instead of a
      // two-field row. The aggregate hash map keys on an 8-byte
      // primitive (cheaper hashing, smaller entries, less shuffle),
      // cutting allocation in the dominant pair-expansion stage — the
      // stage whose GC sensitivity the r13 stage profiles flagged
      // (measured A/B at sf0.1: q239 4.0 s packed vs 5.1 s generic).
      // Values stay exact: ordering of non-negative ints is preserved
      // under the pack, so pair identity, __ia < __ib, and cooc counts
      // are bit-identical to the generic path.
      val integral = idType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      // ONE bounded driver action serves both the packability probe
      // and — under assumeDistinct — the sampled distinctness
      // tripwire (ADVICE r12 #4): a caller passing a NON-distinct
      // incidence would silently inflate every cooc count, so one
      // deterministic 1/dupCheckMod hash bucket of the materialized
      // incidence is checked for duplicate (user, item) rows. A
      // sliver of one pass, yet it fails loudly for any caller whose
      // duplication isn't a needle-in-a-haystack (real contract
      // breaches duplicate broadly).
      // the LongType cast is gated on `integral`: under ANSI (the
      // Spark 4 default) casting a STRING item id like "checkout"
      // would THROW inside the probe action — non-integral ids must
      // skip the range probe entirely, not fail it loudly (round-15
      // CheckpointKnobProbe found this with event_type ids)
      val mm =
        if (integral)
          kept.agg(min(col("__i").cast(LongType)).as("__mn"),
            max(col("__i").cast(LongType)).as("__mx"))
        else
          kept.agg(min(lit(null).cast(LongType)).as("__mn"),
            max(lit(null).cast(LongType)).as("__mx"))
      val probeRow = (if (assumeDistinct)
          mm.crossJoin(kept
            .filter(pmod(hash(col("__u"), col("__i")),
              lit(dupCheckMod)) === 0)
            .groupBy("__u", "__i").agg(count(lit(1)).as("__m"))
            .agg(coalesce(max("__m"), lit(0L)).as("__dupmax")))
        else mm.withColumn("__dupmax", lit(0L))).head()
      require(probeRow.getLong(2) <= 1L,
        "itemSimilarity(assumeDistinct = true): the input contains " +
          "duplicate (user, item) rows — pass a distinct incidence " +
          "or drop assumeDistinct")
      val packable = integral && !probeRow.isNullAt(0) &&
        probeRow.getLong(0) >= 0L && probeRow.getLong(1) < (1L << 31)
      // minCooc floor (exact, oracle-mirrored): a single shared user
      // is noise in implicit feedback, and cooc = 1 pairs dominate the
      // pair table at corpus scale — the floor cuts everything
      // downstream of the count (sym, norm joins, heap) by the cooc
      // histogram's head while the model keeps only evidence-backed
      // neighbours
      val cooc = if (packable) {
        val keyed = kept.select(col("__u"), col("__i").cast(LongType).as("__l"))
        keyed.select(col("__u"), col("__l").as("__la"))
          .join(keyed.select(col("__u"), col("__l").as("__lb")), "__u")
          .filter(col("__la") < col("__lb"))
          .select((shiftleft(col("__la"), 32)
            .bitwiseOR(col("__lb"))).as("__pk"))
          .groupBy("__pk").agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= minCooc)
          .select(shiftrightunsigned(col("__pk"), 32).cast(idType).as("__ia"),
            col("__pk").bitwiseAND(lit(0xFFFFFFFFL)).cast(idType).as("__ib"),
            col("__c"))
      } else {
        kept.select(col("__u"), col("__i").as("__ia"))
          .join(kept.select(col("__u"), col("__i").as("__ib")), "__u")
          .filter(col("__ia") < col("__ib"))
          .groupBy("__ia", "__ib").agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= minCooc)
      }
      val sym = cooc.unionAll(cooc.select(col("__ib").as("__ia"),
        col("__ia").as("__ib"), col("__c")))
      val scored = sym
        .join(n.select(col("__i").as("__ia"), col("__n").as("__na")), "__ia")
        .join(n.select(col("__i").as("__ib"), col("__n").as("__nb")), "__ib")
        .withColumn("__cos", col("__c").cast(DoubleType) /
          sqrt(col("__na").cast(DoubleType) * col("__nb").cast(DoubleType)))
      scored.groupBy(col("__ia").as("item"))
        .agg(graft.expressions.TopKAgg.topKFor(idType, k)(
          col("__ib"), col("__cos")).as("__topk"))
        .select(col("item"), posexplode(col("__topk")))
        .select(col("item"),
          (col("pos") + 1).cast(IntegerType).as("rank"),
          col("col.id").as("similar_item"),
          // unrounded: exact ints through /, sqrt — IEEE-portable
          col("col.score").as("cosine"))
        .transform(graft.state.Checkpoints.stable)
    } finally {
      // the result is eagerly checkpointed above, so by the time this
      // runs nothing downstream reads ui/kept — release their blocks
      // deterministically rather than waiting on ContextCleaner
      releaseCheckpoint(kept)
      if (!assumeDistinct) releaseCheckpoint(ui)
    }
  }
  /** Order-statistic histogram scaffold shared by [[trimmedMean]],
    * [[bowleySkew]], and [[gini]]: the 6-decimal-quantized value
    * histogram per group with EXACT rank spans (__cumLo..__cumHi) via
    * the two-level cumsum — the corpus never sorts, the only window
    * is per (group, 1024-value bucket) over DISTINCT values.
    */
  private def rankedHist(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol),
        round(col(valueCol) * 1000000).cast(LongType).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val (bucketed, wi) = TwoLevelCumsum.withGroupedOffsets(
      hist, Seq(groupCol), expr("__v div 1024L"), col("__c"),
      Seq(col("__v").asc))
    bucketed
      .withColumn("__cumHi", col("__off") + sum("__w").over(wi))
      .withColumn("__cumLo", col("__cumHi") - col("__c") + 1)
      // every consumer (totals, rank lookups, kept-span joins) reuses
      // the SAME rank cover — checkpointed so the histogram + cumsum
      // run once, not once per consumer (measured: winsorizedMean ran
      // it 4x). The frame is distinct-(group, value)-sized — the
      // operator family's working set by construction.
      .transform(graft.state.Checkpoints.stable)
  }

  /** Trimmed mean: drop the k = n div `trimDenom` smallest and k
    * largest observations per group, average the rest — the
    * outlier-robust location estimate between mean and median.
    *
    * Exactness: rank spans come from the integer histogram cumsum;
    * each value block contributes `overlap(block, (k, n-k]) × v`
    * summed in Decimal(38,0); ONE closing division then the exact
    * /1e6 de-quantization — unrounded, bit-portable (the round-10
    * doctrine). Groups with n - 2k = 0 report NULL.
    *
    * Scale shape: one map-side-combined histogram pass, windows only
    * over distinct values per (group, bucket), #groups output rows.
    */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimDenom: Int = 10): DataFrame = {
    require(trimDenom >= 2, "trimDenom must be >= 2")
    val dec = DecimalType(38, 0)
    val cum = rankedHist(df, groupCol, valueCol)
    val totals = cum.groupBy(col(groupCol)).agg(max("__cumHi").as("__n"))
      .withColumn("__k", expr(s"__n div $trimDenom"))
    cum.join(totals, Seq(groupCol))
      .withColumn("__kept", greatest(lit(0L),
        least(col("__cumHi"), col("__n") - col("__k")) -
          greatest(col("__cumLo") - 1, col("__k"))))
      .groupBy(col(groupCol))
      .agg(max("__n").as("n"), max("__k").as("n_trimmed_each_side"),
        sum(col("__kept").cast(dec) * col("__v").cast(dec)).as("__s"))
      .select(col(groupCol), col("n"), col("n_trimmed_each_side"),
        when(col("n") - lit(2L) * col("n_trimmed_each_side") > 0,
          col("__s").cast(DoubleType) /
            (col("n") - lit(2L) * col("n_trimmed_each_side"))
              .cast(DoubleType) / 1e6).as("trimmed_mean"))
  }

  /** Bowley (quartile) skewness: (Q3 + Q1 − 2·Q2) / (Q3 − Q1) on
    * TYPE-1 (ceil-rank) order statistics — Q_j = value at rank
    * ceil(j·n/4). Order statistics are exact integers off the rank
    * cover, so unlike moment skewness there is no cube to overflow
    * and no fp accumulation; the closing is one integer-operand
    * division, unrounded. Q1 = Q3 (no spread) reports NULL.
    */
  def bowleySkew(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val cumBase = rankedHist(df, groupCol, valueCol)
    val cum = cumBase
      .join(cumBase.groupBy(col(groupCol)).agg(max("__cumHi").as("__n")),
        Seq(groupCol))
      .withColumn("__r1", expr("(__n + 3) div 4"))
      .withColumn("__r2", expr("(__n + 1) div 2"))
      .withColumn("__r3", expr("(3 * __n + 3) div 4"))
    def at(rank: Column, out: String) =
      cum.filter(col("__cumLo") <= rank && rank <= col("__cumHi"))
        .groupBy(col(groupCol)).agg(min("__v").as(out))
    at(col("__r1"), "__q1")
      .join(at(col("__r2"), "__q2"), Seq(groupCol))
      .join(at(col("__r3"), "__q3"), Seq(groupCol))
      .join(cum.groupBy(col(groupCol)).agg(max("__n").as("n")), Seq(groupCol))
      .select(col(groupCol), col("n"),
        (col("__q1").cast(DoubleType) / 1e6).as("q1"),
        (col("__q2").cast(DoubleType) / 1e6).as("q2"),
        (col("__q3").cast(DoubleType) / 1e6).as("q3"),
        when(col("__q3") > col("__q1"),
          (col("__q3") + col("__q1") - lit(2L) * col("__q2"))
            .cast(DoubleType) /
            (col("__q3") - col("__q1")).cast(DoubleType))
          .as("bowley_skew"))
  }

  /** Gini coefficient over NONNEGATIVE values (negative rows are
    * excluded and counted — inequality of a signed quantity is
    * undefined): G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx) on the sorted
    * sample. With ties the rank block (lo..hi) of a value v
    * contributes v·(hi(hi+1) − (lo−1)lo − c(n+1)) to the DOUBLED
    * numerator — exact Decimal(38,0) integers end to end, one
    * closing division of 2·num/2 = num/(n·S), unrounded. All-zero
    * or empty groups report NULL.
    */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.filter(col(valueCol).isNotNull)
    val negs = base.filter(col(valueCol) < 0)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__neg"))
    val cum = rankedHist(base.filter(col(valueCol) >= 0), groupCol, valueCol)
    val totals = cum.groupBy(col(groupCol)).agg(max("__cumHi").as("__n"))
    cum.join(totals, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max("__n").as("n"),
        sum(col("__c").cast(dec) * col("__v").cast(dec)).as("__s"),
        sum((col("__cumHi").cast(dec) * (col("__cumHi").cast(dec) + 1) -
          (col("__cumLo").cast(dec) - 1) * col("__cumLo").cast(dec) -
          col("__c").cast(dec) * (col("__n").cast(dec) + 1)) *
          col("__v").cast(dec)).as("__num2"))
      .join(negs, Seq(groupCol), "left")
      .select(col(groupCol), col("n"),
        coalesce(col("__neg"), lit(0L)).as("n_negative_excluded"),
        when(col("__s") > 0,
          col("__num2").cast(DoubleType) /
            (col("n").cast(dec) * col("__s")).cast(DoubleType)).as("gini"))
  }

  /** Winsorized mean: CLAMP (not drop — [[trimmedMean]]'s sibling)
    * the k = n div `trimDenom` smallest observations to the value at
    * rank k+1 and the k largest to the value at rank n−k, then
    * average all n. Total = Σ kept-range block overlap × v +
    * k·x₍k+1₎ + k·x₍n−k₎ — exact integers through the Decimal sum,
    * ONE closing division, /1e6 de-quantization, unrounded.
    */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
                     trimDenom: Int = 10): DataFrame = {
    require(trimDenom >= 2, "trimDenom must be >= 2")
    val dec = DecimalType(38, 0)
    val cum = rankedHist(df, groupCol, valueCol)
    val totals = cum.groupBy(col(groupCol)).agg(max("__cumHi").as("__n"))
      .withColumn("__k", expr(s"__n div $trimDenom"))
    val joined = cum.join(totals, Seq(groupCol))
    val kept = joined
      .withColumn("__kept", greatest(lit(0L),
        least(col("__cumHi"), col("__n") - col("__k")) -
          greatest(col("__cumLo") - 1, col("__k"))))
      .groupBy(col(groupCol))
      .agg(max("__n").as("n"), max("__k").as("n_winsorized_each_side"),
        sum(col("__kept").cast(dec) * col("__v").cast(dec)).as("__s"))
    def at(rank: Column, out: String) =
      joined.filter(col("__cumLo") <= rank && rank <= col("__cumHi"))
        .groupBy(col(groupCol)).agg(min("__v").as(out))
    kept
      .join(at(col("__k") + 1, "__vlo"), Seq(groupCol))
      .join(at(col("__n") - col("__k"), "__vhi"), Seq(groupCol))
      .select(col(groupCol), col("n"), col("n_winsorized_each_side"),
        when(col("n") > 0,
          (col("__s") + col("n_winsorized_each_side").cast(dec) *
            (col("__vlo").cast(dec) + col("__vhi").cast(dec)))
            .cast(DoubleType) / col("n").cast(DoubleType) / 1e6)
          .as("winsorized_mean"))
  }

  /** Lorenz curve at decile ranks — the distribution behind [[gini]]'s
    * single number: for d = 1..10, the cumulative value held by the
    * bottom rank (n·d) div 10 observations next to the group total.
    * Cumulative value at a rank boundary is
    * blockEndCum − (blockHi − rank)·v — exact Decimal integers. The
    * output is integer-only (both legs of the share ratio ship as
    * BIGINT on the 6-decimal value lattice; the share itself is one
    * division away for the reader), so the gate surface carries no
    * float and no engine-implemented wide-int→double cast. Values
    * must be nonnegative (negatives excluded, [[gini]]'s contract).
    */
  def lorenzDeciles(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cum = rankedHist(df.filter(col(valueCol) >= 0), groupCol, valueCol)
    val (withVal, wv) = TwoLevelCumsum.withGroupedOffsets(
      cum.withColumn("__cv", col("__c").cast(dec) * col("__v").cast(dec))
        .drop("__b", "__w", "__off"),
      Seq(groupCol), expr("__v div 1024L"), col("__cv"),
      Seq(col("__v").asc))
    val cv = withVal
      .withColumn("__cvHi", col("__off") + sum("__w").over(wv))
      // two consumers (totals + the decile join) — run the value
      // cumsum once
      .transform(graft.state.Checkpoints.stable)
    val totals = cv.groupBy(col(groupCol))
      .agg(max("__cumHi").as("__n"), max("__cvHi").as("__tot"))
    val deciles = totals.select(col(groupCol), col("__n"), col("__tot"),
      explode(sequence(lit(1), lit(10))).as("decile"))
      .withColumn("__rd", expr("__n * decile div 10"))
    cv.join(deciles, Seq(groupCol))
      .filter(col("__rd") >= col("__cumLo") && col("__rd") <= col("__cumHi"))
      .select(col(groupCol), col("decile").cast(IntegerType).as("decile"),
        col("__rd").as("rank"),
        (col("__cvHi") - (col("__cumHi") - col("__rd")).cast(dec) *
          col("__v").cast(dec)).cast(LongType).as("cum_value_e6"),
        col("__tot").cast(LongType).as("total_value_e6"))
  }

  /** Per-group two-central-order-statistics sum over an INTEGER value
    * column: (group, n, m2 = v[(n+1) div 2] + v[n div 2 + 1]) — m2 is
    * exactly twice the lower-interpolated median, kept as the integer
    * SUM so no engine ever divides. Histogram + grouped two-level
    * cumsum; the corpus never sorts.
    */
  private def medianSum2(in: DataFrame, groupCol: String,
                         vCol: String): DataFrame = {
    val hist = in.groupBy(col(groupCol), col(vCol).as("__hv"))
      .agg(count(lit(1)).as("__c"))
    val (bucketed, wi) = TwoLevelCumsum.withGroupedOffsets(
      hist, Seq(groupCol), expr("__hv div 1024L"), col("__c"),
      Seq(col("__hv").asc))
    val cum = bucketed
      .withColumn("__cumHi", col("__off") + sum("__w").over(wi))
      .withColumn("__cumLo", col("__cumHi") - col("__c") + 1)
      // two consumers (totals + the rank lookup) — run the cumsum once
      .transform(graft.state.Checkpoints.stable)
    val tot = cum.groupBy(col(groupCol)).agg(max("__cumHi").as("__n"))
    cum.join(tot, Seq(groupCol))
      .withColumn("__rlo", expr("(__n + 1) div 2"))
      .withColumn("__rhi", expr("__n div 2 + 1"))
      .groupBy(col(groupCol))
      .agg(max("__n").as("__n"),
        sum(when(col("__rlo").between(col("__cumLo"), col("__cumHi")),
          col("__hv")).otherwise(0L) +
          when(col("__rhi").between(col("__cumLo"), col("__cumHi")),
            col("__hv")).otherwise(0L)).as("__m2"))
  }

  /** Robust outlier screen: median + MAD (median absolute deviation)
    * per group, with the |x − med| > k·MAD flag count — the
    * location/scale pair that a 1%-whale column doesn't drag the way
    * mean/std are dragged. EVERYTHING stays on the integer lattice:
    * med ships as the two-central-sum m2 (= 2·median), deviations are
    * dev2 = |2v − m2| (= 2·|v − med|, exact), MAD ships as the
    * two-central-sum of dev2 (mad4 = 4·MAD), and the flag is the pure
    * integer comparison 2·dev2 > k·mad4 ⟺ |v − med| > k·MAD. No
    * division, no float, no engine-version surface anywhere.
    *
    * Scale shape: two histogram + rank-cover passes (values, then
    * deviations) and one flag aggregate — windows only over distinct
    * values per (group, 1024-bucket); #groups output rows.
    */
  def madOutlierScreen(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        round(col(valueCol) * 1000000).cast(LongType).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // med and mad are #groups-row MODEL frames consumed by several
      // downstream branches — checkpointed so their rank passes run
      // once, not once per consumer
      val med = medianSum2(vals, groupCol, "__v")
        .withColumnRenamed("__n", "n").withColumnRenamed("__m2", "__med2")
        .transform(graft.state.Checkpoints.stable)
      val dev = vals.join(broadcast(med), Seq(groupCol))
        .withColumn("__d2", abs(lit(2L) * col("__v") - col("__med2")))
      val mad = medianSum2(dev.select(col(groupCol), col("__d2")),
        groupCol, "__d2")
        .select(col(groupCol), col("__m2").as("__mad4"))
        .transform(graft.state.Checkpoints.stable)
      val flags = dev.join(broadcast(mad), Seq(groupCol))
        .groupBy(col(groupCol))
        .agg(sum(when(lit(2L) * col("__d2") > lit(k.toLong) * col("__mad4"),
          1L).otherwise(0L)).as("n_outliers"))
      med.join(mad, Seq(groupCol)).join(flags, Seq(groupCol))
        .select(col(groupCol), col("n"),
          col("__med2").as("median2_e6"),
          col("__mad4").as("mad4_e6"),
          col("n_outliers"))
        .transform(graft.state.Checkpoints.stable)
    } finally vals.unpersist(blocking = false)
  }

  /** Per-group decile VALUES (the order statistic at rank (n·d) div 10
    * for d = 1..10) off the shared [[rankedHist]] rank cover — the
    * distribution-shape report behind "how long are this feed's
    * documents" class questions. Values ride the same 6-decimal
    * integer lattice as every rank-cover operator, so the output is
    * integer-only; rank-0 deciles (tiny groups) are absent, the
    * [[lorenzDeciles]] convention.
    *
    * Scale shape: one map-side-combined histogram pass; windows only
    * over distinct values per (group, 1024-bucket); ≤ 10·#groups
    * output rows.
    */
  def valueDeciles(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    val cum = rankedHist(df, groupCol, valueCol)
    val totals = cum.groupBy(col(groupCol)).agg(max("__cumHi").as("__n"))
    val deciles = totals.select(col(groupCol), col("__n"),
      explode(sequence(lit(1), lit(10))).as("decile"))
      .withColumn("__rd", expr("__n * decile div 10"))
    cum.join(deciles, Seq(groupCol))
      .filter(col("__rd") >= col("__cumLo") && col("__rd") <= col("__cumHi"))
      .select(col(groupCol), col("decile").cast(IntegerType).as("decile"),
        col("__rd").as("rank"), col("__v").as("value_e6"))
  }

  /** Fano dispersion index of daily activity per group: variance /
    * mean of the ZERO-FILLED daily count series over the global
    * calendar span — ≈1 is Poisson-like, ≫1 is bursty (campaigns,
    * bots), ≪1 is metronomic (schedulers). F = (n·Σx² − (Σx)²) /
    * ((n−1)·Σx) — integer operands, one unrounded division; groups
    * with zero events or a single day report NULL.
    *
    * Scale shape: one (group, day) count with map-side combine; the
    * dense zero-fill happens in the MOMENTS (n = span days, missing
    * days add zero to every sum), never as a materialized grid.
    */
  def dispersionIndex(events: DataFrame, groupCol: String = "event_type",
                      tsCol: String = "ts"): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = events
      .select(col(groupCol).as("__g"), to_date(col(tsCol)).as("__day"))
      .groupBy("__g", "__day").agg(count(lit(1)).as("__x"))
    val span = daily.agg(
      (datediff(max("__day"), min("__day")) + 1).cast(LongType).as("__nd"))
    daily.groupBy(col("__g"))
      .agg(sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
      .crossJoin(broadcast(span))
      .select(col("__g").as(groupCol), col("__nd").as("n_days"),
        (col("__sx").cast(DoubleType) / col("__nd").cast(DoubleType) / 1.0)
          .as("mean_daily"),
        when(col("__nd") > 1 && col("__sx") > 0,
          (col("__nd").cast(dec) * col("__sxx") - col("__sx") * col("__sx"))
            .cast(DoubleType) /
            ((col("__nd") - 1).cast(dec) * col("__sx")).cast(DoubleType))
          .as("fano"))
  }

}
