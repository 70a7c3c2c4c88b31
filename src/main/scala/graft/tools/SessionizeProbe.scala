package graft.tools

import graft.operators.AnalyticsOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-user probe for the bucketed sessionization: one bot account
  * holds 95% of a synthetic event log, the rest spreads over 10k
  * normal users. The naive gaps-and-islands form (per-user window)
  * serializes the bot through a single task; `sessionizeBucketed`
  * bounds every event-sized partition by (user, day). The probe
  * asserts result equality at every scale, then tables wall-clock and
  * the MAX per-partition row count each plan's event window sees —
  * the number that decides whether a 100 TB bot log fits in one
  * task's memory.
  *
  * Usage: runMain graft.tools.SessionizeProbe
  */
object SessionizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** 95% of events on user 0, spanning `days` days; deterministic
      * pseudo-times from xxhash64 so every run sees the same log.
      */
    def log(nEvents: Long, days: Int): DataFrame =
      spark.range(nEvents).select(
        col("id").as("event_id"),
        when(xxhash64(col("id")) % 100 < 95, 0L)
          .otherwise(abs(xxhash64(col("id"), lit(1))) % 10000 + 1).as("user_id"),
        timestamp_micros(lit(1704067200000000L) // 2024-01-01
          + abs(xxhash64(col("id"), lit(2))) % (days.toLong * 86400000000L))
          .as("ts"))

    def naive(events: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events
        .withColumn("__p", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("__s", when(col("__p").isNull ||
          unix_micros(col("ts")) - col("__p") > 900L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum("__s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("first_ts_us"),
          max(unix_micros(col("ts"))).as("last_ts_us"))
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println(f"${"events"}%10s ${"naiveSec"}%9s ${"bucketSec"}%10s " +
      f"${"naiveMaxPart"}%13s ${"bucketMaxPart"}%14s  equal")
    for (n <- Seq(100000L, 400000L, 1600000L)) {
      val events = log(n, days = 30).localCheckpoint()
      val (naiveRows, tN) = time(naive(events).collect().toSet)
      val (bucketRows, tB) = time(
        AnalyticsOps.sessionizeBucketed(events, gapSecs = 900L).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet)
      val naiveSet = naiveRows
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // max rows any event-sized window partition holds under each plan
      val naiveMax = events.groupBy("user_id").count()
        .agg(max("count")).head().getLong(0)
      val bucketMax = events
        .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000"))
        .count().agg(max("count")).head().getLong(0)
      println(f"$n%10d $tN%9.2f $tB%10.2f $naiveMax%13d $bucketMax%14d  " +
        (naiveSet == bucketRows))
      events.unpersist()
    }
    spark.stop()
  }
}
