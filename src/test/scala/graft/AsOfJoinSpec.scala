package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: largest right time <= left time per key; no match => NULLs") {
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"), (3L, 10L, "t4"))
      .toDF("k", "lt", "trade")
    val quotes = Seq(
      (1L, 90L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0), (2L, 50L, 4.0))
      .toDF("k", "rt", "px")
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"), "lt", "rt")
      .select("trade", "rt", "px").orderBy("trade")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq === Seq(
      ("t1", Some(90L), Some(1.0)),    // 90 <= 100 < 200
      ("t2", Some(200L), Some(2.0)),   // 200 <= 205 < 300
      ("t3", Some(50L), Some(4.0)),    // equal time matches
      ("t4", None, None)))             // key 3 absent
  }

  test("asofJoin SQL semantics: NULL times and NULL keys never match, " +
    "cross-side type mismatches are rejected up front") {
    val trades = Seq(
      (Some(1L), Some(100L), "t1"),
      (Some(1L), None, "t_null_time"),
      (None, Some(100L), "t_null_key")).toDF("k", "lt", "trade")
    val quotes = Seq(
      (Some(1L), None, 9.9),        // NULL right time: unmatchable
      (Some(1L), Some(90L), 1.0),
      (None, Some(50L), 8.8))       // NULL right key: unmatchable
      .toDF("k", "rt", "px")
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"), "lt", "rt")
      .select("trade", "px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out("t1") === Some(1.0), "the NULL-time quote must NOT win as -infinity")
    assert(out("t_null_time") === None, "NULL left time matches nothing")
    assert(out("t_null_key") === None, "NULL left key matches nothing")
    // type mismatches: long vs timestamp time, int vs long key
    val tsQuotes = quotes.withColumn("rt", timestamp_seconds(col("rt")))
    val e1 = intercept[IllegalArgumentException](
      AsOfJoin.asofJoin(trades, tsQuotes, Seq("k"), "lt", "rt"))
    assert(e1.getMessage.contains("time type mismatch"))
    val intKeyTrades = trades.withColumn("k", col("k").cast("int"))
    val e2 = intercept[IllegalArgumentException](
      AsOfJoin.asofJoin(intKeyTrades, quotes, Seq("k"), "lt", "rt"))
    assert(e2.getMessage.contains("type mismatch"))
  }

  test("asofJoin matches the window-based equivalent on events at sf0.001") {
    val e = Tables.events(spark, sf("sf0.001"))
    // left: one probe per user at a fixed instant; right: that user's events
    val probes = e.groupBy("user_id").agg(max(unix_timestamp(col("ts"))).as("probe_t"))
      .withColumn("probe_t", col("probe_t") - 3600)
    val evs = e.select(col("user_id").as("r_user"), unix_timestamp(col("ts")).as("et"),
      col("event_id"))
    val got = AsOfJoin.asofJoin(
      probes, evs.withColumnRenamed("r_user", "user_id")
        .select(col("user_id"), col("et"), col("event_id")),
      Seq("user_id"), "probe_t", "et")
      .select(col("user_id"), col("event_id"))
      .as[(Long, Option[Long])].collect().toMap

    // oracle: window form — latest event with et <= probe_t; ties on et
    // broken by storage order in asof (last in sort order wins) vs
    // max event_id here; event times are unique in this data
    val w = Window.partitionBy("user_id").orderBy(col("et").desc)
    val expect = probes.join(evs.withColumnRenamed("r_user", "user_id"), Seq("user_id"))
      .filter(col("et") <= col("probe_t"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toMap

    expect.foreach { case (u, eid) =>
      assert(got(u) === Some(eid), s"user $u")
    }
    assert(got.size === probes.count())
  }

  test("asofJoin plan: one shuffle per side, no window sort of the union") {
    val l = Seq((1L, 10L)).toDF("k", "lt")
    val r = Seq((1L, 5L, "x")).toDF("k", "rt", "v")
    val p = AsOfJoin.asofJoin(l, r, Seq("k"), "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, p)
    assert(!p.contains("Window"), "no window sort of the union")
  }
}
