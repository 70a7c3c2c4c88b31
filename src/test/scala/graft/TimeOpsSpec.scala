package graft

import graft.operators.TimeOps

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("standardizeTimes: declared tz OVERRIDES embedded tz (tests/test_dataflow_utils.py:334-356)") {
    // 'Fri July 19 03:21:55 UTC 2019' declared America/Denver: the UTC
    // token is discarded, 03:21:55 is read as Denver local (UTC-6 in
    // July) => 09:21:55Z = 1563528115
    val df = Seq(("Fri July 19 03:21:55 UTC 2019", "2021-05-01 01:44:00-04:00"))
      .toDF("openedDate", "closedDate")
    val out = TimeOps.standardizeTimes(df,
      Seq(("openedDate", "America/Denver"), ("closedDate", "UTC"))).head()
    assert(out.getAs[Long]("openedDate_UNIX") === 1563528115L)
    assert(out.getAs[String]("openedDate_UTC") === "07/19/2019 09:21:55+0000")
    assert(out.getAs[String]("openedDate_EST") === "07/19/2019 05:21:55-0400")
    // '-04:00' offset discarded, wall time read as UTC
    assert(out.getAs[Long]("closedDate_UNIX") === 1619833440L)
    assert(out.getAs[String]("closedDate_UTC") === "05/01/2021 01:44:00+0000")
    assert(out.getAs[String]("closedDate_EST") === "04/30/2021 21:44:00-0400")
  }

  test("standardizeTimes: null/empty/unparseable => all NULL") {
    val df = Seq(("", "garbage text"), (null, null)).toDF("a", "b")
    val out = TimeOps.standardizeTimes(df, Seq(("a", "UTC"), ("b", "UTC"))).collect()
    out.foreach { r =>
      Seq("a_UTC", "a_EST", "a_UNIX", "b_UTC", "b_EST", "b_UNIX").foreach(c =>
        assert(r.isNullAt(r.fieldIndex(c)), c))
    }
  }

  test("standardizeTimes: common format battery (dateutil parity subset)") {
    val inputs = Seq(
      "2023-06-15 10:30:00", "2023-06-15T10:30:00", "06/15/2023 10:30:00",
      "Jun 15 2023 10:30:00", "Jun 15, 2023 10:30:00", "15 Jun 2023 10:30:00")
    val df  = inputs.toDF("t")
    val out = TimeOps.standardizeTimes(df, Seq(("t", "UTC")))
    val unixes = out.select("t_UNIX").as[Long].collect().toSeq
    assert(unixes.forall(_ === 1686825000L), unixes.toString)
  }

  test("dateStringsFromUnix emits _utc and _est strings (:398-412)") {
    val df  = Seq(1563528115L).toDF("ts")
    val out = TimeOps.dateStringsFromUnix(df, "ts").head()
    assert(out.getAs[String]("ts_utc") === "2019-07-19 09:21:55")
    assert(out.getAs[String]("ts_est") === "2019-07-19 05:21:55")
  }

  test("EST offset flips with daylight saving") {
    val df = Seq(("01/15/2021 12:00:00", "07/15/2021 12:00:00")).toDF("w", "s")
    val out = TimeOps.standardizeTimes(df, Seq(("w", "UTC"), ("s", "UTC"))).head()
    assert(out.getAs[String]("w_EST").endsWith("-0500"), "winter = EST")
    assert(out.getAs[String]("s_EST").endsWith("-0400"), "summer = EDT")
  }
}
