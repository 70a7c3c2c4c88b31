package graft

import graft.tables.MasterTables
import org.apache.spark.sql.functions._

class MasterTablesSpec extends SparkSpec {
  import spark.implicits._

  test("insertNewRecords: anti-join append (general_queries.py:87-98)") {
    val master   = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val out = MasterTables.insertNewRecords(master, incoming, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a"), (2L, "b"), (3L, "c")), "existing key keeps old row")
  }

  test("syncUpdate: correlated UPDATE ... FROM (integrate_new_requests.py:109-121)") {
    val master  = Seq((1L, "open", "x"), (2L, "open", "y")).toDF("id", "status", "other")
    val updates = Seq((2L, "closed"), (3L, "ignored")).toDF("id", "status")
    val out = MasterTables.syncUpdate(master, updates, Seq("id"), Seq("status"))
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out === Seq((1L, "open", "x"), (2L, "closed", "y")),
      "only matching keys updated; non-update columns untouched; unknown keys ignored")
  }

  test("syncUpdate: matched row takes an incoming NULL (unconditional SET, integrate_new_requests.py:190-196)") {
    // a re-opened ticket arrives with closed_date = NULL: the master's
    // stale closed date must be cleared, not kept via coalesce
    val master  = Seq((1L, Option("2024-01-01")), (2L, Option("2024-02-02"))).toDF("id", "closed_date")
    val updates = Seq((2L, Option.empty[String])).toDF("id", "closed_date")
    val out = MasterTables.syncUpdate(master, updates, Seq("id"), Seq("closed_date"))
      .orderBy("id").as[(Long, Option[String])].collect().toSeq
    assert(out === Seq((1L, Some("2024-01-01")), (2L, None)),
      "matched key with NULL update overwrites; unmatched keeps old value")
  }

  test("integrateChildren: an existing child struct with NULL child_id " +
    "survives new arrivals (null-safe replace filter)") {
    import org.apache.spark.sql.functions._
    val master = Seq(("p1", 2L)).toDF("id", "num_requests")
      .withColumn("child_tickets", expr(
        "array(struct(cast(null as string) as child_id, 'c' as child_comments, 'n' as child_notes))"))
    val children = Seq(("p1", "k9", "cc", "nn"))
      .toDF("parent_ticket_id", "child_id", "child_comments", "child_notes")
    val out = MasterTables.integrateChildren(master, children,
      parentKey = "id", childParentKey = "parent_ticket_id",
      childCols = Seq("child_id", "child_comments", "child_notes"))
    val row = out.head()
    val kids = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("child_tickets"))
    assert(kids.length === 2, "null-id struct kept alongside the new child")
    assert(kids.map(_.getAs[String]("child_comments")).toSet === Set("c", "cc"))
  }

  test("deleteOldInsertNew: snapshot upsert (integrate_new_requests.py:84-106)") {
    val master   = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "B2"), (4L, "d")).toDF("id", "v")
    val out = MasterTables.deleteOldInsertNew(master, incoming, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a"), (2L, "B2"), (4L, "d")))
  }

  test("appendOnlyHistory: UNION ALL with NOT-IN guard (general_queries.py:172-184)") {
    val hist = Seq((1L, 100L, 10.0), (1L, 200L, 12.0)).toDF("emp", "ts", "balance")
    val inc  = Seq((1L, 200L, 99.0), (1L, 300L, 14.0)).toDF("emp", "ts", "balance")
    val out = MasterTables.appendOnlyHistory(hist, inc, Seq("emp", "ts"))
      .orderBy("ts").as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 100L, 10.0), (1L, 200L, 12.0), (1L, 300L, 14.0)),
      "re-arriving (emp,ts) keeps original history row")
  }

  test("integrateChildren: ARRAY_AGG append + count (integrate_new_requests.py:200-232)") {
    val childType = "array<struct<cid:string,comment:string>>"
    val master = Seq((10L, 2L), (20L, 1L)).toDF("id", "num_requests")
      .withColumn("child_tickets",
        when(col("id") === 10L,
          array(struct(lit("c1").as("cid"), lit("old").as("comment"))))
          .otherwise(array().cast(childType)))
    val children = Seq(("c2", "new", 10L), ("c3", "new2", 10L))
      .toDF("cid", "comment", "parent_id")
    val out = MasterTables.integrateChildren(master, children,
      parentKey = "id", childParentKey = "parent_id",
      childCols = Seq("cid", "comment"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[Seq[_]]("child_tickets").length === 3, "2 new appended to 1 old")
    assert(rows(0).getAs[Long]("num_requests") === 4L, "ARRAY_LENGTH + 1")
    assert(rows(1).getAs[Seq[_]]("child_tickets").length === 0, "no new children")
    assert(rows(1).getAs[Long]("num_requests") === 1L)
  }

  test("dataQualityDiff: new distinct values surface (general_queries.py:4-28)") {
    val prev = Seq("pothole", "graffiti").toDF("type")
    val cur  = Seq("pothole", "graffiti", "snow", "snow").toDF("type")
    val out = MasterTables.dataQualityDiff(
      MasterTables.dataQualitySnapshot(cur, Seq("type")), prev)
    assert(out.as[String].collect().toSeq === Seq("snow"))
  }

  test("unionDistinct (transform_enrich_requests.py:88-94)") {
    val a = Seq(1, 2).toDF("x"); val b = Seq(2, 3).toDF("x")
    assert(MasterTables.unionDistinct(a, b).orderBy("x").as[Int].collect().toSeq === Seq(1, 2, 3))
  }

  test("scd2Merge: changed keys close + reopen, new keys insert open, " +
    "unchanged / unstaged / historical rows pass through, NULL attr " +
    "equals '' under the IFNULL rule") {
    import org.apache.spark.sql.functions.lit
    val dim = Seq(
      ("C1", "Ann", "Oak", "2024-01-01", null.asInstanceOf[String], true),
      ("C1", "Ann", "Elm", "2023-06-01", "2024-01-01", false), // history
      ("C2", "Bob", "Pine", "2024-01-01", null.asInstanceOf[String], true),
      ("C3", "Cy", "Ash", "2024-01-01", null.asInstanceOf[String], true),
      ("C4", null.asInstanceOf[String], "Gum", "2024-01-01", null.asInstanceOf[String], true))
      .toDF("cust_id", "name", "city", "valid_from", "valid_to", "is_current")
    val staging = Seq(
      ("C1", "Ann", "Oak"),    // unchanged
      ("C2", "Bob", "Birch"),  // changed
      ("C4", "", "Gum"),       // NULL vs '' — unchanged
      ("C9", "New", "Fir"))    // brand new
      .toDF("cust_id", "name", "city")
    val out = MasterTables.scd2Merge(dim, staging, Seq("cust_id"),
      Seq("name", "city"), lit("2024-06-01"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getBoolean(5))).toSet
    assert(out === Set(
      ("C1", "Ann", "Elm", "2023-06-01", "2024-01-01", false),   // history
      ("C1", "Ann", "Oak", "2024-01-01", null, true),            // unchanged
      ("C2", "Bob", "Pine", "2024-01-01", "2024-06-01", false),  // closed
      ("C2", "Bob", "Birch", "2024-06-01", null, true),          // reopened
      ("C3", "Cy", "Ash", "2024-01-01", null, true),             // unstaged
      ("C4", null, "Gum", "2024-01-01", null, true),             // NULL == ''
      ("C9", "New", "Fir", "2024-06-01", null, true)))           // fresh
    // exactly one open version per key
    val opens = out.toSeq.filter(_._6).groupBy(_._1).view.mapValues(_.size)
    assert(opens.values.forall(_ == 1))
  }

  test("scd2Merge: idempotent — re-merging the same staging snapshot " +
    "against the merged dimension changes nothing (no spurious new " +
    "versions on unchanged attributes)") {
    import org.apache.spark.sql.functions.lit
    val dim = Seq(
      ("C1", "Ann", "2024-01-01", null.asInstanceOf[String], true),
      ("C2", "Bob", "2024-01-01", null.asInstanceOf[String], true))
      .toDF("cust_id", "name", "valid_from", "valid_to", "is_current")
    val staging = Seq(("C1", "Ann2"), ("C3", "New")).toDF("cust_id", "name")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSet
    val once = MasterTables.scd2Merge(dim, staging, Seq("cust_id"),
      Seq("name"), lit("2024-06-01"))
    val twice = MasterTables.scd2Merge(once, staging, Seq("cust_id"),
      Seq("name"), lit("2024-07-01"))
    assert(rows(twice) === rows(once),
      "second merge of an identical snapshot must be a no-op")
  }

  test("scd2Merge: a NULL is_current row passes through with the " +
    "historical slice instead of silently vanishing (filter(c) and " +
    "filter(!c) both exclude NULL)") {
    import org.apache.spark.sql.functions.lit
    val dim = Seq(
      ("C1", "Ann", "2024-01-01", null.asInstanceOf[String], Some(true)),
      // legacy row with unknown currency — must survive the merge
      ("C1", "A0", "2020-01-01", "2021-01-01", None),
      ("C2", "Bob", "2024-01-01", null.asInstanceOf[String], Some(true)))
      .toDF("cust_id", "name", "valid_from", "valid_to", "is_current")
    val staging = Seq(("C1", "Ann2")).toDF("cust_id", "name")
    val out = MasterTables.scd2Merge(dim, staging, Seq("cust_id"),
      Seq("name"), lit("2024-06-01"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toSet
    assert(out === Set(
      ("C1", "A0", "2020-01-01", "2021-01-01", None),          // preserved
      ("C1", "Ann", "2024-01-01", "2024-06-01", Some(false)),  // closed
      ("C1", "Ann2", "2024-06-01", null, Some(true)),          // reopened
      ("C2", "Bob", "2024-01-01", null, Some(true))))          // unstaged
  }

  test("scd2Merge: a double-staged key is rejected — it would create " +
    "two simultaneous open versions") {
    import org.apache.spark.sql.functions.lit
    val dim = Seq(("C1", "Ann", "2024-01-01", null.asInstanceOf[String], true))
      .toDF("cust_id", "name", "valid_from", "valid_to", "is_current")
    val staging = Seq(("C1", "A"), ("C1", "B")).toDF("cust_id", "name")
    intercept[IllegalArgumentException] {
      MasterTables.scd2Merge(dim, staging, Seq("cust_id"), Seq("name"),
        lit("2024-06-01"))
    }
  }
}
