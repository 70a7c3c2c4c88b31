package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface test: a session built with GraftExtensions can call
  * the engine's functions from plain SQL.
  */
class GraftExtensionsSpec extends SparkSpec {

  // live-session install: builder .withExtensions only applies to a
  // session created fresh, and the suite JVM shares one session
  GraftExtensions.install(spark)

  test("cosine_sim / jaccard_sim callable from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       jaccard_sim(array('a','b'), array('b','c')) AS j""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
  }

  test("graft_text_stats returns the fused counter struct") {
    val r = spark.sql(
      "SELECT graft_text_stats('the quick brown fox, it jumps!') AS st").head()
    val st = r.getStruct(0)
    assert(st.getAs[Long]("n_tokens") === 6L)
    assert(st.getAs[Long]("n_punct") === 2L)
    assert(st.getAs[Seq[Long]]("hits").head === 2L, "'the' and 'it' hit the stopword set")
  }

  test("normalize_text / hash_bucket reuse the column-API trees from SQL") {
    val r = spark.sql(
      "SELECT normalize_text('  Hello,   WORLD!! ') AS n, hash_bucket('42') AS b").head()
    assert(r.getString(0) === "hello world")
    // same value the DataFrame-side primitive produces
    import spark.implicits._
    val expected = Seq("42").toDF("k")
      .select(graft.operators.SplitOps.hashBucket(org.apache.spark.sql.functions.col("k")))
      .head().getLong(0)
    assert(r.getLong(1) === expected)
    assert(r.getLong(1) >= 0L && r.getLong(1) < 4294967296L)
  }

  test("nfc_normalize composes combining marks from SQL") {
    // 'cafe' + U+0301 combining acute must compose to the U+00E9 form
    val r = spark.sql(
      "SELECT nfc_normalize(concat('cafe', '́', ' menu')) AS n").head()
    assert(r.getString(0) === "café menu")
  }

  test("parity UDFs callable from SQL") {
    val r = spark.sql(
      """SELECT standardize_parcel('1-X-1-1-1') AS parc,
        |       reformat_phone('412-636-8126') AS phone,
        |       redact_pii('John Doe was here') AS red""".stripMargin).head()
    assert(r.getString(0) === "0001X00001000101")
    assert(r.getString(1) === "+1 (412) 636-8126")
    assert(r.getString(2) === "[PERSON_NAME] was here")
  }

  test("wrong-arity calls raise a proper analysis error, not a " +
    "builder NoSuchElementException / silent arg truncation (ADVICE r7)") {
    graft.GraftExtensions.install(spark)
    for (bad <- Seq(
        "SELECT nfc_normalize()",
        "SELECT nfc_normalize('a', 'b')",
        "SELECT cosine_sim(array(1.0))",
        "SELECT hash_bucket()")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad))
      assert(e.getMessage.toLowerCase.contains("requires"),
        s"expected a WRONG_NUM_ARGS analysis error for: $bad, got: ${e.getMessage}")
    }
  }

  test("compression_ratio and wkt_point SQL functions registered") {
    graft.GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT compression_ratio('spam spam spam spam spam spam spam spam') AS cr, " +
      "wkt_point(-79.9959, 40.4406) AS pt, wkt_point(NULL, 1.0) AS np").head()
    assert(r.getDouble(0) > 0 && r.getDouble(0) < 1.0)
    assert(r.getString(1) === "POINT(-79.995900 40.440600)")
    assert(r.isNullAt(2))
  }
}
