package graft

import graft.operators.SplitOps
import org.apache.spark.sql.functions._

class SplitOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    spark.range(n.toLong).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 3).cast("string")).as("src"))

  test("stratifiedSample: deterministic, per-group rates honored, " +
    "missing group dropped, repartition-invariant") {
    val df = docs(3000)
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val kept = SplitOps.stratifiedSample(df, "doc_id", "src", rates)
    val byGroup = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(byGroup("src0") === 1000L, "rate 1.0 keeps every row")
    assert(byGroup("src1") > 350 && byGroup("src1") < 650,
      s"rate 0.5 keeps ~half, got ${byGroup("src1")}")
    assert(!byGroup.contains("src2"), "group absent from rates is dropped")
    // pure function of the key: same ids regardless of partitioning
    val again = SplitOps.stratifiedSample(df.repartition(7), "doc_id", "src", rates)
      .select("doc_id").as[Long].collect().sorted
    assert(again.toSeq === kept.select("doc_id").as[Long].collect().sorted.toSeq)
    // salt decorrelates: a different salt selects a different subset
    val salted = SplitOps.stratifiedSample(df, "doc_id", "src", rates, salt = "other")
      .select("doc_id").as[Long].collect().sorted
    assert(salted.toSeq !== again.toSeq)
  }

  test("temperatureMix: T=1 keeps the natural mix untouched; T=0 " +
    "equalizes groups to the smallest; T=0.5 flattens in between") {
    // skewed sources: 1200 / 600 / 200
    val df = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") < 1200, "big").when(col("id") < 1800, "mid")
        .otherwise("small").as("src"))
    val t1 = SplitOps.temperatureMix(df, "doc_id", "src", temperature = 1.0)
    assert(t1.count() === 2000L, "T=1 is the identity mix (no downsampling)")

    val t0 = SplitOps.temperatureMix(df, "doc_id", "src", temperature = 0.0)
    val c0 = t0.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(c0("small") === 200L, "smallest group fully kept")
    // hash sampling is Bernoulli per row: expected 200 each, allow slack
    assert(c0("big") > 140 && c0("big") < 260, s"big equalized, got ${c0("big")}")
    assert(c0("mid") > 140 && c0("mid") < 260, s"mid equalized, got ${c0("mid")}")

    val t5 = SplitOps.temperatureMix(df, "doc_id", "src", temperature = 0.5)
    val c5 = t5.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(c5("small") === 200L, "largest feasible mix keeps the smallest group whole")
    // flattened but still ordered: big > mid > small shares shrink toward sqrt
    assert(c5("big") > c5("mid") && c5("mid") > c5("small"))
    assert(c5("big") < 1200L, "big is downsampled at T=0.5")
  }

  test("temperatureMixByTokens: equal doc counts but skewed token mass — " +
    "T=0 equalizes TOKEN totals via lower doc rates for the long-doc group") {
    // group A: 100 docs x 10 tokens (1000 tokens); B: 100 docs x 1 token
    val df = spark.range(200).select(col("id").as("doc_id"),
      when(col("id") < 100, "A").otherwise("B").as("src"),
      when(col("id") < 100, lit((1 to 10).map(i => s"t$i").mkString(" ")))
        .otherwise(lit("solo")).as("text"))
    val out = SplitOps.temperatureMixByTokens(df, "doc_id", "src", "text",
      temperature = 0.0)
    val kept = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // feasible total = 200 tokens at equal shares: B (100 tokens) fully
    // kept, A targets 100/1000 tokens => doc rate 0.1 (Bernoulli slack)
    assert(kept("B") === 100L, "short-doc group fully kept")
    assert(kept("A") >= 3 && kept("A") <= 20, s"long-doc group ~10 docs, got ${kept("A")}")
    // doc-count mixing would have kept both groups whole (equal counts)
    assert(SplitOps.temperatureMix(df, "doc_id", "src", 0.0).count() === 200L)
  }

  test("temperatureMix edge cases: NULL groups excluded without crashing, " +
    "empty input yields empty output, all-NULL-text group drops cleanly") {
    val withNulls = spark.range(100).select(col("id").as("doc_id"),
      when(col("id") < 50, "a").otherwise(lit(null)).as("src"))
    val kept = SplitOps.temperatureMix(withNulls, "doc_id", "src", 1.0)
    assert(kept.count() === 50L, "NULL-group rows excluded, 'a' fully kept")

    val empty = spark.range(0).select(col("id").as("doc_id"), lit("a").as("src"))
    assert(SplitOps.temperatureMix(empty, "doc_id", "src", 0.5).count() === 0L)

    // one group has only NULL text: zero token mass, dropped; the
    // other keeps everything at T=1
    val txt = spark.range(20).select(col("id").as("doc_id"),
      when(col("id") < 10, "live").otherwise("dead").as("src"),
      when(col("id") < 10, "some words here").otherwise(lit(null)).as("text"))
    val mixed = SplitOps.temperatureMixByTokens(txt, "doc_id", "src", "text", 1.0)
    val bySrc = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc === Map("live" -> 10L))
  }

  test("assignSplit: NULL keys get a NULL split, never silently the last bucket") {
    val df = Seq(Some("k1"), Some("k2"), None).toDF("key")
    val out = SplitOps.assignSplit(df, "key").collect()
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1), "null key -> null split")
    assert(out.filterNot(_.isNullAt(0)).forall(!_.isNullAt(1)))
  }

  test("sampleKPerGroup: exactly min(k, |group|) rows per group, equals the " +
    "naive per-group hash-order window, invariant under repartition") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = SplitOps.sampleKPerGroup(docs, "doc_id", "lang", k = 7)
    val sizes = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val groupSizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.keySet === groupSizes.keySet)
    sizes.foreach { case (g, n) =>
      assert(n === math.min(7L, groupSizes(g)), s"group $g: got $n")
    }
    // equivalence to the naive window (correct but hot-partitioned)
    val naive = docs.select(col("lang"), col("doc_id"),
        SplitOps.hashBucket(concat(col("doc_id").cast("string"), lit("|holdout")))
          .as("__h"))
      .withColumn("sample_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("__h").desc, col("doc_id").asc)))
      .filter(col("sample_rank") <= 7)
      .select("lang", "sample_rank", "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2))).toSet
    assert(rows(out) === rows(naive))
    // pure function of (key, salt): any partitioning gives the same sample
    assert(rows(SplitOps.sampleKPerGroup(
      docs.repartition(17), "doc_id", "lang", k = 7)) === rows(out))
  }

  test("sampleKPerGroup: NULL keys are excluded from the sample, not " +
    "crashed on (r8 review: the heap encoder rejects NULL ids)") {
    val df = Seq((Some(1L), "g"), (Some(2L), "g"), (None, "g"))
      .toDF("doc_id", "lang")
    val out = SplitOps.sampleKPerGroup(df, "doc_id", "lang", k = 5)
    assert(out.count() === 2)
    assert(out.filter(col("doc_id").isNull).count() === 0)
  }

  test("shufflePositions: dense 1..N, equals the naive global hash-order " +
    "window, different salt = independent order, repartition-invariant") {
    val docs = Tables.documents(spark, sf("sf0.001")).select("doc_id")
    def posMap(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val out = posMap(SplitOps.shufflePositions(docs, "doc_id"))
    val n = docs.count()
    assert(out.values.toSeq.sorted === (1L to n).toSeq, "dense 1..N")
    val naive = docs.select(col("doc_id"),
        SplitOps.hashBucket(concat(col("doc_id").cast("string"), lit("|shuffle")))
          .as("__h"))
      .withColumn("shuffle_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__h").asc, col("doc_id").asc)).cast("long"))
    assert(out === posMap(naive))
    assert(posMap(SplitOps.shufflePositions(
      docs.repartition(13), "doc_id")) === out, "layout-invariant")
    val epoch2 = posMap(SplitOps.shufflePositions(docs, "doc_id", salt = "epoch2"))
    assert(epoch2 !== out, "a different salt must reshuffle")
    assert(epoch2.values.toSeq.sorted === (1L to n).toSeq)
  }

  // independent recomputation of the repeatSample copy count: JDK md5
  // of "<key>|<salt>", first 8 hex chars as a uint32 fraction
  private def expectedCopies(key: Long, rate: Double, salt: String = "mix"): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$key|$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val frac = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    math.floor(rate).toInt + (if (frac < rate - math.floor(rate)) 1 else 0)
  }

  test("repeatSample: copies == floor(rate) + fractional-hash extra " +
    "(JDK-md5 recomputation), copy_id dense from 0, rate-0 and " +
    "NULL-key rows dropped, layout-invariant") {
    val docs = ((1L to 60L).map { i =>
      (Some(i), if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")
    } :+ ((None: Option[Long]), "a"))
      .toDF("doc_id", "grp")
    val rates = Map("a" -> 2.5, "b" -> 0.4)
    val out = SplitOps.repeatSample(docs, "doc_id", "grp", rates)
      .select("doc_id", "grp", "copy_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = out.groupBy(_._1)
    // every emitted doc's copy_ids are exactly 0..copies-1, and the
    // copy count matches the independent md5 recomputation
    (1L to 60L).foreach { i =>
      val g = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"
      val exp = rates.get(g).map(expectedCopies(i, _)).getOrElse(0)
      val got = byDoc.getOrElse(i, Array.empty)
      assert(got.length === exp, s"doc $i group $g")
      assert(got.map(_._3).sorted.toSeq === (0 until exp).toSeq)
    }
    // group a must show BOTH 2-copy and 3-copy docs (frac 0.5)
    val aCounts = (1L to 60L).filter(_ % 3 == 0)
      .map(i => byDoc.getOrElse(i, Array.empty).length).toSet
    assert(aCounts === Set(2, 3), s"got $aCounts")
    // layout-invariance
    val re = SplitOps.repeatSample(docs.repartition(7), "doc_id", "grp", rates)
      .select("doc_id", "grp", "copy_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(re.sorted.toSeq === out.sorted.toSeq)
  }

  test("temperatureMixUpsampled: T=1 is an exact identity (every row " +
    "once, copy_id 0); T=0.5 on a skewed mix upsamples the small " +
    "group above 1x while the big group downsamples, expected total ~ N") {
    val docs = (1L to 1000L).map { i =>
      (i, if (i % 10 == 0) "small" else "big")  // 100 vs 900
    }.toDF("doc_id", "lang")
    val t1 = SplitOps.temperatureMixUpsampled(docs, "doc_id", "lang", 1.0)
    assert(t1.count() === 1000L)
    assert(t1.select("copy_id").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))

    val t05 = SplitOps.temperatureMixUpsampled(docs, "doc_id", "lang", 0.5)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val bySmall = t05.count(_._2 == "small")
    val byBig = t05.count(_._2 == "big")
    // T=0.5 weights: w_small = sqrt(0.1), w_big = sqrt(0.9);
    // r_small = 1000*(w_s/Σw)/100 = 2.5 -> every small doc >= 2 copies
    assert(bySmall >= 200 && bySmall <= 300, s"small=$bySmall")
    assert(byBig < 900, s"big must downsample, got $byBig")
    // expected totals: small 250, big 750 at the exact 6-decimal rates
    assert(math.abs(bySmall + byBig - 1000) < 60,
      s"total should stay near N: ${bySmall + byBig}")
  }

  test("weightedSampleK: keys match a JDK recomputation of u^(1/w), " +
    "heavier rows dominate the sample, zero/NULL weights and NULL " +
    "keys excluded, layout-invariant") {
    def esKey(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id|wsample".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.substring(0, 8), 16) + 1.0) / 4294967296.0
      math.pow(u, 1.0 / w)
    }
    // ids 1-50 weight 100, ids 51-100 weight 1; two invalid rows
    val rows = (1L to 50L).map(i => (i, 100.0)) ++
      (51L to 100L).map(i => (i, 1.0)) :+ (200L, 0.0)
    val df = rows.toDF("id", "w")
      .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) AS id, 5.0 AS w"))
      .repartition(7)
    val out = SplitOps.weightedSampleK(df, "id", "w", k = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 20)
    // exact agreement with the independent ranking
    val expected = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, esKey(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(20)
    assert(out.map(_._2).toSeq === expected.map(_._1))
    out.zip(expected).foreach { case ((_, _, got), (_, k)) =>
      assert(math.abs(got -
        BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // weight-100 rows must dominate a k=20 sample of this mix
    assert(out.count(_._2 <= 50L) >= 15,
      s"heavy rows underrepresented: $out")
    assert(!out.exists(_._2 === 200L), "zero-weight row must be excluded")
  }

  test("kFoldReport: deterministic md5 folds, exact marginals, " +
    "chi-square contributions match an independent double recompute, " +
    "NULL keys excluded / NULL labels kept as their own class") {
    def foldOf(id: Long, k: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % k).toInt
    }
    val rows = (1L to 300L).map(i =>
      (i, if (i % 7 == 0) null else s"lab${i % 3}"))
    val df = rows.toDF("id", "lab")
      .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) id, 'labX' lab"))
    val out = SplitOps.kFoldReport(df, "id", "lab", k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(!out.keySet.exists(_._2 == "labX"), "NULL key must be excluded")
    // independent recompute
    val truth = rows.groupBy { case (id, lab) =>
      (foldOf(id, 4), if (lab == null) "__null__" else lab) }
      .map { case (k, v) => k -> v.size.toLong }
    assert(out.keySet === truth.keySet)
    val foldN = truth.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val labN = truth.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    val bigN = 300.0
    out.foreach { case ((f, l), (n, fn, ln, exp, chi)) =>
      assert(n === truth((f, l)) && fn === foldN(f) && ln === labN(l))
      val e = fn * ln / bigN
      assert(math.abs(exp - BigDecimal(e).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      val c = (n * bigN - fn.toDouble * ln) * (n * bigN - fn.toDouble * ln) /
        (bigN * fn * ln)
      assert(math.abs(chi - BigDecimal(c).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("negativeSampleK: reproducible md5 draws, same-group and self " +
    "excluded, ranking matches an independent recompute") {
    def draw(a: Long, c: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$a|$c|neg".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val corpus = (1L to 100L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val anchors = corpus.filter($"id" % 25 === 0) // ids 25,50,75,100
    val out = SplitOps.negativeSampleK(anchors, corpus, "id", "grp", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 4 * 5)
    val byAnchor = out.groupBy(_._1)
    for (a <- Seq(25L, 50L, 75L, 100L)) {
      val got = byAnchor(a).sortBy(_._2).map(x => (x._3, x._4))
      val want = (1L to 100L)
        .filter(c => c != a && (c % 4) != (a % 4))
        .map(c => (c, draw(a, c))).sortBy { case (c, d) => (d, c) }.take(5)
      assert(got.toSeq === want, s"anchor $a")
      assert(got.forall { case (c, _) => c % 4 != a % 4 },
        "same-group candidate leaked in as a negative")
    }
  }

  test("neymanSample: a zero-variance stratum draws nothing, the " +
    "varying stratum takes the whole budget at min(1, S/N)") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, "const", 5.0)) ++
      (11L to 20L).map(i => (i, "vary", i.toDouble))
    val out = SplitOps.neymanSample(rows.toDF("id", "grp", "v"),
      "id", "grp", "v", totalSample = 5L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("sigma"), r.getAs[Double]("rate"),
          r.getLong(4))).toMap
    assert(out("const")._2 === 0.0)
    assert(out("const")._3 === 0.0)
    assert(out("const")._4 === 0L)
    // all weight on "vary": rate = min(1, 5·w/(w·10)) = 0.5
    assert(out("vary")._3 === 0.5)
    assert(out("vary")._4 <= 10L)
    // full budget beyond N clamps at rate 1 and samples everything
    val all = SplitOps.neymanSample(rows.toDF("id", "grp", "v"),
      "id", "grp", "v", totalSample = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(all("vary") === 10L)
  }
}
