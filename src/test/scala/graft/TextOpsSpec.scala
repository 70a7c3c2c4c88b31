package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: leading/trailing tabs and newlines strip cleanly — no " +
    "spurious empty first token (Spark's trim is space-only)") {
    val rows = Seq("\tfoo bar", "foo bar\n", "\t", "  x  ", "", "a\n\nb")
      .toDF("t")
      .select(TextOps.tokens(col("t")).as("toks"),
        TextOps.tokenCount(col("t")).as("n"))
      .collect()
    assert(rows(0).getSeq[String](0) === Seq("foo", "bar") && rows(0).getInt(1) === 2)
    assert(rows(1).getSeq[String](0) === Seq("foo", "bar"))
    assert(rows(2).getSeq[String](0) === Seq.empty && rows(2).getInt(1) === 0)
    assert(rows(3).getSeq[String](0) === Seq("x"))
    assert(rows(4).getSeq[String](0) === Seq.empty)
    assert(rows(5).getSeq[String](0) === Seq("a", "b"))
  }

  test("mean_token_len is the true mean (sum of non-whitespace chars / " +
    "tokens), robust to whitespace runs and padding") {
    val out = Seq((1L, " ab cd "), (2L, "a  b"), (3L, "abc"))
      .toDF("doc_id", "text")
    val m = TextOps.qualitySignals(out)
      .select("doc_id", "mean_token_len")
      .as[(Long, Double)].collect().toMap
    assert(m(1L) === 2.0, "padded two 2-char tokens")
    assert(m(2L) === 1.0, "double space between 1-char tokens")
    assert(m(3L) === 3.0)
  }

  test("langId: zero stopword hits in every language predicts 'und', " +
    "not the alphabetically-last code") {
    val out = TextOps.langId(Seq((1L, "xyzzy plugh qwerty"), (2L, ""),
        (3L, "the cat and the hat")).toDF("doc_id", "text"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) === "und" && out(2L) === "und")
    assert(out(3L) === "en")
  }

  test("tfidfTopTerms: hand-computed sklearn-smoothed scores; equal scores " +
    "tie-break on term asc; punctuation normalized away") {
    // N = 3; df: apple 1, banana 2, cherry 2, date 1
    // idf(df=1) = ln(4/2)+1, idf(df=2) = ln(4/3)+1
    val docs = Seq(
      (1L, "Apple banana, apple!"),
      (2L, "banana cherry"),
      (3L, "cherry date date date")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idf1 = math.log(4.0 / 2.0) + 1
    val idf2 = math.log(4.0 / 3.0) + 1
    assert(out.toSeq === Seq(
      (1L, 1, "apple", r6(2 * idf1)),
      (1L, 2, "banana", r6(idf2)),
      (2L, 1, "banana", r6(idf2)), // tied with cherry -> term asc wins
      (2L, 2, "cherry", r6(idf2)),
      (3L, 1, "date", r6(3 * idf1)),
      (3L, 2, "cherry", r6(idf2))))
  }

  test("topNgrams: multiplicity counted, casing folds, k-th-slot ties " +
    "break on gram asc, and the plan is TakeOrderedAndProject — " +
    "no global sort of the gram table") {
    // bigrams: 'a b' x3 (one via 'A B'), 'b a' x2, 'b c' x2,
    // 'c a' x1, 'c d' x1 — k=3 cuts inside the 2-count tie, and
    // 'b a' < 'b c' decides the last slot
    val docs = Seq(
      (1L, "a b a b c"),     // a b, b a, a b... wait recompute below
      (2L, "A B c a"),
      (3L, "b c d")).toDF("doc_id", "text")
    val out = TextOps.topNgrams(docs, "text", n = 2, k = 3)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // doc1: a b, b a, a b, b c ; doc2: a b, b c, c a ; doc3: b c, c d
    // counts: 'a b'=3, 'b c'=3, 'b a'=1, 'c a'=1, 'c d'=1
    // k=3: top two at 3, then the 1-count tie breaks on 'b a'
    assert(got === Seq(("a b", 3L), ("b c", 3L), ("b a", 1L)))
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject, got:\n$plan")
  }

  test("pmiCollocations: hand-computed scores, minCount suppresses the " +
    "hapax pathology, and mathematical ties rank lexicographically") {
    // corpus: 'x y' always adjacent (PMI high); 'a b'/'b a' adjacent
    // among frequent a/b (lower PMI, mathematically TIED with each
    // other); 'q z' appears once (killed by minCount)
    val docs = Seq(
      (1L, "x y a b"),
      (2L, "x y b a"),
      (3L, "a b a q z a")).toDF("doc_id", "text")
    // unigrams: x=2 y=2 a=5 b=3 q=1 z=1 → n1=14
    // bigrams per doc: (x y, y a, a b), (x y, y b, b a),
    //   (a b, b a, a q, q z, z a) → x y=2, a b=2, b a=2, five 1s → n12=11
    val out = TextOps.pmiCollocations(docs, "text", k = 10, minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    def pmi(c12: Long, c1: Long, c2: Long): Double =
      BigDecimal(math.log(c12 / 11.0) - math.log(c1 / 14.0) - math.log(c2 / 14.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 'a b' (c1=5, c2=3) and 'b a' (c1=3, c2=5) compute the same value
    // through a different operand order — the 6-decimal rank plus
    // (w1, w2) tie-break must order them deterministically
    assert(out === Seq(
      ("x", "y", 2L, pmi(2, 2, 2)),
      ("a", "b", 2L, pmi(2, 5, 3)),
      ("b", "a", 2L, pmi(2, 3, 5))))
    // hapax suppression: nothing below minCount appears
    assert(out.forall(_._3 >= 2L))
  }

  test("ngramNovelty: unique-vs-shared gram fractions hand-counted; " +
    "within-doc repeats collapse (distinct shingles); short docs absent") {
    val docs = Seq(
      // doc1: grams {abc, bcd} — abc shared with doc2, bcd unique
      (1L, "a b c d"),
      // doc2: 'a b c a b c' → distinct grams {abc, bca, cab} — abc
      // shared, bca/cab unique (the repeat contributes nothing extra)
      (2L, "a b c a b c"),
      // doc3: fully disjoint {pqr}
      (3L, "p q r"),
      // doc4: too short — absent
      (4L, "x y")).toDF("doc_id", "text")
    val out = graft.text.TextOps.ngramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((3L, 2L, 0.666667)),
      3L -> ((1L, 1L, 1.0))))
    assert(!out.contains(4L))
  }

  test("tagTopics: per-topic match counts with case folding; docs with " +
    "no lexicon hits absent; overlapping keyword lists rejected") {
    val lex = Map("fruit" -> Seq("Apple", "banana"), "veg" -> Seq("kale"))
    val out = TextOps.tagTopics(Seq(
        (1L, "apple APPLE kale plum"),
        (2L, "banana"),
        (3L, "plum pear")).toDF("doc_id", "text"), "doc_id", "text", lex)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "fruit", 2L), (1L, "veg", 1L), (2L, "fruit", 1L)))
    val e = intercept[IllegalArgumentException] {
      TextOps.tagTopics(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        Map("a" -> Seq("dup"), "b" -> Seq("DUP")))
    }
    assert(e.getMessage.contains("dup"))
  }

  test("scriptSignals: codepoint counts per script, digit/none routing, " +
    "argmax ties break by the fixed priority order") {
    val out = TextOps.scriptSignals(Seq(
        (1L, "hello world 123"),
        (2L, "hello привет"),   // cyr 6 > latin 5
        (3L, "123 456"),        // digits only -> none
        (4L, "ab пр"),          // latin 2 == cyr 2 -> priority latin
        (5L, "你好 مرحبا"))      // arabic 5 > han 2
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getString(7))).toMap
    assert(out(1L) === ((13L, 10L, 0L, 0L, 0L, 3L, "latin")))
    assert(out(2L) === ((11L, 5L, 6L, 0L, 0L, 0L, "cyrillic")))
    assert(out(3L) === ((6L, 0L, 0L, 0L, 0L, 6L, "none")))
    assert(out(4L) === ((4L, 2L, 2L, 0L, 0L, 0L, "latin")))
    assert(out(5L) === ((7L, 0L, 0L, 2L, 5L, 0L, "arabic")))
  }

  test("vocabCoverage: integer ceil cut, tie run at the boundary cut by " +
    "token asc, full coverage keeps everything, empty corpus -> zeros") {
    // counts: a=5, b=3, c=3, d=1 -> total 12; coverage 1/2 -> needed 6
    // rank (count desc, tok asc): a(cum 5), b(8), c(11), d(12)
    // in-vocab iff cum-c < 6: a(0), b(5) in; c(8), d(11) out —
    // the b/c tie at count 3 is cut mid-run by the token order
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b c c d"))
      .toDF("doc_id", "text")
    val half = TextOps.vocabCoverage(docs, "text", 1L, 2L).head()
    assert((half.getLong(0), half.getLong(1), half.getLong(2)) === ((2L, 8L, 12L)))
    val full = TextOps.vocabCoverage(docs, "text", 1L, 1L).head()
    assert((full.getLong(0), full.getLong(1), full.getLong(2)) === ((4L, 12L, 12L)))
    val empty = TextOps.vocabCoverage(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), "text", 9L, 10L).head()
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2)) === ((0L, 0L, 0L)))
  }

  test("vocabCoverage plan: the count-ordered cumsum window carries the " +
    "log2-decade bucket key — no single-partition global window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(docs, "text", 9L, 10L)
    // localCheckpoint severs the plan; re-derive the unmaterialized
    // shape through a fresh call's pre-checkpoint logical plan instead
    val tokCounts = docs
      .select(explode(TextOps.tokens(lower(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val (bucketed, wi) = graft.operators.TwoLevelCumsum.withOffsets(
      tokCounts, (lit(63L) - floor(log2(col("c"))).cast("long")),
      col("c"), Seq(col("c").desc, col("tok").asc))
    val shaped = bucketed.withColumn("__cum",
      col("__off") + sum("__w").over(wi))
    val wins = shaped.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val partRefs = w.partitionSpec.flatMap(_.references.map(_.name))
      val orderRefs = w.orderSpec.flatMap(_.child.references.map(_.name))
      if (orderRefs.contains("c") && orderRefs.contains("tok"))
        assert(partRefs.contains("__b"),
          s"count-ordered window must partition by __b, got $partRefs")
    }
    assert(out.head().getLong(2) === 4L)
  }

  test("gopherRules: each rule fails on its own fixture, first-fail " +
    "reason follows the fixed order, edges trim with the \\s class") {
    import spark.implicits._
    val docs = Seq(
      // passes all seven rules (leading/trailing whitespace ignored)
      1L -> "  the cat sat with the dog  ",
      // too few words
      2L -> "hi there",
      // mean word length < 3 (fails before its stopword miss)
      3L -> "a b c d e",
      // 5 symbols for 8 words (also alpha-poor, but symbol fires first)
      4L -> "the tag # with # more ### stuff",
      // every line is a bullet: 10*3 > 9*3
      5L -> "- the firstitem\n- the seconditem\n- the thirditem",
      // 2 of 3 lines end in an ellipsis: 10*2 > 3*3 (21 words keep
      // the 2 ellipsis SYMBOLS under the symbol rule: 20 <= 21)
      6L -> ("the cat sat on the mat now…\nthe dog ran off with the bone…\n" +
        "the end was good for all fine"),
      // 4 alpha words of 9: 5*4 < 4*9
      7L -> "the num 111 222 333 444 555 with the",
      // zero stopword hits
      8L -> "cat dog bird fish goat lion",
      // empty: word_count fails, n_lines is 0 (not a [""] artifact)
      9L -> "").toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text",
      minWords = 3, maxWords = 30)
      .select("doc_id", "pass", "reject_reason", "n_words", "n_lines",
        "n_symbols", "n_bullet_lines", "n_ellipsis_lines")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out(1L) === ((true, None, 6L, 1L, 0L, 0L, 0L)))
    assert(out(2L)._1 === false && out(2L)._2 === Some("word_count"))
    assert(out(3L)._2 === Some("mean_word_length"))
    assert(out(4L)._2 === Some("symbol_ratio") && out(4L)._5 === 5L)
    assert(out(5L)._2 === Some("bullet_lines") && out(5L)._6 === 3L)
    assert(out(6L)._2 === Some("ellipsis_lines") &&
      out(6L)._3 === 21L && out(6L)._5 === 2L && out(6L)._7 === 2L)
    assert(out(7L)._2 === Some("alpha_words"))
    assert(out(8L)._2 === Some("stopword_hits"))
    assert(out(9L)._2 === Some("word_count") && out(9L)._4 === 0L)
  }

  test("repetitionRules: duplicate n-gram fractions hand-counted, " +
    "thresholds decide by integer rationals, short/empty docs are zeros") {
    import spark.implicits._
    val docs = Seq(
      // "a b a b a": 2-grams (a b)(b a)(a b)(b a) -> 4 total 2 distinct
      // dup 0.5 > 0.2 FAIL; 3-grams (a b a)(b a b)(a b a) -> 3/2 dup
      // 1/3 > 0.18 FAIL; 4-grams (a b a b)(b a b a) -> 2/2 dup 0 pass
      (1L, "a b a b a"),
      // all distinct everywhere
      (2L, "one two three four five"),
      // boundary: 5 2-grams, 1 duplicate -> dup = 0.2 exactly, 5*1 <= 5 PASS
      (3L, "x y z w x y"),
      (4L, "solo"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextOps.repetitionRules(docs, "doc_id", "text")
      .select("doc_id", "total_2grams", "distinct_2grams", "dup_frac_2",
        "r_dup_2grams", "r_dup_3grams", "r_dup_4grams", "rep_pass")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(out(1L) === ((4L, 2L, 0.5, false, false, true, false)))
    assert(out(2L) === ((4L, 4L, 0.0, true, true, true, true)))
    // "x y z w x y": 2-grams (x y)(y z)(z w)(w x)(x y) = 5 total 4
    // distinct — exactly at the 0.2 boundary, inclusive rule passes
    assert(out(3L) === ((5L, 4L, 0.2, true, true, true, true)))
    assert(out(4L) === ((0L, 0L, 0.0, true, true, true, true)))
    assert(out(5L) === ((0L, 0L, 0.0, true, true, true, true)))
  }

  test("bm25Search: hand-computed scores, rare-term idf dominance, " +
    "non-matching docs absent, top-k plans as TakeOrderedAndProject") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark table join"),
      (2L, "table table table scan"),
      (3L, "stream filter map"),
      (4L, "other words here")).toDF("doc_id", "text")
    val out = TextOps.bm25Search(docs, "doc_id", "text",
      queryTerms = Seq("table", "stream"), k = 3)
    // independent recomputation of the formula
    val n = 4.0; val avgdl = (3 + 4 + 3 + 3).toDouble / 4
    def idf(df: Int) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def contrib(tf: Long, df: Int, dl: Long) =
      idf(df) * (tf * (1.2 + 1)) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Map(
      1L -> r6(contrib(1, 2, 3)), // table, df=2
      2L -> r6(contrib(3, 2, 4)),
      3L -> r6(contrib(1, 1, 3))) // stream, df=1 — higher idf
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet === Set(1L, 2L, 3L)) // doc 4 absent
    rows.foreach { case (id, _, score) =>
      assert(math.abs(score - expect(id)) < 1e-9, s"doc $id: $score vs ${expect(id)}")
    }
    // scores are non-increasing along the rank order
    val byRank = rows.sortBy(_._2).map(_._3)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    // the global top-k must be bounded-heap, not a global sort
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "bm25 top-k should plan as TakeOrderedAndProject")
  }

  test("tokenDistributionDrift: identical slices diverge by zero; a " +
    "mirrored skew gives the closed-form symmetric KL") {
    import spark.implicits._
    val a = Seq("x x x y").toDF("text")
    val b = Seq("x y y Y").toDF("text") // lowercased: y y y
    val same = TextOps.tokenDistributionDrift(a, a, "text").collect()(0)
    assert(same.getAs[Long]("vocab_size") === 2L)
    assert(same.getAs[Double]("kl_ab") === 0.0)
    assert(same.getAs[Double]("js_div") === 0.0)
    val r = TextOps.tokenDistributionDrift(a, b, "text").collect()(0)
    assert(r.getAs[Long]("n_a") === 4L)
    assert(r.getAs[Long]("n_b") === 4L)
    // smoothed: p=(2/3,1/3), q=(1/3,2/3) -> KL both ways = ln(2)/3
    val kl = BigDecimal(math.log(2) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("kl_ab") === kl)
    assert(r.getAs[Double]("kl_ba") === kl)
    assert(r.getAs[Double]("js_div") === 0.0566)
  }

  test("tokenDistributionDrift: a term unseen on one side keeps the " +
    "divergences finite via union-vocab smoothing") {
    import spark.implicits._
    val a = Seq("only here").toDF("text")
    val b = Seq("different words entirely").toDF("text")
    val r = TextOps.tokenDistributionDrift(a, b, "text").collect()(0)
    assert(r.getAs[Long]("vocab_size") === 5L)
    assert(!r.getAs[Double]("kl_ab").isInfinite)
    assert(!r.getAs[Double]("kl_ba").isInfinite)
    assert(r.getAs[Double]("js_div") > 0.0)
  }

  test("rakeKeywords: hand-computed deg/freq scores on the classic " +
    "shape — co-occurring multi-word phrases outrank short ones; " +
    "duplicate words in a phrase count per occurrence; punctuation " +
    "and stopwords both delimit") {
    import spark.implicits._
    // phrases after splitting on '.'/',' and the stopword 'and':
    //   [deep learning models] [deep learning wins] [models win]
    // freq: deep 2, learning 2, models 2, wins 1, win 1
    // deg:  deep 6, learning 6, models 5, wins 3, win 2
    // scores: d-l-w 9.0, d-l-m 8.5, m-w 4.5
    val docs = Seq(
      (1L, "Deep learning models. Deep learning wins, and models win"))
      .toDF("doc_id", "text")
    val out = TextOps.rakeKeywords(docs, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("deep learning wins", 1L, 9.0),
      ("deep learning models", 1L, 8.5),
      ("models win", 1L, 4.5)))
    // duplicate word inside one phrase: each occurrence counts in
    // freq AND contributes the phrase length to deg
    val dup = Seq((1L, "big big data")).toDF("doc_id", "text")
    val d = TextOps.rakeKeywords(dup, "doc_id", "text", topK = 5)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    // freq(big)=2, deg(big)=6 -> ratio 3; data: 3/1 -> score 3+3+3
    assert(d.toSeq === Seq(("big big data", 9.0)))
  }

  /** Brute-force winnowing reference (Schleimer 2003): same md5-prefix
    * hash, explicit rightmost-min scan per window. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val grams = toks.sliding(k).map(_.mkString(" ")).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val hs = grams.map(h)
    val starts =
      if (grams.length < w) Seq(0)
      else 0 to (grams.length - w)
    starts.map { j =>
      val end = math.min(j + w, grams.length)
      // rightmost minimum
      var best = j
      (j until end).foreach(i => if (hs(i) <= hs(best)) best = i)
      (best.toLong, hs(best))
    }.toSet
  }

  test("winnowFingerprints: equals the brute-force reference on mixed " +
    "docs; the w+k-1 shared-run guarantee holds; repeated-token ties " +
    "select the RIGHTMOST min; short docs yield their global min") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"one two three four five $shared six seven"),
      (3L, "a a a a a a a"),          // all grams identical -> ties
      (4L, "just three tokens here"), // 2 grams < w -> global min
      (5L, "x y"),                    // fewer than k tokens -> empty
      (6L, "   "),                    // whitespace-only -> empty
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = Map(
      1L -> s"alpha beta gamma $shared delta epsilon zeta",
      2L -> s"one two three four five $shared six seven",
      3L -> "a a a a a a a", 4L -> "just three tokens here")
    texts.foreach { case (id, t) =>
      assert(out(id) === winnowRef(t, 3, 4), s"doc $id")
    }
    assert(!out.contains(5L) && !out.contains(6L) && !out.contains(7L))
    // guarantee: the 10-token shared run (>= w+k-1 = 6) forces a
    // common fingerprint HASH between docs 1 and 2
    val h1 = out(1L).map(_._2); val h2 = out(2L).map(_._2)
    assert(h1.intersect(h2).nonEmpty)
    // all-equal hashes: every window's rightmost element is selected,
    // so positions are exactly {w-1 .. G-1}
    val g3 = 7 - 3 + 1
    assert(out(3L).map(_._1) === (3L until g3.toLong).toSet)
    // short doc: exactly one fingerprint, its global min
    assert(out(4L).size === 1)
  }

  test("readabilityReport: hand-computed Flesch scores; empty docs " +
    "count as zero-word rows, not divisions") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a", "The cat sat. It ran!"), // 5 words, 2 sentences, 5 vowel groups
      ("en", "b", ""), // zero words -> contributes only to n_docs
      ("en", "b", "No terminal punctuation here")) // sentence floor = 1
      .toDF("lang", "source", "text")
    val out = graft.text.TextOps.readabilityReport(docs)
      .collect().map(r => r.getString(1) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_words") === 5L)
    assert(a.getAs[Long]("n_sentences") === 2L)
    assert(a.getAs[Long]("n_syllables") === 5L)
    // 206.835 - 1.015*(5/2) - 84.6*(5/5)
    assert(math.abs(a.getAs[Double]("flesch_ease") - 119.6975) < 1e-9)
    // 0.39*2.5 + 11.8*1 - 15.59
    assert(math.abs(a.getAs[Double]("fk_grade") - (-2.815)) < 1e-9)
    val b = out("b")
    assert(b.getAs[Long]("n_docs") === 2L)
    assert(b.getAs[Long]("n_words") === 4L)
    assert(b.getAs[Long]("n_sentences") === 1L) // floor kicks in
  }

  test("c4Rules: each flag fires on its own trigger and kept requires " +
    "all clear") {
    import spark.implicits._
    val docs = Seq(
      ("s", "Lorem ipsum dolor sit amet. More. Text."),
      ("s", "function f() { return 1; } One. Two. Three."),
      ("s", "We use cookies. See our cookie policy. Thanks."),
      ("s", "Too short."),
      ("s", "A fine document. It has sentences. Three of them."))
      .toDF("source", "text")
    val r = graft.text.TextOps.c4Rules(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_lorem") === 1L)
    assert(r.getAs[Long]("n_brace") === 1L)
    assert(r.getAs[Long]("n_policy") === 1L)
    assert(r.getAs[Long]("n_short") === 1L)
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[Double]("keep_rate") === 0.2)
  }

  test("crossSourceDuplicates: case/punct/space variants collide " +
    "through the q80 normalization, disjoint sources emit no pair") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "Hello, World!"), ("s1", "unique one"),
      ("s2", "hello   world"), ("s2", "other text"),
      ("s3", "no match")).toDF("source", "text")
    val out = graft.text.TextOps.crossSourceDuplicates(docs).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getString(0), r.getString(1)) === (("s1", "s2")))
    assert(r.getLong(2) === 1L)
    assert(r.getAs[Double]("digest_jaccard") === 0.333333)
  }

  test("encodingArtifacts: each artifact family counts its own " +
    "fixture, multi-char patterns count per occurrence, clean text " +
    "is clean") {
    import spark.implicits._
    val docs = Seq(
      ("s", "perfectly clean ascii text"),
      ("s", "cafÃ© and naÃ¯ve"), // two Ã artifacts
      ("s", "smart â dash â twice"),
      ("s", "lost char � here � and �"),
      ("s", "binarybleedthrough"))
      .toDF("source", "text")
    val r = graft.text.TextOps.encodingArtifacts(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_replacement") === 1L)
    assert(r.getAs[Long]("n_c1") === 1L) // the round-tripped dashes
    assert(r.getAs[Long]("n_latin1") === 1L) // cafÃ©/naÃ¯ve doc
    assert(r.getAs[Long]("n_control") === 1L)
    // 3 (replacement) + 4 (C1 bytes in the two dashes) + 2 (Ã) + 2 (C0)
    assert(r.getAs[Long]("total_artifacts") === 11L)
    assert(r.getAs[Long]("n_clean") === 1L)
    assert(r.getAs[Long]("clean_rate_ppm") === 200000L)
  }

  test("sourceDivergenceMatrix: identical distributions give js 0, " +
    "disjoint vocabularies give exactly ln 2") {
    import spark.implicits._
    val docs = Seq(
      ("A", "x y"), ("A", "x y"),
      ("B", "x y"),
      ("C", "z w z w")).toDF("source", "text")
    val out = graft.text.TextOps.sourceDivergenceMatrix(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("js"))).toMap
    assert(out(("A", "B")) === ((2L, 0.0)))
    val ln2 = math.rint(math.log(2.0) * 1e4) / 1e4
    assert(out(("A", "C")) === ((4L, ln2)))
    assert(out(("B", "C")) === ((4L, ln2)))
  }

  test("llrCollocations: matches an independent G² computation on " +
    "hand-counted bigrams, zero cells contribute zero, minCount " +
    "filters, G² is non-negative") {
    import spark.implicits._
    val docs = (Seq.fill(6)("new york") ++ Seq.fill(2)("new day") ++
      Seq("old york")).toDF("text")
    // bigram table: (new,york)=6 (new,day)=2 (old,york)=1, N=9
    def llrRef(k11: Long, r1: Long, c1: Long, n: Long): Double = {
      val nD = n.toDouble
      def t(k: Long, row: Long, c: Long): Double =
        if (k == 0) 0.0
        else (k.toDouble / nD) * math.log(k.toDouble * nD / (row.toDouble * c.toDouble))
      val v = 2.0 * nD * ((t(k11, r1, c1) + t(r1 - k11, r1, n - c1)) +
        (t(c1 - k11, n - r1, c1) + t(n - r1 - c1 + k11, n - r1, n - c1)))
      math.rint(v * 1e4) / 1e4
    }
    val all = graft.text.TextOps.llrCollocations(docs, "text", k = 10,
      minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("llr"))).toMap
    assert(all.size === 3)
    assert(all(("new", "york"))._1 === 6L)
    assert(math.abs(all(("new", "york"))._2 - llrRef(6, 8, 7, 9)) < 1e-3)
    assert(math.abs(all(("new", "day"))._2 - llrRef(2, 8, 2, 9)) < 1e-3)
    assert(math.abs(all(("old", "york"))._2 - llrRef(1, 1, 7, 9)) < 1e-3)
    assert(all.values.forall(_._2 >= 0.0), "G² is a scaled KL divergence")
    // minCount 5 keeps only the 6-count pair
    val top = graft.text.TextOps.llrCollocations(docs, "text", k = 10,
      minCount = 5L).collect()
    assert(top.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("new", "york")))
  }

  test("textRankKeywords: a word bridging both corpus themes out-ranks " +
    "peripheral words; positions are dense from 1; single-token and " +
    "empty docs contribute no edges") {
    import spark.implicits._
    // "data" is adjacent to every other word -> highest centrality
    val docs = Seq(
      "big data systems",
      "data quality rules",
      "fast data",
      "solo", // too short for any pair
      " ", "").toDF("text")
    val out = graft.text.TextOps.textRankKeywords(docs, "text",
      iterations = 8, k = 3).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(out(0).getString(1) === "data")
    assert(out(0).getAs[Double]("rank_ppm") > out(1).getAs[Double]("rank_ppm"))
  }
}
