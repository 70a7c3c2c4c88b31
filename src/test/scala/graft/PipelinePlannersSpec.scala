package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-13 pipeline-planner queries (q316–q319)
  * on real sf0.001 data: the LSH band planner's S-curve monotonicity,
  * the token-balanced shard deal's balance guarantee, the disjoint
  * random-pairing diversity audit's accounting, and the bag-vs-seq
  * fingerprint ordering.
  */
class PipelinePlannersSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001")).collect()

  test("q316 band planner: 4 configs; expected catch is bounded by the " +
    "pair count on the e9 lattice and monotone DOWN in rows-per-band " +
    "(a stricter band catches less at fixed 128-hash budget)") {
    val rows = run("q316_lsh_band_planner")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.length === 4)
    assert(rows.map(t => t._1 * t._2).toSeq === Seq(128, 128, 128, 128))
    rows.foreach { case (r, b, nge, cg, nband, cb) =>
      assert(cg <= nge * 1000000000L + nge, s"r=$r caught > possible")
      assert(cb <= nband * 1000000000L + nband, s"r=$r band catch bound")
      assert(cg >= 0 && cb >= 0)
    }
    // same pair set for every config row
    assert(rows.map(_._3).distinct.length === 1)
    assert(rows.map(_._5).distinct.length === 1)
    // P = 1-(1-s^r)^b falls as r rises (s in [0,1), rb fixed)
    val catches = rows.map(_._4).toSeq
    assert(catches.sliding(2).forall(p => p(1) <= p.head),
      s"catch must fall with rows-per-band: $catches")
    val bandCatches = rows.map(_._6).toSeq
    assert(bandCatches.sliding(2).forall(p => p(1) <= p.head))
  }

  test("q317 token-balanced shards: all 8 shards, docs and tokens " +
    "conserved, and the boustrophedon deal keeps every shard within " +
    "one max-document of the even split") {
    val sfDir = sf("sf0.001")
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val nDocs = docs.count()
    val maxTc = docs
      .agg(max(graft.text.TextOps.tokenCount(col("text")).cast("long")))
      .head().getLong(0)
    val rows = run("q317_token_balanced_shards")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq === (0 until 8))
    assert(rows.map(_._2).sum === nDocs)
    val totals = rows.map(_._3)
    // LPT-snake balance: spread bounded by one largest document
    assert(totals.max - totals.min <= maxTc,
      s"spread ${totals.max - totals.min} > max doc $maxTc")
  }

  test("q318 pair diversity: pair count = floor(n/2), deciles in 0..9, " +
    "lattice sum bounded by n_pairs * 1e6") {
    val nDocs = Tables.documents(spark, sf("sf0.001"))
      .filter(col("text").isNotNull).count()
    val rows = run("q318_pair_diversity")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum === nDocs / 2)
    rows.foreach { case (dec, n, sumE6) =>
      assert(dec >= 0 && dec <= 9)
      assert(sumE6 >= 0 && sumE6 <= n * 1000000L)
      // a pair in decile d has jac >= d/10, so the mean obeys the floor
      assert(sumE6 >= n * (dec * 100000L) - n,
        s"decile $dec mean below its own floor")
    }
  }

  test("q319 bag fingerprints: bag-distinct <= seq-distinct <= docs per " +
    "source; the collapse gap is their difference; a hand-built " +
    "reordered duplicate collapses under bag but not seq") {
    val rows = run("q319_bag_fingerprint_dedup")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, seq, bag, gap) =>
      assert(bag <= seq, s"$src: bag fp cannot outnumber seq fp")
      assert(seq <= n, s"$src: seq fp cannot outnumber docs")
      assert(gap === seq - bag)
    }
    // unit fixture: a token permutation is a bag-dup, not a seq-dup
    import spark.implicits._
    val fixture = Seq(
      (1L, "s", "alpha beta gamma"),
      (2L, "s", "gamma beta alpha"), // permutation of doc 1
      (3L, "s", "alpha beta gamma"), // exact dup of doc 1
      (4L, "s", "alpha beta"))
      .toDF("doc_id", "source", "text")
    val tmp = tempDir("q319fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("q319_bag_fingerprint_dedup")(
        spark, tmp.toString).collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getLong(1) === 4L) // n_docs
      assert(r.getLong(2) === 3L) // seq: {abc, cba, ab}
      assert(r.getLong(3) === 2L) // bag: {a:1,b:1,g:1}, {a:1,b:1}
      assert(r.getLong(4) === 1L) // the permutation collapsed
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q320/q321 boilerplate removal: a shared 8-token header is " +
    "excised from every doc of its source, unique text survives " +
    "verbatim, accounting ties out, and the residual audit reads " +
    "zero after the fix") {
    import spark.implicits._
    val header = "one two three four five six seven eight"
    val fixture = Seq(
      (1L, "a", s"$header alpha beta gamma delta epsilon zeta"),
      (2L, "a", s"$header bravo charlie delta echo foxtrot golf"),
      (3L, "a", s"$header hotel india juliet kilo lima mike"),
      (4L, "b", "unique text here with no shared window at all ok"),
      (5L, "b", "another fully unique doc without any repeats here"))
      .toDF("doc_id", "source", "text")
    val tmp = tempDir("q320fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val cleaned = SparkEntry.queries("q320_boilerplate_removal")(
        spark, tmp.toString).collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      assert(cleaned.size === 5)
      // source a: df(header windows) = 3 >= max(2, ceil(3/10)) -> cut
      assert(cleaned(1L)._1 === "alpha beta gamma delta epsilon zeta")
      assert(cleaned(1L)._3 === 8L)
      assert(cleaned(2L)._3 === 8L && cleaned(3L)._3 === 8L)
      // source b: nothing shared, nothing touched
      assert(cleaned(4L) ===
        ("unique text here with no shared window at all ok", 10L, 0L))
      assert(cleaned(5L)._3 === 0L)
      cleaned.values.foreach { case (_, n, rm) =>
        assert(rm >= 0L && rm <= n)
      }
      val audit = SparkEntry.queries("q321_boilerplate_residual")(
        spark, tmp.toString).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(audit("a") === ((3L, 24L, 1L, 0L)))
      assert(audit("b") === ((2L, 0L, 0L, 0L)))
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q322 leave-one-out influence: dropping a source moves the " +
    "remaining mean AWAY from that source's own mean, and the exact " +
    "mixture identity ties the three means together") {
    val rows = run("q322_loo_source_influence")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length > 1)
    val globals = rows.map(_._4).distinct
    assert(globals.length === 1, "one global mean")
    rows.foreach { case (src, n, mean, g, loo, infl) =>
      assert(infl === loo - g, s"$src: influence definition")
      // above-average source -> corpus improves without it (and the
      // converse); integer-div truncation bounds the neutral band
      if (mean > g) assert(loo <= g, s"$src: dropping a worse source")
      if (mean < g) assert(loo >= g, s"$src: dropping a better source")
      // loo mean must sit on the opposite side of the source mean
      assert((loo - mean).sign * (g - mean).sign >= 0,
        s"$src: loo moved toward the dropped source")
    }
  }

  test("q323 shard manifests: 8 shards, totals conserved vs q317, and " +
    "the manifest digests are distinct (disjoint membership)") {
    val a = run("q317_token_balanced_shards")
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = run("q323_shard_manifest")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(m.length === 8)
    m.foreach { case (shard, n, tok, _) =>
      assert(a(shard) === ((n, tok)),
        s"shard $shard: manifest disagrees with q317's deal")
    }
    assert(m.map(_._4).distinct.length === 8, "digests must be distinct")
  }

  test("q324 LSH backtest: measured banded catch is bounded by the " +
    "candidate load and the true-pair count, and the two configs see " +
    "the same ground truth") {
    val rows = run("q324_lsh_backtest")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length === 2)
    assert(rows.map(_._3).distinct.length === 1, "same pair frame")
    rows.foreach { case (r, b, nTrue, exp, actual, cands) =>
      assert(r * b === 128)
      assert(actual <= nTrue, s"($r,$b): caught more than exist")
      assert(actual <= cands, s"($r,$b): caught pairs are candidates")
      assert(exp <= nTrue * 1000000000L + nTrue)
      // at these settings the S-curve predicts near-total catch of
      // jac >= 0.5 pairs; the realized sketch should not collapse
      assert(actual * 10 >= nTrue * 9,
        s"($r,$b): realized catch below 90% of truth")
    }
  }

  test("q325 curriculum order: bands are contiguous position ranges, " +
    "ordered easy-to-hard, and together cover 1..n exactly") {
    val rows = run("q325_curriculum_order")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0 until rows.length))
    rows.foreach { case (band, n, lo, hi, _) =>
      assert(hi - lo + 1 === n, s"band $band must be contiguous")
    }
    // bands tile 1..n with no gaps, in band order
    rows.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(1)._3 === w(0)._4 + 1,
        s"band ${w(1)._1} must start where ${w(0)._1} ends")
    }
    assert(rows.head._3 === 1L)
    // curriculum: later bands are harder (mean loss non-decreasing)
    val means = rows.map(_._5)
    assert(means.sliding(2).forall(p => p(1) >= p.head),
      s"band mean loss must be non-decreasing: $means")
  }

  test("q326 RBO: overlap-at-depth is non-decreasing and bounded by " +
    "the depth, and the truncated RBO respects the overlap bounds") {
    val r = run("q326_rbo_rank_agreement").head
    val a = (0 until 10).map(r.getLong)
    a.zipWithIndex.foreach { case (ad, i) =>
      assert(ad >= 0 && ad <= i + 1, s"overlap at ${i + 1} in [0, d]")
    }
    assert(a.sliding(2).forall(p => p(1) >= p.head),
      "overlap cannot shrink with depth")
    val rbo = r.getLong(10)
    assert(rbo >= 0 && rbo <= 1000000001L, "RBO in [0, 1] on the lattice")
    // exact identity: perfect agreement at every depth -> truncated
    // RBO = 0.1 * sum(0.9^(d-1)); all-zero overlap -> 0
    if (a.forall(_ == 0)) assert(rbo === 0L)
  }

  test("q327 scorer agreement: bands in 0..9, every doc accounted for " +
    "exactly once per axis (marginals are the decile sizes)") {
    val rows = run("q327_scorer_agreement")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val n = rows.map(_._3).sum
    assert(n > 0)
    rows.foreach { case (a, b, c) =>
      assert(a >= 0 && a <= 9 && b >= 0 && b <= 9 && c > 0)
    }
    // marginals: each axis's decile sizes partition n into 10 blocks
    // of floor/ceil(n/10) (the (rank-1)*10 div n banding)
    Seq(rows.groupBy(_._1), rows.groupBy(_._2)).foreach { m =>
      val sizes = m.view.mapValues(_.map(_._3).sum).toMap
      assert(sizes.values.sum === n)
      sizes.values.foreach(s =>
        assert(s === n / 10 || s === n / 10 + 1, s"decile size $s vs n=$n"))
    }
  }

  test("q328 eval dedup sample: a candidate duplicated in train is " +
    "train_near, a candidate duplicating an earlier candidate is " +
    "dup_earlier, clean candidates are kept — verdicts replay from " +
    "hand-picked hash-candidate ids") {
    import spark.implicits._
    // recover the 1-in-7 candidacy predicate for small ids
    val cand = (0L until 300L).toDF("doc_id")
      .withColumn("c", graft.operators.SplitOps.hashBucket(
        concat(col("doc_id").cast("string"), lit("|evalsamp"))) % 7 === 0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val candIds = (0L until 300L).filter(cand).toList
    val nonIds = (0L until 300L).filterNot(cand).toList
    assert(candIds.size >= 3 && nonIds.size >= 1)
    val Seq(ca, cb, cc) = candIds.sorted.take(3)
    val nc = nonIds.head
    val textX = "alpha beta gamma delta epsilon zeta eta theta iota"
    val textY = "one two three four five six seven eight nine ten"
    val uniq = "totally unrelated words nothing shared here at all ok"
    val fixture = Seq(
      (ca, textX), (cb, textX),       // two identical candidates
      (cc, textY), (nc, textY))       // candidate dup'd by train doc
      .map { case (i, t) => (i, "s", t) }
      .toDF("doc_id", "source", "text")
      .union(Seq((nonIds(1), "s", uniq)).toDF("doc_id", "source", "text"))
    val tmp = tempDir("q328fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("q328_eval_dedup_sample")(
        spark, tmp.toString).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet === Set(ca, cb, cc))
      assert(out(ca) === "kept", "earliest identical candidate stays")
      assert(out(cb) === "dup_earlier")
      assert(out(cc) === "train_near")
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q329 water-fill: alloc <= avail, budget respected, every " +
    "unsaturated source gets the same final share, and a tiny source " +
    "saturates with its surplus flowing to the others") {
    val rows = run("q329_token_waterfill")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val totalAvail = rows.map(_._2).sum
    val budget = totalAvail / 5
    rows.foreach { case (src, a, al, s) =>
      assert(al <= a, s"$src: alloc over inventory")
      if (s == 1) assert(al === a, s"$src: saturated means fully taken")
    }
    assert(rows.map(_._3).sum <= budget, "over-allocated")
    assert(budget - rows.map(_._3).sum < rows.length,
      "leftover must be below one token per source (div remainder)")
    val fairs = rows.filter(_._4 == 0).map(_._3).distinct
    assert(fairs.length <= 1, s"unsaturated shares must be equal: $fairs")
    // hand fixture: tiny source saturates, its surplus raises the fair
    import spark.implicits._
    val tiny = "a b c d e"                          // 5 tokens
    val big = Seq.fill(100)("tok").mkString(" ")    // 100 tokens/doc
    val fixture = (Seq((0L, "tiny", tiny)) ++
      (1L to 10L).map(i => (i, "big1", big)) ++
      (11L to 20L).map(i => (i, "big2", big)))
      .toDF("doc_id", "source", "text")
    val tmp = tempDir("q329fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("q329_token_waterfill")(
        spark, tmp.toString).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
      // total 2005, budget 401; round 1 fair 133 saturates tiny (5),
      // budget 396; round 2 fair 198 for both bigs
      assert(out("tiny") === ((5L, 5L, 1)))
      assert(out("big1") === ((1000L, 198L, 0)))
      assert(out("big2") === ((1000L, 198L, 0)))
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q337 filter ablation: marginal / only-failure / first-reason " +
    "attribution replayed from a hand-built rule matrix") {
    import spark.implicits._
    val fixture = Seq(
      // passes every rule: 20 words, 8 stopwords, mean len exactly 3
      (1L, "the be to of and that have with aaa bbb ccc ddd eee fff " +
        "ggg hhh iii jjj kkk lll"),
      // fails ONLY word_count (8 stopword tokens, mean len in range)
      (2L, "the be to of and that have with"),
      // fails word_count AND stopword_hits (first reason: word_count)
      (3L, "qqqq wwww eeee rrrr tttt"))
      .toDF("doc_id", "text")
    val tmp = tempDir("q337fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("q337_filter_ablation")(
        spark, tmp.toString).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toMap
      assert(out.size === 7)
      assert(out("word_count") === ((2L, 1L, 2L, 8L)),
        "both short docs fail; only doc 2 fails nothing else; " +
          "dropping the rule recovers doc 2's 8 tokens")
      assert(out("stopword_hits") === ((1L, 0L, 0L, 0L)),
        "doc 3 also fails word_count, so no marginal recovery here")
      (out.keySet - "word_count" - "stopword_hits").foreach { r =>
        assert(out(r) === ((0L, 0L, 0L, 0L)), s"rule $r should be clean")
      }
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q338 length-confound audit: deciles tile the corpus, mean " +
    "tokens are non-decreasing across length deciles, and the " +
    "Spearman is one value in [-1, 1] on every row") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .filter(col("text").isNotNull)
    val rows = run("q338_curriculum_length_confound")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0 until 10))
    // every KN-scored doc lands in exactly one decile; floor/ceil
    // decile sizes
    val n = rows.map(_._2).sum
    assert(rows.map(_._2).forall(c => c == n / 10 || c == n / 10 + 1))
    assert(n <= docs.count())
    // deciles are ordered by length rank
    val mt = rows.map(_._3)
    assert(mt.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"decile mean tokens must not fall: $mt")
    val rhos = rows.map(_._5).distinct
    assert(rhos.length === 1, "one Spearman, repeated per row")
    assert(rhos.head >= -1.0 && rhos.head <= 1.0)
  }

  test("q335 per-source curriculum: bands tile 1..n within every " +
    "source, per-band mean loss is non-decreasing, weights are " +
    "per-source constants summing to <= 1e6 ppm") {
    val rows = run("q335_source_curriculum")
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      val n = sorted.map(_._3).sum
      // contiguity: each band's positions are a gap-free run and the
      // runs tile 1..n in band order
      var next = 1L
      sorted.foreach { case (_, band, nd, lo, hi, _, _) =>
        assert(lo === next, s"$src band $band starts at $lo, want $next")
        assert(hi - lo + 1 === nd, s"$src band $band not contiguous")
        next = hi + 1
      }
      assert(next === n + 1)
      // easy-to-hard: per-band mean loss never falls
      val means = sorted.map(_._6)
      assert(means.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"$src band means not monotone: $means")
      // one weight per source
      assert(rs.map(_._7).distinct.length === 1)
    }
    val perSource = rows.groupBy(_._1).map(_._2.head._7)
    assert(perSource.sum <= 1000000L,
      "truncating ppm weights cannot exceed the whole")
  }

  test("q330 sketch-fed band planner: 4 configs over ONE candidate " +
    "set, lattice bounds, catch non-increasing in rows-per-band; " +
    "twin docs land a 128/128 estimate and a certain catch while a " +
    "disjoint-vocabulary doc draws no candidate") {
    val rows = run("q330_sketch_band_planner")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.length === 4)
    assert(rows.map(t => t._1 * t._2).toSeq === Seq(128, 128, 128, 128))
    rows.foreach { case (r, _, nge, cg, nband, cb, nlow) =>
      assert(cg <= nge * 1000000000L, s"r=$r caught > possible")
      assert(cb <= nband * 1000000000L, s"r=$r band catch bound")
      assert(cg >= 0 && cb >= 0 && nlow >= 0)
    }
    // the candidate classes are config-independent (ONE enumeration)
    assert(rows.map(_._3).distinct.length === 1)
    assert(rows.map(_._5).distinct.length === 1)
    assert(rows.map(_._7).distinct.length === 1)
    // ties allowed (an est of exactly 1.0 catches under every config)
    assert(rows.map(_._4).toSeq.sliding(2).forall(p => p(1) <= p.head))
    assert(rows.map(_._6).toSeq.sliding(2).forall(p => p(1) <= p.head))

    // hand fixture: twins share every perm min (est = 128/128 = 1.0,
    // caught w.p. 1 under all four configs); the disjoint-vocabulary
    // doc shares no shingle, so its band keys are md5s of different
    // min values — no candidate pair
    import spark.implicits._
    val fixture = Seq(
      (1L, "twin", "a b c d e f"),
      (2L, "twin", "a b c d e f"),
      (3L, "other", "p q r s t u"))
      .toDF("doc_id", "source", "text")
    val tmp = tempDir("q330fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("q330_sketch_band_planner")(
        spark, tmp.toString).collect()
        .map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(6)))
        .sortBy(_._1)
      assert(out.length === 4)
      out.foreach { case (r, nge, cg, nband, nlow) =>
        assert(nge === 1L, s"r=$r: the twin pair is the one candidate")
        assert(cg === 1000000000L, s"r=$r: est 1.0 catches certainly")
        assert(nband === 0L && nlow === 0L,
          s"r=$r: the disjoint doc must draw no candidate")
      }
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q346 pack discipline compare: both disciplines pack the same " +
    "docs and token mass, BFD wastes no more than next-fit, and the " +
    "ppm closing is consistent with its own columns") {
    val rows = run("q346_pack_discipline_compare")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows.keySet === Set("next_fit", "best_fit_decreasing"))
    val (nfPacks, nfDocs, nfTok, nfOver, nfWaste, nfPpm) = rows("next_fit")
    val (bPacks, bDocs, bTok, bOver, bWaste, bPpm) =
      rows("best_fit_decreasing")
    // the packers place the SAME items — only the arrangement differs
    assert(nfDocs === bDocs && nfTok === bTok && nfOver === bOver)
    assert(bWaste <= nfWaste, "BFD must not waste more than next-fit")
    assert(bPacks <= nfPacks, "fewer-or-equal packs for the same mass")
    assert(nfPpm === nfWaste * 1000000L / (nfWaste + nfTok))
    assert(bPpm === bWaste * 1000000L / (bWaste + bTok))
  }

  test("q347 simhash radius backtest: totals constant across radii, " +
    "caught counts monotone in the radius and bounded by their " +
    "totals; identical twins are a true pair caught at radius 0") {
    val rows = run("q347_simhash_radius_backtest")
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.keySet === Set(0, 1, 2, 3))
    val totals = rows.values.map(v => (v._1, v._3)).toSet
    assert(totals.size === 1, "n_true/n_band must not vary with radius")
    for (r <- Seq(0, 1, 2)) {
      assert(rows(r)._2 <= rows(r + 1)._2, "true catch monotone")
      assert(rows(r)._4 <= rows(r + 1)._4, "band catch monotone")
    }
    rows.values.foreach { case (t, tc, b, bc) =>
      assert(tc >= 0L && tc <= t && bc >= 0L && bc <= b)
    }
    // hand fixture: an identical twin (jac 1, hamming 0), a band pair
    // (shared prefix: 6 of 14 union shingles = 0.43), a disjoint doc
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"),   // identical to 1
      (3L, "a b c d e f g h x y z w"),   // band vs 1 and 2
      (4L, "totally unrelated words only here"))
      .toDF("doc_id", "text")
    val tmp = tempDir("q347fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("q347_simhash_radius_backtest")(
        spark, tmp.toString).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      // (1,2) is the one true pair; (1,3) and (2,3) are the band
      out.values.foreach { case (t, _, b, _, _) =>
        assert(t === 1L && b === 2L)
      }
      // identical text -> identical signature -> caught at radius 0
      assert(out(0)._2 === 1L)
      assert(out(0)._5 === 1000000L, "catch_ppm full at every radius")
      // band pairs share half their text: hamming is small but the
      // catch count can only grow with the radius
      assert(out(3)._4 >= out(0)._4)
    } finally graft.TempTrees.deleteQuietly(tmp)
  }

  test("q348 sampled simhash backtest: same invariants as q347 plus " +
    "the sampled flag; on a fixture with one twin pair per sample " +
    "half, the sampled catch curve AGREES with the full one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // find ids on each side of the |sbs 1-in-2 sample split
    val sides = spark.range(1, 60)
      .select(col("id"), (graft.operators.SplitOps.hashBucket(concat(
        col("id").cast("string"), lit("|sbs"))) % 2 === 0).as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val sampled = sides.filter(_._2).keys.toSeq.sorted.take(2)
    val dropped = sides.filterNot(_._2).keys.toSeq.sorted.take(2)
    assert(sampled.size === 2 && dropped.size === 2)
    // one identical-twin true pair wholly INSIDE the sample, one
    // wholly OUTSIDE it — the sampled curve must agree with the full
    // one (both read 1 true pair... resp. 2 ... at catch_ppm 1e6)
    val fixture = (sampled.map(i => (i, "a b c d e f g h i j k l")) ++
      dropped.map(i => (i, "m n o p q r s t u v w x")))
      .toDF("doc_id", "text")
    val tmp = tempDir("q348fix")
    try {
      fixture.write.mode("overwrite")
        .parquet(tmp.resolve("documents.parquet").toString)
      val full = SparkEntry.queries("q347_simhash_radius_backtest")(
        spark, tmp.toString).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(5))).toMap
      val samp = SparkEntry.queries("q348_simhash_radius_sampled")(
        spark, tmp.toString).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(5), r.getBoolean(6))).toMap
      assert(samp.keySet === Set(0, 1, 2, 3))
      for (r <- Seq(0, 1, 2, 3)) {
        assert(full(r)._1 === 2L, "two twin pairs in the full corpus")
        assert(samp(r)._1 === 1L, "one twin pair inside the sample")
        // agreement band: identical catch curve (ppm) sample vs full
        assert(samp(r)._3 === full(r)._3,
          s"radius $r: sampled ppm ${samp(r)._3} != full ${full(r)._3}")
        assert(samp(r)._4, "sampled flag must be true")
      }
      assert(samp(0)._2 === 1L && full(0)._2 === 2L,
        "identical twins caught at radius 0 on both paths")
    } finally graft.TempTrees.deleteQuietly(tmp)
  }
}
