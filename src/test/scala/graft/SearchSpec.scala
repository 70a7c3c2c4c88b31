package graft

import graft.text.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def phraseRef(texts: Map[Long, String], phrase: Seq[String]): Map[Long, Long] =
    texts.flatMap { case (id, t) =>
      val toks = Option(t).map(_.trim).filter(_.nonEmpty)
        .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
      val n = (0 to toks.length - phrase.length)
        .count(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
      if (n > 0) Some(id -> n.toLong) else None
    }

  test("overlapping occurrences each count: 'batch batch batch' " +
    "contains ['batch','batch'] twice") {
    val docs = Seq(
      (1L, "batch batch batch stream"),
      (2L, "batch stream batch"),
      (3L, "stream stream")).toDF("doc_id", "text")
    val got = Search.phraseCount(docs, "doc_id", "text", Seq("batch", "batch"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L))
  }

  test("three-term phrase, single-term phrase, absent phrase, " +
    "NULL/empty text") {
    val docs = Seq(
      (1L, "the quick brown fox the quick brown cat"),
      (2L, "quick brown"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val three = Search.phraseCount(docs, "doc_id", "text",
      Seq("quick", "brown", "fox")).as[(Long, Long)].collect().toMap
    assert(three === Map(1L -> 1L))
    val one = Search.phraseCount(docs, "doc_id", "text", Seq("quick"))
      .as[(Long, Long)].collect().toMap
    assert(one === Map(1L -> 2L, 2L -> 1L))
    val absent = Search.phraseCount(docs, "doc_id", "text",
      Seq("fox", "quick")).as[(Long, Long)].collect().toMap
    assert(absent === Map.empty[Long, Long])
  }

  test("equivalence with a naive sliding-window count on a seeded " +
    "random corpus, phrases of length 1..3") {
    val rnd = new scala.util.Random(23)
    val vocab = Seq("a", "b", "c", "d")
    val texts = (1L to 80L).map { id =>
      id -> Seq.fill(rnd.nextInt(20) + 1)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }.toMap
    val docs = texts.toSeq.toDF("doc_id", "text")
    for (phrase <- Seq(Seq("a"), Seq("a", "a"), Seq("b", "c"), Seq("a", "b", "a"))) {
      val got = Search.phraseCount(docs, "doc_id", "text", phrase)
        .as[(Long, Long)].collect().toMap
      assert(got === phraseRef(texts, phrase), s"phrase=$phrase")
    }
  }

  test("positionalPostings: 0-based positions, empty text yields no rows") {
    val docs = Seq((1L, "x y x"), (2L, "")).toDF("doc_id", "text")
    val got = Search.positionalPostings(docs, "doc_id", "text")
      .as[(String, Long, Int)].collect().toSet
    assert(got === Set(("x", 1L, 0), ("y", 1L, 1), ("x", 1L, 2)))
  }

  test("rrfFuse: hand-computed fixed-order scores, absence contributes " +
    "zero with rank 0, (score, id) tie-break, top-k cut") {
    // list A: docs 1,2,3 at ranks 1,2,3; list B: docs 3,4 at ranks 1,2
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = Search.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", "rank",
        k = 3, c = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc3 in both lists wins; doc1 (1/61) next; docs 2 and 4 TIE at
    // 1/62 — id ascending keeps doc2, k=3 cuts doc4
    assert(out.toSeq === Seq(
      (3L, 3L, 1L, r6(1.0 / 63 + 1.0 / 61)),
      (1L, 1L, 0L, r6(1.0 / 61)),
      (2L, 2L, 0L, r6(1.0 / 62))))
  }

  test("rrfFuse: equal-score ties order by id; duplicate source names " +
    "and empty input rejected") {
    // doc 7 only in A at rank 2, doc 5 only in B at rank 2 -> equal
    // scores, id ascending breaks the tie
    val a = Seq((7L, 2)).toDF("doc_id", "rank")
    val b = Seq((5L, 2)).toDF("doc_id", "rank")
    val ids = Search.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", "rank", k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids === Seq(5L, 7L))
    intercept[IllegalArgumentException](
      Search.rrfFuse(Seq("x" -> a, "x" -> b), "doc_id", "rank", 2))
    intercept[IllegalArgumentException](
      Search.rrfFuse(Seq.empty, "doc_id", "rank", 2))
  }

  test("retrievalEval: hand-computed precision/MRR/nDCG, IDCG bounded " +
    "by the relevant-set size, empty relevance degrades gracefully") {
    import spark.implicits._
    val ranked = (1 to 5).map(i => (i.toLong, i)).toDF("doc_id", "rank")
    val relevant = Seq(2L, 4L, 99L).toDF("doc_id")
    val r = Search.retrievalEval(ranked, "doc_id", "rank",
      relevant, "doc_id", k = 5).collect()(0)
    assert(r.getAs[Long]("n_results") === 5L)
    assert(r.getAs[Long]("n_relevant") === 3L)
    assert(r.getAs[Double]("precision_at_k") === 0.4)
    assert(r.getAs[Double]("mrr") === 0.5)
    // DCG = 1/log2(3) + 1/log2(5); IDCG over ranks 1..3
    assert(r.getAs[Double]("dcg") === 1.061606)
    assert(r.getAs[Double]("idcg") === 2.13093)
    assert(r.getAs[Double]("ndcg") === 0.498189)
    val empty = Search.retrievalEval(ranked, "doc_id", "rank",
      Seq.empty[Long].toDF("doc_id"), "doc_id", k = 5).collect()(0)
    assert(empty.getAs[Double]("mrr") === 0.0)
    assert(empty.isNullAt(empty.fieldIndex("ndcg")))
  }
}
