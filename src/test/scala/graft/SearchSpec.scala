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
}
