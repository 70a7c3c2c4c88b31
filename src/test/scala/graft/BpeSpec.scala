package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference BPE (Sennrich 2016): histogram in a Map,
    * explicit greedy left-to-right pair merge, count-desc / (a, b)-asc
    * tie-break — the independent twin the dataframe loop must equal.
    */
  private def refBpe(words: Map[String, Long], n: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var segs: Map[String, Seq[String]] =
      words.keys.map(w => w -> w.map(_.toString).toSeq).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < n && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (pc.isEmpty) done = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        rank += 1
        merges += ((rank, a, b, cnt))
        segs = segs.map { case (w, syms) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    (merges.result(), segs)
  }

  private def corpusOf(rows: Seq[String]) = rows.toDF("text")

  test("training equals the in-memory reference on a mixed fixture " +
    "(merge order, pair counts, and final segmentation)") {
    val texts = Seq(
      "low lower lowest low low slow slower",
      "new newer newest news new new",
      "low low lower newest slow")
    val model = Bpe.train(corpusOf(texts), "text", 12)

    val hist = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (refMerges, refSegs) = refBpe(hist, 12)

    val gotMerges = model.merges.orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(gotMerges === refMerges)

    val gotSegs = model.vocabSegs
      .select(col("word"), Bpe.symbols(col("wrapped")).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(gotSegs === refSegs)
  }

  test("greedy left-to-right merge: 'aaa' under (a,a) segments to [aa, a]") {
    // one word "aaa" (plus a spacer so (a,a) is the clear argmax)
    val model = Bpe.train(corpusOf(Seq("aaa aaa bc")), "text", 1)
    val m = model.merges.as[(Int, String, String, Long)].collect()
    assert(m.toSeq === Seq((1, "a", "a", 4L))) // two positions × two occurrences
    val segs = model.vocabSegs
      .select(col("word"), Bpe.symbols(col("wrapped")).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(segs("aaa") === Seq("aa", "a"))
  }

  test("tie-break is (count desc, a asc, b asc): equal-count pairs pick " +
    "the lexicographically first") {
    // "zy" and "ab" each appear 3 times: pair counts tie at 3,
    // (a,b) < (z,y) lexicographically
    val model = Bpe.train(corpusOf(Seq("zy ab zy ab zy ab")), "text", 1)
    val m = model.merges.as[(Int, String, String, Long)].collect()
    assert(m.head._2 === "a" && m.head._3 === "b")
  }

  test("early stop: vocabulary exhausts before numMerges and training " +
    "returns only the achievable merges") {
    val model = Bpe.train(corpusOf(Seq("ab ab")), "text", 10)
    // "ab" admits exactly one merge; afterwards every word is one symbol
    assert(model.merges.count() === 1)
    assert(model.vocabSegs.select(col("n_tokens")).as[Int].collect().toSeq === Seq(1))
  }

  test("determinism: two trainings on the same corpus produce identical " +
    "merge tables and segmentations") {
    val texts = Seq("the quick brown fox", "the quick red fox", "the slow fox")
    val a = Bpe.train(corpusOf(texts), "text", 8)
    val b = Bpe.train(corpusOf(texts), "text", 8)
    assert(a.merges.orderBy("rank").collect().toSeq ===
      b.merges.orderBy("rank").collect().toSeq)
    assert(a.vocabSegs.orderBy("word").select("word", "wrapped").collect().toSeq ===
      b.vocabSegs.orderBy("word").select("word", "wrapped").collect().toSeq)
  }

  test("applyMerges replays training: on the training vocabulary it " +
    "reproduces the trained segmentation; bracket-char words stay atomic") {
    val texts = Seq("lower slower newest", "lower lower slower")
    val model = Bpe.train(corpusOf(texts), "text", 6)
    val mergeList = model.merges.orderBy("rank").select("a", "b")
      .as[(String, String)].collect().toSeq
    val replayed = Bpe.applyMerges(
      model.vocabSegs.select("word"), "word", mergeList, ckptEvery = 2)
      .select(col("word"), col("wrapped"), col("n_tokens"))
    val got = replayed.as[(String, String, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val want = model.vocabSegs.select("word", "wrapped", "n_tokens")
      .as[(String, String, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === want)

    val weird = Bpe.applyMerges(Seq("a\u001Fb").toDF("word"), "word", mergeList)
      .select("n_tokens").as[Int].collect()
    assert(weird.toSeq === Seq(3)) // atomic fallback: char length
  }

  test("fertilityByGroup: hand-computed tokens-per-word and " +
    "chars-per-token; groups differ when the vocabulary fits unequally") {
    val docs = Seq(("en", "ab ab cd"), ("de", "cd cd")).toDF("lang", "text")
    // corpus-wide pair counts: (c,d)=3 beats (a,b)=2 — the single
    // merge learns (c,d), fitting "de" perfectly and "en" poorly
    val model = Bpe.train(docs, "text", 1)
    val out = Bpe.fertilityByGroup(docs, "lang", "text", model)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // en: ab,ab,cd -> 2+2+1 = 5 tokens over 3 words; 6 chars
    assert(out("en") === ((3L, 5L, 1.6667, 1.2)))
    // de: cd,cd -> 1+1 = 2 tokens over 2 words (fertility 1.0): the
    // group the vocabulary was effectively trained FOR — the
    // multilingual distortion signal is the en/de fertility gap
    assert(out("de") === ((2L, 2L, 1.0, 2.0)))
  }

  test("tokenCounts: per-doc totals match a hand count, NULL/empty text " +
    "counts zero, unseen words fall back to merge replay") {
    val train = corpusOf(Seq("ab ab ab cd"))
    val model = Bpe.train(train, "text", 1) // learns only (a,b) -> ab
    val docs = Seq(
      (1L, "ab cd"),     // ab=1 token, cd=2 tokens (c,d unmerged)
      (2L, "abab"),      // one word "abab" — seen? no ("abab" not in vocab):
                         // replay merges (a,b): ab|ab = 2 tokens
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val out = Bpe.tokenCounts(docs, "doc_id", "text", model)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 0L))
  }
}
