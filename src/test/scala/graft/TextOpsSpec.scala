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
}
