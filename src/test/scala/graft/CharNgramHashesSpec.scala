package graft

import graft.expressions.CharNgramHashes
import graft.text.TextOps
import org.apache.spark.sql.functions._

class CharNgramHashesSpec extends SparkSpec {
  import spark.implicits._

  /** The composed Catalyst chain the fused expression replaces:
    * normalizeText → code-point windows via sequence+substr →
    * xxhash64 of each gram.
    */
  private def chainHashes(c: org.apache.spark.sql.Column, n: Int) = {
    val norm = TextOps.normalizeText(c)
    graft.expressions.ExprOps.bind(coalesce(norm, lit(""))) { s =>
      when(length(s) < n, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(1), length(s) - n + 1),
          i => xxhash64(s.substr(i, lit(n)))))
    }
  }

  test("fused hashes == composed-chain hashes elementwise on hostile " +
    "inputs (case, punctuation, whitespace runs, unicode, astral, short)") {
    val fixtures = Seq(
      "The QUICK brown fox!!",
      "a.b",
      "a . b",
      "  \t leading and trailing \n ",
      "tabs\tbetween\twords",
      "digits 123 mix 4a5",
      "café menu",                 // precomposed é
      "café menu",                // combining acute
      "日本語の文", // CJK
      "emoji 😀😁😂 tail", // astral pairs
      "straße in berlin",          // ß (String vs Char lowercase)
      "",
      "   ",
      "!!!",
      "ab",                             // shorter than n after normalize
      null.asInstanceOf[String])
    val df = fixtures.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s")
    val both = df.select(col("id"),
        CharNgramHashes.column(col("s"), 3).as("fused"),
        chainHashes(col("s"), 3).as("chain"))
      .collect()
    both.foreach { r =>
      val id = r.getInt(0)
      val fused = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      val chain = if (r.isNullAt(2)) null else r.getSeq[Long](2)
      // NULL input: fused is NULL, chain coalesces to empty — both
      // vanish identically under the explode consumer
      if (fixtures(id) == null) {
        assert(fused == null && chain != null && chain.isEmpty)
      } else assert(fused === chain, s"fixture $id: '${fixtures(id)}'")
    }
  }

  test("fused hashes equal across fast (ASCII) and slow (unicode) " +
    "paths for grams both contain") {
    // same normalized content, one string carries a stripped unicode
    // char that forces the slow path without changing the grams
    val ascii = "hello world"
    val forced = "hello world¡" // ¡ is \p{P} -> stripped, non-ASCII path
    val out = Seq((1, ascii), (2, forced)).toDF("id", "s")
      .select(col("id"), CharNgramHashes.column(col("s"), 3).as("h"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(out(1) === out(2))
  }

  test("char entropy: hand-computed values, code-point counting on " +
    "astral pairs, NULL/empty handling") {
    import graft.expressions.CharEntropy
    val rows = Seq(
      (1, "aabb"),     // two symbols, p = 1/2 each -> ln 2
      (2, "abcd"),     // uniform over 4 -> ln 4
      (3, "aaaa"),     // single symbol -> 0
      (4, ""),
      (5, null.asInstanceOf[String]),
      (6, "😀😀🙂🙂")) // astral pairs: 2 symbols by CODE POINT -> ln 2
      .toDF("id", "s")
      .select(col("id"), CharEntropy.column(col("s")).as("e"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val ln2 = math.log(2.0); val ln4 = math.log(4.0)
    assert(math.abs(rows(1).get - ln2) < 1e-12)
    assert(math.abs(rows(2).get - ln4) < 1e-12)
    assert(rows(3).get === 0.0)
    assert(rows(4).get === 0.0)
    assert(rows(5) === None)
    assert(math.abs(rows(6).get - ln2) < 1e-12,
      "astral chars must count as one code point each")
  }

  test("n = 1 and long n behave: windows and counts") {
    val out = Seq(("abc d")).toDF("s")
      .select(CharNgramHashes.column(col("s"), 1).as("h1"),
        CharNgramHashes.column(col("s"), 5).as("h5"),
        CharNgramHashes.column(col("s"), 6).as("h6"))
      .head()
    assert(out.getSeq[Long](0).length === 5) // a b c ' ' d
    assert(out.getSeq[Long](1).length === 1)
    assert(out.getSeq[Long](2).length === 0)
  }
}
