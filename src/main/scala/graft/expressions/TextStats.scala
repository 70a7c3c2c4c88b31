package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics.
  *
  * The expression-composition form of quality scoring + language ID
  * runs one regex/split pass PER SIGNAL per row (5–10 scans of every
  * document). This expression computes all counters in ONE character
  * pass: char count, whitespace-token count, alpha count, punctuation
  * count, and per-stopword-set token hit counts (lowercased token
  * membership). Interpreted eval (CodegenFallback) — the single fused
  * pass replaces several regex engines, which dominates.
  *
  * Token definition matches `split(trim(text), "\\s+")`: tokens are
  * maximal runs of non-ASCII-whitespace ([ \t\n\x0B\f\r]).
  *
  * Output: struct<n_chars:long, n_tokens:long, n_alpha:long,
  * n_punct:long, hits:array<long>> — hits(i) = tokens of text found in
  * stopwordSets(i).
  */
case class TextStats(child: Expression, stopwordSets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextStats.outputType
  override def nullable: Boolean = child.nullable

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    stopwordSets.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(w => s.add(w)); s
    }.toArray

  private val PunctChars = ".,;:!?'\"()-"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var alpha = 0L; var punct = 0L; var tokens = 0L
    val hits = new Array[Long](sets.length)
    val tok = new java.lang.StringBuilder(32)
    var i = 0
    def closeToken(): Unit = if (tok.length > 0) {
      tokens += 1
      val lower = tok.toString.toLowerCase(java.util.Locale.ROOT)
      var j = 0
      while (j < sets.length) { if (sets(j).contains(lower)) hits(j) += 1; j += 1 }
      tok.setLength(0)
    }
    // n_chars counts CODE POINTS (a surrogate pair is one char), like
    // Spark's length() and the DuckDB oracle — counting UTF-16 units
    // would inflate the denominator of every ratio on emoji/CJK-ext
    var chars = 0L
    while (i < n) {
      val c = s.charAt(i)
      if (!Character.isLowSurrogate(c)) chars += 1
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
      if (PunctChars.indexOf(c) >= 0) punct += 1
      if (isWs(c)) closeToken() else tok.append(c)
      i += 1
    }
    closeToken()
    InternalRow(chars, tokens, alpha, punct, new GenericArrayData(hits))
  }

  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

object TextStats {
  val outputType: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false), nullable = false)))

  def text_stats(c: Column, stopwordSets: Seq[Seq[String]]): Column =
    ColumnBridge.toColumn(TextStats(ColumnBridge.toExpression(c), stopwordSets))
}
