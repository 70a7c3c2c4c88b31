package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization expression for corpus dedup.
  *
  * Exact and fuzzy dedup hash the raw bytes, so two strings that render
  * identically but differ in code-point sequence — precomposed é
  * (U+00E9) vs e + combining acute (U+0065 U+0301) — never collapse.
  * Canonical NFC normalization before digesting closes that class.
  * NFC (not NFKC) is deliberate: it is the canonical form every engine
  * agrees on byte-for-byte (DuckDB ships `nfc_normalize`, so the
  * oracle can recompute it independently); compatibility folding
  * (fullwidth→ASCII etc.) is a lossy editorial choice left to callers.
  */
object TextExpressions {

  /** Hot-path helper: ASCII is closed under NFC, so the overwhelmingly
    * common all-ASCII string skips the String round-trip entirely
    * (UTF8String tracks full-ASCII-ness in O(n) SIMD-friendly bytes);
    * only genuinely multi-byte strings pay the JDK normalizer.
    */
  def nfc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  def nfc_normalize(c: Column): Column =
    ColumnBridge.toColumn(NfcNormalize(ColumnBridge.toExpression(c)))
}

/** Canonical NFC normalization of a string column (codegen'd; NULL in,
  * NULL out). Semantics twin of DuckDB's `nfc_normalize` and BigQuery's
  * `NORMALIZE(s)` — both default to NFC.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextExpressions.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextExpressions.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Fused normalize → char-n-gram → xxhash64 in ONE pass over the
  * string — the hot-path form of
  * `transform(sequence(...), i -> substr(normalizeText(s), i, n))`
  * followed by `xxhash64(gram)`: that chain runs two regex engines,
  * allocates every n-char gram as a UTF8String, and hashes it;
  * this expression emits the IDENTICAL hash values (XXH64 seed 42
  * over each gram's UTF-8 bytes — bit-equal to `xxhash64(gram)` by
  * construction, which CharNgramHashesSpec asserts elementwise
  * against the composed chain) with zero per-gram allocation on the
  * all-ASCII fast path.
  *
  * Normalization contract (= [[graft.text.TextOps.normalizeText]]):
  * lowercase, drop every char outside \p{L}\p{N}\s, collapse \s+
  * runs to one space, trim spaces. The ASCII fast path streams that
  * in one byte scan; non-ASCII strings replicate the chain with the
  * SAME JDK primitives Spark itself uses (String.toLowerCase, the
  * same java.util.regex patterns), then window by CODE POINTS as
  * Spark's substr does. Interpreted eval (CodegenFallback) — the
  * fused pass replaces two regex engines and the per-gram
  * allocation, which dominate (the TextStats precedent).
  *
  * NULL in → NULL out (the explode consumer drops either form).
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1 && n <= 32, s"char n-gram length out of range: $n")

  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngram_hashes expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val hashes: Array[Long] =
      if (u.isFullAscii) CharNgramHashes.asciiHashes(u.getBytes, n)
      else CharNgramHashes.unicodeHashes(u.toString, n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {
  private val Seed = 42L
  private val StripPattern = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}\\s]")
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  def column(c: Column, n: Int): Column =
    ColumnBridge.toColumn(CharNgramHashes(ColumnBridge.toExpression(c), n))

  private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One streaming byte pass: lowercase, keep [a-z0-9], fold \s runs
    * to a single interior space, trim edges — then hash each n-byte
    * window in place (ASCII bytes ARE the gram's UTF-8 bytes).
    */
  private[expressions] def asciiHashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val buf = new Array[Byte](bytes.length)
    var len = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && len > 0) { buf(len) = ' '; len += 1 }
        pendingSpace = false
        buf(len) = b; len += 1
      } else if (isAsciiWs(b)) {
        pendingSpace = true
      } // anything else: stripped
      i += 1
    }
    val count = math.max(len - n + 1, 0)
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      out(j) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + j, n, Seed)
      j += 1
    }
    out
  }

  /** Non-ASCII: replicate the Catalyst chain with the same JDK
    * primitives Spark executes (default-locale String.toLowerCase =
    * UTF8String.toLowerCase's non-ASCII fallback; the same regex
    * patterns), window by code points as substr does.
    */
  private[expressions] def unicodeHashes(s: String, n: Int): Array[Long] = {
    val lower = s.toLowerCase
    val stripped = StripPattern.matcher(lower).replaceAll("")
    val collapsed = WsPattern.matcher(stripped).replaceAll(" ")
    var a = 0; var b = collapsed.length
    while (a < b && collapsed.charAt(a) == ' ') a += 1
    while (b > a && collapsed.charAt(b - 1) == ' ') b -= 1
    val t = collapsed.substring(a, b)
    val cps = t.codePoints().toArray
    val count = math.max(cps.length - n + 1, 0)
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      val gram = new String(cps, j, n)
      val gb = gram.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(j) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        gb, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, gb.length, Seed)
      j += 1
    }
    out
  }
}

/** Per-document Shannon entropy over the character (code point)
  * distribution — the compression-style quality signal (low-entropy
  * docs are boilerplate/repetition; implausibly high entropy is
  * binary junk or encoding damage) that complements the Gopher
  * length/ratio rules. ONE map-only pass per row: a code-point
  * frequency map, then −Σ p·ln p accumulated in ASCENDING code-point
  * order — a FIXED summation order, so the oracle reproduces the
  * value by folding its per-char counts sorted by character (UTF-8
  * byte order = code-point order), with only last-ulp libm ln
  * differences left for the caller's rounding to absorb.
  * Empty string → 0.0; NULL in → NULL out.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) 0.0
    else {
      var acc = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n.toDouble
        acc += p * math.log(p)
      }
      -acc
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  def column(c: Column): Column =
    ColumnBridge.toColumn(CharEntropy(ColumnBridge.toExpression(c)))
}

/** Fused 64-bit md5 SimHash over whitespace tokens — the hot-path
  * form of `explode(tokens(text))` → `md5(token)` → 64 per-bit sums →
  * strict-majority signature, collapsed into ONE streaming pass per
  * document with zero shuffle (the composed chain pays a corpus-sized
  * explode plus a 64-sum hash aggregate). Bit source per token: the
  * two u32 halves of md5(token) — hex chars 1-8 → bits 0-31, chars
  * 9-16 → bits 32-63 — so any SQL engine with md5 replays the
  * signature bit-for-bit (Md5Simhash64 is what q264's DuckDB oracle
  * recomputes). Bit b of the output is 1 iff STRICTLY more tokens set
  * bit b than clear it. Tokenization = graft.text.TextOps.tokens:
  * trim \s edges, split on \s+ (java regex \s class). Zero tokens
  * (blank text) → NULL, mirroring the absent-row contract of the
  * composed form. Interpreted eval (CodegenFallback) — md5 and the
  * 64-bit tally dominate, not the dispatch (the CharNgramHashes
  * precedent).
  */
case class Md5Simhash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_simhash64 expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    Md5Simhash64.signature(s) match {
      case Some(sig) => sig
      case None => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Simhash64 =
    copy(child = newChild)
}

object Md5Simhash64 {
  def column(c: Column): Column =
    ColumnBridge.toColumn(Md5Simhash64(ColumnBridge.toExpression(c)))

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // java regex \s — the exact class TextOps.tokens splits on
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** None when the text has zero tokens. */
  def signature(s: String): Option[Long] = {
    val counts = new Array[Int](64)
    var nTokens = 0
    val digest = md.get()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        nTokens += 1
        digest.reset()
        val d = digest.digest(s.substring(start, i).getBytes("UTF-8"))
        // hex chars 1-8 big-endian = bytes 0..3; 9-16 = bytes 4..7
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h1 >>> b) & 1L) == 1L) counts(b) += 1
          if (((h2 >>> b) & 1L) == 1L) counts(32 + b) += 1
          b += 1
        }
      }
    }
    if (nTokens == 0) None
    else {
      var out = 0L
      var b = 0
      while (b < 64) {
        if (2 * counts(b) > nTokens) out |= (1L << b)
        b += 1
      }
      Some(out)
    }
  }
}
