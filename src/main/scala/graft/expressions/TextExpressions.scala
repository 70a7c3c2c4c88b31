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
