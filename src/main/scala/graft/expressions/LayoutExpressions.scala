package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Space-filling-curve index as a native codegen'd expression.
  *
  * The Hilbert xy→d walk (the classic per-bit rotate/reflect loop;
  * Hamilton 2006's compact form) references x and y several times per
  * bit level, so building it from composed Column expressions grows
  * the tree ~4^order nodes and melts the optimizer (measured: an
  * 18-level staged-projection form OOMed the driver). One imperative
  * loop in a custom expression is the honest shape: O(order) work per
  * row, whole-stage-codegen friendly, exact 64-bit integers only —
  * bit-identical on any engine that replays the same loop.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order out of range: $order")

  private val n: Long = 1L << order

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // out-of-domain coords yield NULL

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long]
    var y = r.asInstanceOf[Long]
    if (x < 0 || x >= n || y < 0 || y >= n) return null
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b;
         |if ($x < 0L || $x >= ${n}L || $y < 0L || $y >= ${n}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |    long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |    long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |    $d += $s * $s * ((3L * $rx) ^ $ry);
         |    if ($ry == 0L) {
         |      if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |      long $t = $x; $x = $y; $y = $t;
         |    }
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  /** Column wrapper: Hilbert index of two non-negative < 2^order
    * bigint coordinates.
    */
  def hilbert_index(x: Column, y: Column, order: Int): Column =
    ColumnBridge.toColumn(HilbertIndex(
      ColumnBridge.toExpression(x), ColumnBridge.toExpression(y), order))
}
