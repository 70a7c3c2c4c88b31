package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Even-odd point-in-rings test over PRE-PARSED ring geometry.
  *
  * The grid-bucketed spatial join (Geo.gridRevGeoZone) verifies
  * candidate (point, zone) rows after the cell equi-join; doing that
  * with a `(wkt, x, y)` UDF re-runs the regex WKT parse once per
  * CANDIDATE row — at national scale (millions of polygons × dozens of
  * candidates each) the parse dominates the ray cast. Here the zone
  * side carries rings parsed ONCE per zone row as
  * `array<struct<xs:array<double>, ys:array<double>,
  * minx,maxx,miny,maxy:double>>`, and this expression ray-casts
  * directly over the unsafe array data — primitive loop, no boxing, no
  * parse.
  *
  * Containment is the EVEN-ODD rule across all rings (odd count of
  * containing rings = inside), which handles POLYGON holes and
  * MULTIPOLYGON parts with no structural distinction — BigQuery
  * `ST_CONTAINS` semantics for the reference's zone tables
  * (bq_queries/geo_queries.py:35-108).
  */
case class RingsContain(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // validate element types fully: the evaluator walks unsafe data
    // with 8-byte double strides, so a float/int-typed producer would
    // read garbage coordinates instead of failing analysis
    val ringsOk = first.dataType match {
      case ArrayType(s: StructType, _) if s.length == 6 &&
        s(0).dataType == ArrayType(DoubleType, false) &&
        s(1).dataType == ArrayType(DoubleType, false) &&
        (2 to 5).forall(i => s(i).dataType == DoubleType) => true
      case _ => false
    }
    val numOk = second.dataType == DoubleType && third.dataType == DoubleType
    if (ringsOk && numOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rings_contain expects (array<struct x6>, double, double), got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  override protected def nullSafeEval(r: Any, xa: Any, ya: Any): Any = {
    val rings = r.asInstanceOf[ArrayData]
    val x = xa.asInstanceOf[Double]
    val y = ya.asInstanceOf[Double]
    var cnt = 0
    var i = 0
    val n = rings.numElements()
    while (i < n) {
      val ring = rings.getStruct(i, 6)
      if (x >= ring.getDouble(2) && x <= ring.getDouble(3) &&
          y >= ring.getDouble(4) && y <= ring.getDouble(5)) {
        val xs = ring.getArray(0); val ys = ring.getArray(1)
        val m = xs.numElements()
        var inside = false
        var a = 0; var b = m - 1
        while (a < m) {
          val xi = xs.getDouble(a); val yi = ys.getDouble(a)
          val xj = xs.getDouble(b); val yj = ys.getDouble(b)
          if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi))
            inside = !inside
          b = a; a += 1
        }
        if (inside) cnt += 1
      }
      i += 1
    }
    (cnt & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, x, y) => {
      val cnt = ctx.freshName("cnt"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val ring = ctx.freshName("ring")
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val m = ctx.freshName("m"); val inside = ctx.freshName("inside")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
      s"""
         |int $cnt = 0;
         |int $n = $r.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  InternalRow $ring = $r.getStruct($i, 6);
         |  if ($x >= $ring.getDouble(2) && $x <= $ring.getDouble(3) &&
         |      $y >= $ring.getDouble(4) && $y <= $ring.getDouble(5)) {
         |    ArrayData $xs = $ring.getArray(0);
         |    ArrayData $ys = $ring.getArray(1);
         |    int $m = $xs.numElements();
         |    boolean $inside = false;
         |    for (int $a = 0, $b = $m - 1; $a < $m; $b = $a, $a++) {
         |      double $xi = $xs.getDouble($a); double $yi = $ys.getDouble($a);
         |      double $xj = $xs.getDouble($b); double $yj = $ys.getDouble($b);
         |      if ((($yi > $y) != ($yj > $y)) &&
         |          ($x < ($xj - $xi) * ($y - $yi) / ($yj - $yi) + $xi)) $inside = !$inside;
         |    }
         |    if ($inside) $cnt++;
         |  }
         |}
         |${ev.value} = ($cnt & 1) == 1;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RingsContain =
    copy(first = f, second = s, third = t)
}

object GeoExpressions {
  def rings_contain(rings: Column, x: Column, y: Column): Column =
    ColumnBridge.toColumn(RingsContain(
      ColumnBridge.toExpression(rings),
      ColumnBridge.toExpression(x),
      ColumnBridge.toExpression(y)))
}
