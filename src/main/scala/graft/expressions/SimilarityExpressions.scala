package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity hot loops.
  *
  * The generic `zip_with`/`aggregate` higher-order functions evaluate
  * an interpreted lambda per element — fine for one pass over a table,
  * ruinous inside an all-pairs join (pair-count × dim lambda calls).
  * These expressions generate a tight primitive loop inside
  * whole-stage codegen: one fused pass computing dot product and both
  * norms, no per-element virtual dispatch, no boxing.
  */

/** Cosine similarity of two numeric arrays (float, double, or any
  * integral element type — int8 quantization codes ride directly,
  * without the interpreted per-element `transform(c, _.cast(double))`
  * wrapper the round-16 q92 profile showed allocating a fresh double
  * array per PAIR), computed in double: dot / (sqrt(na) * sqrt(nb));
  * 0.0 when either norm is zero; NULL if either side is NULL OR the
  * lengths differ (a truncated prefix cosine would be confidently
  * wrong for mixed-dimension corruption — the zip_with/aggregate
  * composition this replaces also nulls on mismatch). Integral
  * elements convert to double EXACTLY (int8 codes are |x| ≤ 127, far
  * inside the 2^53 mantissa), so the result is bit-identical to the
  * cast-then-cosine composition.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // mismatched lengths yield NULL

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | ByteType | ShortType |
                     IntegerType | LongType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<numeric>, got ${left.dataType} / ${right.dataType}")
  }

  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _)   => "getFloat"
    case ArrayType(ByteType, _)    => "getByte"
    case ArrayType(ShortType, _)   => "getShort"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _)    => "getLong"
    case _                         => "getDouble"
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    def at(x: ArrayData, e: Expression, i: Int): Double = e.dataType match {
      case ArrayType(FloatType, _)   => x.getFloat(i).toDouble
      case ArrayType(ByteType, _)    => x.getByte(i).toDouble
      case ArrayType(ShortType, _)   => x.getShort(i).toDouble
      case ArrayType(IntegerType, _) => x.getInt(i).toDouble
      case ArrayType(LongType, _)    => x.getLong(i).toDouble
      case _                         => x.getDouble(i)
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = at(a, left, i)
      val y = at(b, right, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(left)
    val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$lGet($i);
         |    double $y = (double) $b.$rGet($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na > 0 && $nb > 0)
         |    ? $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)) : 0.0;
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Integer squared L2 distance of two integral-array code vectors
  * (byte / short / int / long elements — the
  * [[graft.similarity.Ann.quantizeInt8]], SQ8, and k-means centroid
  * spaces): Σ (aᵢ − bᵢ)² as a LONG. Exactness envelope (ADVICE r12):
  * each |aᵢ − bᵢ| must stay below ~2^31.5 (≈3·10⁹, else d·d overflows
  * Long) AND the running Σd² must stay under 2⁶³ — both trivially
  * satisfied by every space this is used for (int8 codes: d ≤ 255,
  * Σ ≤ dims·65025; SQ8/centroids likewise). Codes near ±2³¹ per
  * element are NOT exact: a single diff of 2³² squares to 2⁶⁴.
  * NULL if either side is NULL or the lengths differ. The zip_with+aggregate composition this replaces evaluates
  * an interpreted lambda per ELEMENT — ruinous inside all-pairs kNN
  * joins (pairs × dims lambda calls); this is one fused primitive
  * loop inside whole-stage codegen.
  */
case class IntSqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // mismatched lengths yield NULL

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int_sq_dist expects integral arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(ByteType, _)    => "getByte"
    case ArrayType(ShortType, _)   => "getShort"
    case ArrayType(IntegerType, _) => "getInt"
    case _                         => "getLong"
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    def at(x: ArrayData, e: Expression, i: Int): Long = e.dataType match {
      case ArrayType(ByteType, _)    => x.getByte(i).toLong
      case ArrayType(ShortType, _)   => x.getShort(i).toLong
      case ArrayType(IntegerType, _) => x.getInt(i).toLong
      case _                         => x.getLong(i)
    }
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val d = at(a, left, i) - at(b, right, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lGet, rGet) = (getter(left), getter(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = (long) $a.$lGet($i) - (long) $b.$rGet($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntSqDist =
    copy(left = l, right = r)
}

/** Jaccard similarity of two string arrays: |A ∩ B| / |A ∪ B| over the
  * DISTINCT elements of each side, one hash-set pass per row (the
  * built-in `array_intersect`+`size` composition walks both arrays
  * twice and allocates intermediate arrays). Interpreted eval — the
  * set logic dominates, codegen would buy little.
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // two empty sets yield NULL (0/0)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim expects array<string>, got $other")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[Any](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[Any](b.numElements() * 2)
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (setB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    // 0/0: two empty sets have no defined similarity — NULL, matching
    // size(array_intersect)/size(array_union)'s division semantics
    if (union > 0) inter.toDouble / union else null
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Positionwise agreement COUNT of two long-array MinHash signatures:
  * the number of indices i < min(|a|, |b|) where both elements are
  * non-null and equal — exactly the semantics of the
  * `size(filter(zip_with(a, b, _ === _), v => v))` composition it
  * replaces (null elements and length-mismatch tails compare to null
  * under `===` and are dropped by the filter), but as ONE fused
  * primitive loop instead of two interpreted lambda passes plus a
  * boolean-array materialization per candidate PAIR (the q75/q92
  * incremental-admission verify kernel).
  */
case class SigAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_agree_count expects array<bigint>, got $other")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var cnt = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreeCount =
    copy(left = l, right = r)
}

/** Banded random-hyperplane signatures for cosine LSH (OR-amplified
  * blocking): `bands` bands of `bitsPerBand` sign bits each, one
  * element per band with the band index packed into the high bits —
  * `(b << 48) | bits` — so a single explode+join on the element is a
  * complete (band, bucket) key. Hyperplane components are
  * deterministic ±1 from a splitmix64 mix of (plane, dim, seed): no
  * stored model, identical planes on every executor.
  *
  * One fused primitive loop computes all `bands × bitsPerBand` dot
  * products per row; the equivalent HOF formulation builds that many
  * interpreted `aggregate` lambdas (measured ruinous at ≥64 planes).
  */
case class HyperplaneBands(child: Expression, bands: Int, bitsPerBand: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 32,
    s"need 1..32 bits per band, got $bitsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType | ShortType |
                     IntegerType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands expects array<numeric>, got $other")
    }

  // integral elements (int8 quantization codes) convert to double
  // exactly, so signatures are bit-identical to the cast-then-band
  // composition the direct path replaces
  private def getterName: String = child.dataType match {
    case ArrayType(FloatType, _)   => "getFloat"
    case ArrayType(ByteType, _)    => "getByte"
    case ArrayType(ShortType, _)   => "getShort"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _)    => "getLong"
    case _                         => "getDouble"
  }
  // hoisted accessor: one dataType match per expression instance, not
  // one per element, on the interpreted path
  @transient private lazy val atDouble: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(FloatType, _)   => (v, i) => v.getFloat(i).toDouble
      case ArrayType(ByteType, _)    => (v, i) => v.getByte(i).toDouble
      case ArrayType(ShortType, _)   => (v, i) => v.getShort(i).toDouble
      case ArrayType(IntegerType, _) => (v, i) => v.getInt(i).toDouble
      case ArrayType(LongType, _)    => (v, i) => v.getLong(i).toDouble
      case _                         => (v, i) => v.getDouble(i)
    }

  // deterministic per (plane, dim, seed) — materialised once per task
  // instead of one splitmix per (plane, dim) per ROW (bands × bits ×
  // dim hashes/row was the kernel's dominant cost at 64×6 bands)
  @transient private var signTable: Array[Array[Boolean]] = _

  private def ensureTable(n: Int): Unit =
    if (signTable == null || signTable(0).length < n) {
      signTable = Array.tabulate(bands * bitsPerBand)(p =>
        Array.tabulate(n)(i => HyperplaneBands.sign(p, i, seed)))
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    ensureTable(n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var j = 0
      while (j < bitsPerBand) {
        val signs = signTable(b * bitsPerBand + j)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = atDouble(v, i)
          dot += (if (signs(i)) x else -x)
          i += 1
        }
        if (dot > 0) bits |= (1L << j)
        j += 1
      }
      out(b) = (b.toLong << 48) | bits
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = getterName
    // sign table as operator state: built on first row (and regrown if
    // a longer vector appears), then the hot loop is a plain
    // multiply-accumulate over a boolean[] — no hashing per row
    val table = ctx.addMutableState("boolean[][]", "hpbSigns", v => s"$v = null;")
    val build = ctx.addNewFunction("buildHpbSigns",
      s"""
         |private boolean[][] buildHpbSigns(int n) {
         |  boolean[][] t = new boolean[${bands * bitsPerBand}][n];
         |  for (int p = 0; p < ${bands * bitsPerBand}; p++) {
         |    for (int i = 0; i < n; i++) {
         |      long z = ${seed}L ^ (p * -7046029254386353131L) ^ (i * -4417276706812531889L);
         |      z = (z ^ (z >>> 30)) * -4658895280553007687L;
         |      z = (z ^ (z >>> 27)) * -7723592293110705685L;
         |      z ^= (z >>> 31);
         |      t[p][i] = (z & 1L) == 0L;
         |    }
         |  }
         |  return t;
         |}
         |""".stripMargin)
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val bits = ctx.freshName("bits"); val signs = ctx.freshName("signs")
      s"""
         |int $n = $v.numElements();
         |if ($table == null || ($n > 0 && $table[0].length < $n)) $table = $build($n);
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $bits = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    boolean[] $signs = $table[$b * $bitsPerBand + $j];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ($signs[$i] ? 1.0 : -1.0) * (double) $v.$get($i);
         |    }
         |    if ($dot > 0) $bits |= (1L << $j);
         |  }
         |  $out[$b] = ((long) $b << 48) | $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBands = copy(child = c)
}

object HyperplaneBands {
  /** splitmix64 of (plane, dim, seed) → deterministic sign bit.
    * Mirrors the constants inlined in doGenCode.
    */
  def sign(plane: Int, dim: Int, seed: Long): Boolean = {
    var z = seed ^ (plane * -7046029254386353131L) ^ (dim * -4417276706812531889L)
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^= (z >>> 31)
    (z & 1L) == 0L
  }
}

/** MinHash signature of a string array: element i = min over input
  * elements of xxhash64(elem, i) — bit-for-bit identical to the HOF
  * formulation `transform(sequence(0, k-1), i => array_min(transform(
  * sh, s => xxhash64(s, i))))` (Spark's multi-arg xxhash64 folds:
  * h = XXH64(elem, seed=42), then XXH64(i: int, seed=h)), so stored
  * signature state and pinned oracles survive the swap.
  *
  * The HOF form walks the array with k interpreted lambda passes and
  * re-hashes the STRING k times; this expression does one string hash
  * + k int-mixes per element in a fused primitive loop (measured 1.65 s
  * → ~0.2 s for 4 750 docs × 64 perms at sf0.1). Empty input yields an
  * all-NULL signature, matching array_min's NULL on empty — callers
  * filter those rows out (minhashSignatures' length gate).
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numPerms > 0, s"numPerms must be positive, got $numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](numPerms))
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var e = 0
    while (e < n) {
      // null element: two-arg xxhash64(s, i) skips a null child, so
      // its per-perm value is hashInt(i, seed) — mirror that instead
      // of NPEing inside hashUTF8String
      val u = arr.getUTF8String(e)
      val h1 = if (u == null) 42L else XXH64.hashUTF8String(u, 42L)
      var i = 0
      while (i < numPerms) {
        val h = XXH64.hashInt(i, h1)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val e = ctx.freshName("e"); val i = ctx.freshName("i")
      val h1 = ctx.freshName("h1"); val h = ctx.freshName("h")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numPerms]);
         |} else {
         |  long[] $mins = new long[$numPerms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $e = 0; $e < $n; $e++) {
         |    org.apache.spark.unsafe.types.UTF8String ${e}_s = $v.getUTF8String($e);
         |    long $h1 = (${e}_s == null) ? 42L : $xxh.hashUTF8String(${e}_s, 42L);
         |    for (int $i = 0; $i < $numPerms; $i++) {
         |      long $h = $xxh.hashInt($i, $h1);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object SimilarityExpressions {
  /** Column wrappers. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.toColumn(CosineSim(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
  def jaccard_sim(a: Column, b: Column): Column =
    ColumnBridge.toColumn(JaccardSim(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
  def sig_agree_count(a: Column, b: Column): Column =
    ColumnBridge.toColumn(SigAgreeCount(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
  def int_sq_dist(a: Column, b: Column): Column =
    ColumnBridge.toColumn(IntSqDist(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
  def hyperplane_bands(vec: Column, bands: Int, bitsPerBand: Int, seed: Long): Column =
    ColumnBridge.toColumn(HyperplaneBands(ColumnBridge.toExpression(vec), bands, bitsPerBand, seed))
  def minhash_sig(shingles: Column, numPerms: Int): Column =
    ColumnBridge.toColumn(MinHashSig(ColumnBridge.toExpression(shingles), numPerms))
}
