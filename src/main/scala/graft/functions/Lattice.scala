package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** The house floor lattice: `floor(x·10^d + 0.5) / 10^d`.
  *
  * A fixed IEEE-754 expression (multiply, add, floor, divide — all
  * correctly rounded) that BOTH engines evaluate bit-identically on
  * the same input double, where `round(x, d)` is engine-implemented
  * and drifts across engines/releases on two axes the gate hashes:
  *
  *  - signed zero: a cancellation residue ±1e-15 (degenerate fits,
  *    differences of near-equal sums, KL of near-identical
  *    distributions) closes to +0.0 under one engine's round() and
  *    −0.0 under another's — the round-15 q290 driver red. The
  *    lattice maps every ±ε (and −0.0 itself) to +0.0: floor(±ε·10^d
  *    + 0.5) = floor(0.5 ± ε') = 0, and 0/10^d = +0.0.
  *  - half boundary: round() half-up vs banker's vs multiply-based
  *    implementations disagree on boundary-adjacent doubles (the
  *    round-9 driver reds). floor of the scaled double has no such
  *    freedom.
  *
  * Contract: the argument must be FINITE-or-NULL. Spark's
  * `floor(double)` returns BIGINT, so a NaN argument becomes 0L here
  * but stays NaN in DuckDB — callers quantizing a `sqrt`/ratio must
  * keep the existing `when(denominator > 0, …)` guards (NULL passes
  * through the lattice unchanged, exactly as through round()).
  * |x|·10^d must stay under 2^63 (every quantized closing in this
  * engine is a statistic orders of magnitude inside that).
  */
object Lattice {
  def quantize(c: Column, digits: Int): Column = {
    require(digits >= 0 && digits <= 12, s"digits out of range: $digits")
    val s = math.pow(10d, digits.toDouble)
    floor(c * lit(s) + lit(0.5d)) / lit(s)
  }

  /** 6-decimal lattice — the default statistic quantizer. */
  def e6(c: Column): Column = quantize(c, 6)

  /** 4-decimal lattice — the display-score quantizer. */
  def e4(c: Column): Column = quantize(c, 4)
}
