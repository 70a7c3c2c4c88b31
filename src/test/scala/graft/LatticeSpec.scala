package graft

import graft.functions.Lattice
import org.apache.spark.sql.functions._

/** The house floor lattice (VERDICT r15 #2): `floor(x·10^d + 0.5)/10^d`
  * must map every ±ε residue — and −0.0 itself — to +0.0, pass NULL
  * through, and agree with round() away from half boundaries.
  */
class LatticeSpec extends SparkSpec {
  import spark.implicits._

  private def one(x: java.lang.Double, digits: Int): java.lang.Double = {
    val df = Seq(Option(x).map(_.doubleValue)).toDF("x")
    val r = df.select(Lattice.quantize(col("x"), digits).as("q")).collect()(0)
    if (r.isNullAt(0)) null else r.getDouble(0)
  }

  test("±ε residues and -0.0 all close to POSITIVE zero") {
    for (x <- Seq(1e-15, -1e-15, 8.9e-15, -8.9e-15, 0.0, -0.0)) {
      val q = one(x, 4)
      assert(q === 0.0)
      assert(java.lang.Double.doubleToRawLongBits(q) === 0L,
        s"lattice($x) must be +0.0, got bits of $q")
    }
  }

  test("NULL passes through (when()-guarded closings keep their NULL)") {
    assert(one(null, 6) === null)
  }

  test("agrees with round() off half boundaries, both signs") {
    for (x <- Seq(1.2345678, -1.2345678, 0.654321, -0.654321, 123.456789))
      for (d <- Seq(4, 6)) {
        val viaRound = BigDecimal(x)
          .setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(one(x, d) === viaRound, s"x=$x d=$d")
      }
  }

  test("negative exact halves round toward +inf (floor semantics, " +
    "consistently on both legs by construction)") {
    // -0.25 is exactly representable: round-half-up-away gives -0.3,
    // the lattice gives -0.2 — documented divergence, applied to BOTH
    // engine and oracle legs identically
    assert(one(-0.25, 1) === -0.2)
    assert(one(0.25, 1) === 0.3)
  }
}
