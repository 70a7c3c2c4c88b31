package graft

import graft.functions.RefFunctions
import graft.text.TextOps
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests for the procedural parity functions (SURVEY §5
  * rebuild-strategy item). Uses ScalaCheck directly (no scalatestplus
  * bridge in the offline cache): each property runs through
  * `SCTest.check` with a fixed seed budget and must pass.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("standardizeParcelNum: output is always 16 chars or 'invalid input'") {
    check("len16", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val out = RefFunctions.standardizeParcelNum(s)
      out == "invalid input" || out.length == 16
    })
  }

  test("standardizeParcelNum: idempotent on valid outputs") {
    val valid16 = for {
      a <- Gen.listOfN(4, Gen.numChar).map(_.mkString)
      b <- Gen.alphaUpperChar.map(_.toString)
      c <- Gen.listOfN(5, Gen.numChar).map(_.mkString)
      d <- Gen.listOfN(4, Gen.numChar).map(_.mkString)
      e <- Gen.listOfN(2, Gen.numChar).map(_.mkString)
    } yield a + b + c + d + e
    check("idempotent", Prop.forAll(valid16) { s =>
      val once = RefFunctions.standardizeParcelNum(s)
      once == "invalid input" || RefFunctions.standardizeParcelNum(once) == once
    })
  }

  test("standardizeParcelNum: hyphenated and 16-char forms agree") {
    val gen = for {
      p1 <- Gen.chooseNum(1, 9999)
      l  <- Gen.alphaUpperChar
      p3 <- Gen.chooseNum(1, 99999)
      p4 <- Gen.chooseNum(0, 9999)
      p5 <- Gen.chooseNum(0, 99)
    } yield (p1, l, p3, p4, p5)
    check("forms agree", Prop.forAll(gen) { case (p1, l, p3, p4, p5) =>
      val full = f"$p1%04d$l$p3%05d$p4%04d$p5%02d"
      val hyph = s"$p1-$l-$p3-$p4-$p5"
      RefFunctions.standardizeParcelNum(hyph) == RefFunctions.standardizeParcelNum(full)
    })
  }

  test("reformatPhone: any 10-digit input formats to NANP shape") {
    check("nanp", Prop.forAll(Gen.listOfN(10, Gen.numChar).map(_.mkString)) { digits =>
      val out = RefFunctions.reformatPhone(digits)
      out != null && out.matches("\\+1 \\(\\d{3}\\) \\d{3}-\\d{4}")
    })
  }

  test("rollingHash: deterministic and within modulus") {
    check("rolling", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = TextOps.rollingHash(s)
      h == TextOps.rollingHash(s) && h >= 0 && h < (1L << 61) - 1
    })
  }

  test("redactPii: never leaves an email address in the output") {
    val email = for {
      u <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
      d <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
    } yield s"$u@$d.com"
    check("email", Prop.forAll(email) { e =>
      !RefFunctions.redactPii(s"contact me at $e please", retainLocation = false).contains("@")
    })
  }

  test("accuracyToDecimals: monotone non-increasing in accuracy") {
    val pair = for {
      a <- Gen.chooseNum(0, 14999); b <- Gen.chooseNum(0, 14999)
    } yield (math.min(a, b), math.max(a, b))
    check("monotone", Prop.forAll(pair) { case (lo, hi) =>
      RefFunctions.accuracyToDecimals(lo) >= RefFunctions.accuracyToDecimals(hi)
    })
  }

  /** Naive O(n²) best-fit reference: linear scan over every open
    * pack — largest fill that still fits, lowest index on ties. The
    * TreeMap walk must match this EXACTLY, pack by pack.
    */
  private def naiveBestFit(costs: Seq[Long],
                           packLen: Long): (Seq[Long], Seq[Long]) = {
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    val nd    = scala.collection.mutable.ArrayBuffer.empty[Long]
    costs.foreach { c =>
      var best = -1
      for (i <- fills.indices)
        if (fills(i) + c <= packLen &&
            (best < 0 || fills(i) > fills(best))) best = i
      if (best < 0) { fills += c; nd += 1L }
      else { fills(best) += c; nd(best) += 1L }
    }
    (fills.toSeq, nd.toSeq)
  }

  test("bestFitFold ≡ naive O(n²) best-fit on random walks, and the " +
    "structural packing invariants always hold") {
    val walk = for {
      packLen <- Gen.chooseNum(1L, 64L)
      n     <- Gen.chooseNum(0, 60)
      costs <- Gen.listOfN(n, Gen.chooseNum(1L, 96L)) // incl. oversize
    } yield (packLen, costs.sortBy(-_)) // the decreasing walk order
    check("bfd", Prop.forAll(walk) { case (packLen, costs) =>
      val (fills, nd) = graft.pipelines.CorpusPipeline
        .bestFitFold(costs.toArray, packLen)
      val (nFills, nNd) = naiveBestFit(costs, packLen)
      val equiv = fills == nFills && nd == nNd
      val conserved = fills.sum == costs.sum && nd.sum == costs.length
      // a pack either respects packLen or is a lone oversize doc
      val capped = fills.indices.forall(i =>
        fills(i) <= packLen || nd(i) == 1L)
      equiv && conserved && capped
    })
  }
}
