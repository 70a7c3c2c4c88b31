package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // hot-key fixture: 90% of fact rows share key 1
  private def fact = ((1 to 900).map(i => (1L, i.toLong)) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong)))
    .toDF("k", "v")
  private def dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
    .toDF("k", "name")

  test("saltedJoin equals the plain join for every supported join type") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain  = fact.join(dim, Seq("k"), jt)
      val salted = SkewOps.saltedJoin(fact, dim, Seq("k"), saltFactor = 8, joinType = jt)
      assert(salted.columns.toSeq === plain.columns.toSeq, jt)
      val p = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val s = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(s === p, s"row multiset mismatch for $jt")
    }
  }

  test("hot key spreads across salts; dim side replicated saltFactor times") {
    val n = 8
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(fact.columns.map(col): _*), lit(n)).cast("int"))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    assert(salts > n / 2, s"900 distinct hot-key rows must land in most of $n salts, got $salts")
    // and the replicated dim is exactly saltFactor copies per key
    val joined = SkewOps.saltedJoin(fact, dim, Seq("k"), saltFactor = n)
    assert(joined.count() === fact.join(dim, Seq("k")).count())
  }

  test("saltedJoin works when the skewed side carries a MapType column " +
    "(unhashable for xxhash64 - excluded from the salt)") {
    import org.apache.spark.sql.functions._
    val facts = Seq(("hot", 1), ("hot", 2), ("k3", 3)).toDF("key", "v")
      .withColumn("props", map(lit("a"), col("v")))
    val dim = Seq(("hot", "H"), ("k3", "C")).toDF("key", "tag")
    val out = SkewOps.saltedJoin(facts, dim, Seq("key"), saltFactor = 4)
    assert(out.count() === 3)
    assert(out.columns.contains("props"))
  }

  test("unsupported join types and degenerate salt factors are rejected") {
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(fact, dim, Seq("k"), joinType = "full")
    }
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(fact, dim, Seq("k"), saltFactor = 0)
    }
  }
}
