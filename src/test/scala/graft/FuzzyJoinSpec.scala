package graft

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("editDistanceJoin: equality, substitution, insertion, and " +
    "deletion all match at distance <= 1; distance-2 pairs and NULLs " +
    "are excluded; each true pair appears exactly once") {
    val left = Seq(
      (1L, "smith"), (2L, "jones"), (3L, "brown"),
      (4L, null.asInstanceOf[String])).toDF("lid", "lname")
    val right = Seq(
      (11L, "smith"),   // equal -> 0
      (12L, "smyth"),   // substitution -> 1
      (13L, "smiths"),  // insertion -> 1
      (14L, "smit"),    // deletion -> 1
      (15L, "smythe"),  // distance 2 -> excluded
      (16L, "jones"),   // equal -> 0
      (17L, null.asInstanceOf[String])).toDF("rid", "rname")
    val out = FuzzyJoin.editDistanceJoin(left, "lname", right, "rname")
      .select("lid", "rid", "edit_distance")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out === Map(
      (1L, 11L) -> 0, (1L, 12L) -> 1, (1L, 13L) -> 1, (1L, 14L) -> 1,
      (2L, 16L) -> 0))
  }

  test("editDistanceJoin: empty strings are safe (no descending " +
    "sequence) and match each other at distance 0; column collisions " +
    "rejected") {
    val left = Seq((1L, ""), (2L, "a")).toDF("lid", "lname")
    val right = Seq((11L, ""), (12L, "b")).toDF("rid", "rname")
    val out = FuzzyJoin.editDistanceJoin(left, "lname", right, "rname")
      .select("lid", "rid", "edit_distance")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // "" ~ "" (0), "a" ~ "" (1 deletion), "" ~ "b" (1), "a" ~ "b" (1 sub)
    assert(out === Map(
      (1L, 11L) -> 0, (2L, 11L) -> 1, (1L, 12L) -> 1, (2L, 12L) -> 1))
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(left, "lname",
        right.withColumnRenamed("rid", "lid"), "rname")
    }
  }

  test("editDistanceJoin: duplicate input rows keep their multiplicity " +
    "(candidate dedup is value-level, never row-level)") {
    val left = Seq((1L, "smith"), (2L, "smith")).toDF("lid", "lname")
    val right = Seq((11L, "smyth")).toDF("rid", "rname")
    val out = FuzzyJoin.editDistanceJoin(left, "lname", right, "rname")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 11L), (2L, 11L)),
      "both identical left rows must produce their own linkage row")
  }

  test("editDistanceJoin completeness: equals the quadratic levenshtein " +
    "join on a randomized corpus of near-identical strings") {
    val rnd = new scala.util.Random(5)
    val base = (1 to 120).map(i => s"name${i % 40}x${rnd.nextInt(3)}")
    val left = base.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("lid", "lname")
    val right = base.zipWithIndex.map { case (s, i) =>
      // random single-char mutation half the time
      val t = if (rnd.nextBoolean() && s.nonEmpty) {
        val p = rnd.nextInt(s.length)
        s.substring(0, p) + ('a' + rnd.nextInt(26)).toChar + s.substring(p + 1)
      } else s
      (1000L + i, t)
    }.toDF("rid", "rname")
    val blocked = FuzzyJoin.editDistanceJoin(left, "lname", right, "rname")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.crossJoin(right)
      .filter(org.apache.spark.sql.functions.levenshtein(
        org.apache.spark.sql.functions.col("lname"),
        org.apache.spark.sql.functions.col("rname")) <= 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(blocked === naive)
    assert(naive.nonEmpty)
  }
}
