package graft

import graft.operators.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mortonZ interleaves bits: x on even, y on odd positions") {
    val out = Seq((3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L),
      (1L << 30, 0L), (0L, 1L << 30))
      .toDF("x", "y")
      .withColumn("z", LayoutOps.mortonZ(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((3L, 5L)) === 39L)   // 0b100111
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)    // x bit 0 -> z bit 0
    assert(out((0L, 1L)) === 2L)    // y bit 0 -> z bit 1
    assert(out((1L << 30, 0L)) === (1L << 60))
    assert(out((0L, 1L << 30)) === (1L << 61))
  }

  test("zOrderBuckets balances to ±1 row and is deterministic") {
    val df = (0 until 10).map(i => (i.toLong, (9 - i).toLong, i.toLong))
      .toDF("x", "y", "id")
    val sizes = LayoutOps.zOrderBuckets(df, "x", "y", "id", buckets = 4)
      .groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ((rk-1)*4) div 10 over rk = 1..10 -> bucket sizes 3,2,3,2
    assert(sizes === Map(0L -> 3L, 1L -> 2L, 2L -> 3L, 3L -> 2L))
  }

  test("zone map: on a 32x32 grid with 16 files, every Z-ordered file " +
    "is an aligned 8x8 quad-block — tight in BOTH dimensions") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong, (x * 32 + y).toLong))
      .toDF("x", "y", "id")
    val stats = LayoutOps.zOrderLayoutStats(grid, "x", "y", "id", buckets = 16)
      .collect()
    assert(stats.length === 16)
    stats.foreach { r =>
      assert(r.getLong(1) === 64L) // 1024 cells / 16 files
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      // power-of-4 alignment: each file is exactly one 8x8 block, so a
      // point predicate on EITHER dimension prunes 3/4 of the files
      // (a 1-D sort would leave one dimension spanning 0..31)
      assert(maxX - minX === 7L, s"x span in $r")
      assert(maxY - minY === 7L, s"y span in $r")
      assert(minX % 8 === 0L && minY % 8 === 0L)
    }
  }

  test("zoneMapPruning: natural order prunes nothing, the x-sort " +
    "prunes every non-matching x range, and z-order prunes on both") {
    // 64 rows whose ingestion (tie) order is a permutation of x, so
    // natural files span nearly the whole x domain
    val rows = (0 until 64).map { i =>
      (((i * 29) % 64).toLong, (i % 8).toLong, i.toLong)
    }.toDF("x", "y", "id")
    val out = LayoutOps.zoneMapPruning(rows, "x", "y", "id", buckets = 4,
      xLo = 0L, xHi = 15L, yLo = 0L, yHi = 3L).collect()
    val skipped = out.groupBy(_.getString(0)).view
      .mapValues(rs => (rs.map(_.getLong(7)).sum, rs.map(_.getLong(2)).sum))
      .toMap
    assert(skipped("natural") === ((0L, 64L))) // every file overlaps
    assert(skipped("xsort") === ((3L, 64L))) // only x in 0..15 survives
    assert(skipped("zorder")._1 >= 2L) // prunes in both dimensions
    assert(skipped("zorder")._2 === 64L)
  }

  test("hilbert index: bijective on the 16x16 grid, every consecutive " +
    "pair of curve positions is a UNIT step in the plane (the " +
    "property Z-order lacks), known order-1 corners, out-of-domain " +
    "is NULL") {
    import spark.implicits._
    val cells = (for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val d = LayoutOps.withHilbertIndex(cells, "x", "y", order = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.map(_._3).toSet === (0L until 256L).toSet, "bijection")
    val path = d.sortBy(_._3)
    path.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) === 1L,
        s"curve jump between $a and $b")
    }
    // order-1 quadrant walk: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    val tiny = LayoutOps.withHilbertIndex(
      Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y"),
      "x", "y", order = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tiny === Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L))
    val oob = LayoutOps.withHilbertIndex(
      Seq((16L, 0L), (-1L, 3L)).toDF("x", "y"), "x", "y", order = 4)
      .collect()
    assert(oob.forall(_.isNullAt(2)))
  }
}
