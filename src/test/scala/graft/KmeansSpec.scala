package graft

import graft.similarity.KmeansInt8
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  /** Independent in-JVM Lloyd reference with the engine's exact
    * contract: md5-order seeding, integer squared distance, lower-cell
    * tie-break, floor(Σ/n) centroid update, empty cells keep the
    * previous centroid.
    */
  private def refKmeans(points: Map[Long, Array[Long]], k: Int, iters: Int)
      : Map[Long, (Int, Long)] = {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val seeds = points.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(k)
    var cents: IndexedSeq[Array[Long]] = seeds.map(points(_).clone()).toIndexedSeq
    def assign(): Map[Long, (Int, Long)] = points.map { case (id, v) =>
      val scored = cents.zipWithIndex.map { case (c, j) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }
      val best = scored.min
      id -> ((best._2, best._1))
    }
    for (_ <- 1 to iters) {
      val a = assign()
      val next = cents.map(_.clone()).toArray
      a.groupBy(_._2._1).foreach { case (cell, members) =>
        val vs = members.keys.map(points(_)).toSeq
        val d = vs.head.length
        next(cell) = Array.tabulate(d) { j =>
          math.floor(vs.map(_(j)).sum.toDouble / vs.size).toLong
        }
      }
      cents = next.toIndexedSeq
    }
    assign()
  }

  private def codesDf(points: Map[Long, Array[Long]]) =
    points.toSeq.map { case (id, v) => (id, v.map(_.toInt).toSeq) }
      .toDF("id", "qv")

  test("fit+assign equals the independent reference on a seeded random " +
    "fixture (assignments AND distances)") {
    val rnd = new scala.util.Random(7)
    val points = (1L to 120L).map { id =>
      id -> Array.fill(8)((rnd.nextInt(255) - 127).toLong)
    }.toMap
    val model = KmeansInt8.fit(codesDf(points), "id", "qv", k = 5, iters = 3)
    val got = KmeansInt8.assign(codesDf(points), "id", "qv", model)
      .as[(Long, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === refKmeans(points, 5, 3))
  }

  test("well-separated blobs: members co-cluster and blobs separate") {
    // blob A around +100, blob B around -100 in every dim
    val points = ((1L to 20L).map(id => id -> Array.fill(4)(100L + id % 3)) ++
      (21L to 40L).map(id => id -> Array.fill(4)(-100L - id % 3))).toMap
    val model = KmeansInt8.fit(codesDf(points), "id", "qv", k = 2, iters = 4)
    val got = KmeansInt8.assign(codesDf(points), "id", "qv", model)
      .as[(Long, Int, Long)].collect().map(t => t._1 -> t._2).toMap
    val cellsA = (1L to 20L).map(got).toSet
    val cellsB = (21L to 40L).map(got).toSet
    assert(cellsA.size === 1 && cellsB.size === 1 && cellsA != cellsB)
  }

  test("argmin tie-break picks the lower cell id") {
    // with iters = 0 the model is exactly the md5-ordered seeds; a
    // probe equidistant to both seeds must land in cell 0
    val seedsOnly = Map(1L -> Array(0L, 0L), 2L -> Array(4L, 0L))
    val model = KmeansInt8.fit(codesDf(seedsOnly), "id", "qv", k = 2, iters = 0)
    // seeds sorted by (md5("1"), md5("2")) — find which is cell 0
    val probe = Seq((99L, Seq(2, 0))).toDF("id", "qv") // dist 4 to both
    val cell = KmeansInt8.assign(probe, "id", "qv", model)
      .select("cell").as[Int].head()
    assert(cell === 0)
  }

  test("empty cell keeps its previous centroid") {
    // k = 3 over 3 distinct points, two of them identical-adjacent so
    // one centroid ends up memberless after the first update
    val points = Map(
      1L -> Array(0L, 0L), 2L -> Array(1L, 0L), 3L -> Array(100L, 100L))
    val model0 = KmeansInt8.fit(codesDf(points), "id", "qv", k = 3, iters = 0)
    val model1 = KmeansInt8.fit(codesDf(points), "id", "qv", k = 3, iters = 1)
    // every cell still has a centroid of the right dimensionality
    assert(model1.centroids.size === 3)
    assert(model1.centroids.forall(_.length === 2))
    // any cell whose assignment was empty in iteration 1 is unchanged
    val assigned0 = KmeansInt8.assign(codesDf(points), "id", "qv", model0)
      .select("cell").as[Int].collect().toSet
    (0 until 3).filterNot(assigned0).foreach { emptyCell =>
      assert(model1.centroids(emptyCell).toSeq === model0.centroids(emptyCell).toSeq)
    }
  }

  test("ivfKmeansInt8TopK: full probe (nProbe = nCells) equals brute " +
    "force exactly; partial probe is a subset with sane recall") {
    import graft.similarity.Ann
    val rnd = new scala.util.Random(31)
    val emb = (1L to 150L).map { id =>
      (id, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") <= 4)
    val corpus = emb.filter(col("vec_id") > 4)
    val brute = Ann.bruteForceTopK(queries, corpus,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Ann.ivfKmeansInt8TopK(queries, corpus,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 4, iters = 2, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full === brute,
      "probing every cell must reproduce the exact brute-force ranking")
    val partial = Ann.ivfKmeansInt8TopK(queries, corpus,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 4, iters = 2, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brutePairs = brute.map(t => (t._1, t._3))
    val recall = partial.intersect(brutePairs).size.toDouble / brutePairs.size
    assert(recall >= 0.3, s"2/4-probe recall collapsed: $recall")
  }

  test("assign is map-only: no exchange in the assignment plan") {
    val points = (1L to 50L).map(id => id -> Array.fill(4)(id % 7)).toMap
    val model = KmeansInt8.fit(codesDf(points), "id", "qv", k = 3, iters = 1)
    val plan = KmeansInt8.assign(codesDf(points), "id", "qv", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must be a map-only pass against broadcast literals:\n$plan")
  }

  /** Exact int8 L2 top-k reference: the quantization formula + integer
    * squared distance + (dist asc, id asc) rank. */
  private def int8TopKRef(queries: Map[Long, Array[Double]],
                          corpus: Map[Long, Array[Double]],
                          k: Int): Map[(Long, Int), (Long, Long)] = {
    def q8(v: Array[Double]): Array[Long] = {
      val s = v.map(math.abs).max
      v.map(x => if (s == 0) 0L else math.floor(x / s * 127 + 0.5).toLong)
    }
    val qc = queries.map { case (id, v) => id -> q8(v) }
    val cc = corpus.map { case (id, v) => id -> q8(v) }
    qc.flatMap { case (qid, qv) =>
      cc.filter(_._1 != qid).toSeq
        .map { case (cid, cv) =>
          (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }
        .sorted.take(k).zipWithIndex
        .map { case ((d, cid), i) => (qid, i + 1) -> ((cid, d)) }
    }
  }

  test("pqTopK: kSub >= corpus with iters=0 makes every vector its own " +
    "centroid, so PQ-ADC EQUALS exact int8 L2 ranking (the exactness-" +
    "recovery gate); lossy setting is deterministic and layout-invariant") {
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 60L).map(id =>
      id -> Array.fill(8)(rnd.nextDouble() * 2 - 1)).toMap
    val queries = (101L to 103L).map(id =>
      id -> Array.fill(8)(rnd.nextDouble() * 2 - 1)).toMap
    def df(m: Map[Long, Array[Double]]) =
      m.toSeq.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding")
    val exact = graft.similarity.Ann.pqTopK(
      df(queries), df(corpus), "vec_id", "embedding", "vec_id", "embedding",
      k = 5, m = 4, kSub = 60, iters = 0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(exact === int8TopKRef(queries, corpus, 5))
    // lossy codebook: still deterministic under repartitioning
    val lossy1 = graft.similarity.Ann.pqTopK(
      df(queries), df(corpus), "vec_id", "embedding", "vec_id", "embedding",
      k = 5, m = 4, kSub = 8, iters = 2).collect().map(_.toSeq).toSet
    val lossy2 = graft.similarity.Ann.pqTopK(
      df(queries), df(corpus).repartition(13),
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, m = 4, kSub = 8, iters = 2).collect().map(_.toSeq).toSet
    assert(lossy1 === lossy2)
    assert(lossy1.size === queries.size * 5)
  }

  test("ivfPqTopK: full probe + per-vector residual codebooks cancel " +
    "the cell centroid, so ADC EQUALS exact int8 L2 ranking; lossy " +
    "setting layout-invariant with probed-fraction candidates") {
    val rnd = new scala.util.Random(23)
    val corpus = (1L to 60L).map(id =>
      id -> Array.fill(8)(rnd.nextDouble() * 2 - 1)).toMap
    val queries = (101L to 103L).map(id =>
      id -> Array.fill(8)(rnd.nextDouble() * 2 - 1)).toMap
    def df(m: Map[Long, Array[Double]]) =
      m.toSeq.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding")
    // d((q - c), (x - c)) = d(q, x): the residual subtraction cancels
    // inside every subspace distance when the codebook is exact
    val exact = graft.similarity.Ann.ivfPqTopK(
      df(queries), df(corpus), "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 4, coarseIters = 1, nProbe = 4,
      m = 4, kSub = 60, pqIters = 0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(exact === int8TopKRef(queries, corpus, 5))
    val lossy1 = graft.similarity.Ann.ivfPqTopK(
      df(queries), df(corpus), "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 4, coarseIters = 1, nProbe = 2,
      m = 4, kSub = 8, pqIters = 1).collect().map(_.toSeq).toSet
    val lossy2 = graft.similarity.Ann.ivfPqTopK(
      df(queries), df(corpus).repartition(13),
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 4, coarseIters = 1, nProbe = 2,
      m = 4, kSub = 8, pqIters = 1).collect().map(_.toSeq).toSet
    assert(lossy1 === lossy2)
    assert(lossy1.nonEmpty)
  }
}
