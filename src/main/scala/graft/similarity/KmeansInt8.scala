package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Deterministic Lloyd's k-means (MacQueen 1967 / Lloyd 1982) over
  * int8-quantized embedding codes — the cross-engine-EXACT clustering
  * the curation stack composes with: cluster-balanced sampling
  * (diversity caps per semantic region, the SemDeDup-paper
  * preprocessing), cluster profiling, and a verifiable alternative to
  * the MLlib coarse quantizer in [[Ann.ivfKmeansTopK]] (whose
  * parallel init + float reassociation make its centroids
  * non-reproducible across engines, which is why its oracle can only
  * check recall, not assignments).
  *
  * Every arithmetic step here is exact and engine-portable, so the
  * DuckDB oracle (q158) replays the SAME iterations and matches
  * assignments row-for-row:
  * - codes are the q89 int8 quantization (bit-exact cross-engine by
  *   the shared floor(x/scale·127+0.5) double formula);
  * - distances are INTEGER sums of squared differences (≤ 254²·dims —
  *   no float, no reassociation);
  * - argmin ties break on the lower cell id;
  * - seeding is the k rows with the smallest (md5(id), id) — the
  *   engine's established portable-hash-order convention, a pure
  *   function of the id set;
  * - centroid update is floor(Σ/n) per dimension, computed as ONE
  *   double division of exact integer operands (exact while
  *   |Σ| < 2⁵², i.e. up to ~3·10¹⁰ members per cell at full int8
  *   range); empty cells keep their previous centroid.
  *
  * Scale shape: the corpus participates only in (a) one map-only
  * assignment pass per iteration — k·dims integer ops per row against
  * BROADCAST centroid literals, no shuffle — and (b) one
  * map-side-combined (cell, dim) aggregation per iteration whose
  * shuffle carries ≤ k·dims·#partitions partial rows. The driver
  * holds k·dims longs (the centroids — the PageRank
  * scalar-per-iteration discipline), never vectors. At 100 TB with
  * k=65k cells and 1024 dims the broadcast is ~0.5 GB — at that scale
  * train on a sample (the standard IVF recipe) and keep the full-pass
  * assignment, which is unchanged.
  */
object KmeansInt8 {

  /** Trained model: `centroids(cell)(dim)`, all exact longs. */
  final case class Model(k: Int, dims: Int, centroids: IndexedSeq[Array[Long]])

  /** Higher-order-function integer L2 against a centroid literal.
    * Deliberately NOT the codegen'd IntSqDist: the k-means paths
    * evaluate k (and in PQ, m·k) instances against SLICED sub-vectors
    * inside one projection, where the inlined codegen loops blow past
    * the JIT method-size budget and deoptimize the stage (measured:
    * q189 2.4 → 4.2-4.5 s at sf0.1 under every converted variant).
    * IntSqDist wins where a projection carries ONE distance per row
    * (all-pairs kNN scans: q306 6.6 → 0.9 s, q225, q208, q269).
    */
  private def sqDist(qv: Column, cent: Array[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(cent.toSeq),
        (a, b) => (a.cast(LongType) - b) * (a.cast(LongType) - b)),
      lit(0L), (acc, x) => acc + x)

  /** (cell, dist) of the nearest centroid as a two-field struct —
    * array_min's struct ordering implements (dist asc, cell asc), so
    * the argmin tie-break is the lower cell id, same as the oracle's
    * ORDER BY dist, cell.
    */
  private def nearest(qv: Column, model: Model): Column =
    array_min(array(model.centroids.zipWithIndex.map { case (c, j) =>
      struct(sqDist(qv, c).as("d"), lit(j).as("c"))
    }: _*))

  /** Fit `iters` Lloyd iterations on `df(idCol, codeCol)` where
    * `codeCol` is an int8 code array (e.g. [[Ann.quantizeInt8]]'s
    * `qvec`). Returns the model; [[assign]] produces the final
    * assignment frame.
    */
  def fit(df: DataFrame, idCol: String, codeCol: String,
          k: Int, iters: Int): Model = {
    require(k >= 1 && k <= 65536, "1 <= k <= 65536")
    require(iters >= 0 && iters <= 1000, "0 <= iters <= 1000")
    val lvl = StorageLevel.MEMORY_AND_DISK
    val codes = df
      .select(col(idCol).as("__id"), col(codeCol).as("__qv"))
      .persist(lvl)
    try {
      val seeds = codes
        .orderBy(md5(col("__id").cast(StringType)), col("__id"))
        .limit(k)
        .select("__qv")
        .collect()
        .map(_.getSeq[Int](0).map(_.toLong).toArray)
      require(seeds.nonEmpty, "empty input")
      val dims = seeds.head.length
      var model = Model(seeds.length, dims, seeds.toIndexedSeq)

      for (_ <- 1 to iters) {
        // one job: per-(cell, dim) exact integer sums + counts,
        // k·dims rows back to the driver
        val grouped = codes
          .withColumn("__cell", nearest(col("__qv"), model).getField("c"))
          .select(col("__cell"), posexplode(col("__qv")).as(Seq("__pos", "__v")))
          .groupBy("__cell", "__pos")
          .agg(sum(col("__v").cast(LongType)).as("__s"), count(lit(1)).as("__n"))
          .collect()
        val next = model.centroids.map(_.clone()).toArray
        grouped.foreach { r =>
          val cell = r.getInt(0); val pos = r.getInt(1)
          val s = r.getLong(2); val n = r.getLong(3)
          next(cell)(pos) = math.floor(s.toDouble / n).toLong
        }
        model = Model(model.k, dims, next.toIndexedSeq)
      }
      model
    } finally codes.unpersist(blocking = false)
  }

  /** The nearest-cell id under a model, as a column over an arbitrary
    * code-vector expression — the building block product quantization
    * ([[Ann.pqTopK]]) composes per subspace.
    */
  def cellOf(vec: Column, model: Model): Column =
    nearest(vec, model).getField("c")

  /** Exact integer squared distance from a code-vector expression to
    * one centroid — exposed for the PQ per-query distance tables.
    */
  def sqDistTo(vec: Column, cent: Array[Long]): Column = sqDist(vec, cent)

  /** Final assignment under a fitted model: map-only, no shuffle —
    * (id, cell, dist).
    */
  def assign(df: DataFrame, idCol: String, codeCol: String,
             model: Model): DataFrame = {
    val n = nearest(col(codeCol), model)
    df.select(col(idCol),
      n.getField("c").as("cell"), n.getField("d").as("dist"))
  }

  /** Convenience: quantize float embeddings (q89 formula), fit, and
    * assign in one call.
    */
  def fitAssignFloat(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): DataFrame = {
    val codes = Ann.quantizeInt8(df, idCol, vecCol)
    val model = fit(codes, idCol, "qvec", k, iters)
    assign(codes, idCol, "qvec", model)
  }
}
