package graft.tools

import graft.Tables
import graft.pipelines.CorpusPipeline
import graft.similarity.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of the incremental SEMANTIC dedup scaling claim:
  * per-batch admission cost against a growing corpus state.
  *
  * The corpus int8 state is grown 1×–64× by replicating the corpus
  * half of `embeddings` under shifted ids with IDENTICAL code arrays —
  * cosine ignores ids, so the fixed batch's admission DECISIONS are
  * the same at every scale; only the state size (and the band-collision
  * population) varies. The state is localCheckpointed first (standing
  * in for the stored parquet state of a daily-increment driver), so
  * the operator treats it as caller-cached and only the admission
  * itself is timed.
  *
  * Two band parameterizations are probed, because OR-amplified LSH
  * cost is a CORPUS-SHAPE knob (see lshCosinePairsBanded's scaladoc):
  *  - (96, 6): the q88/q92 full-recall setting for the near-uniform
  *    synthetic embeddings. Near-orthogonal pairs collide in ≥1 band
  *    with p ≈ 1-(1-2^-6)^96 ≈ 0.78 — candidate verification is
  *    expected to grow with state size on THIS distribution (the cost
  *    is the workload: near-uniform data is LSH's worst case).
  *  - (24, 16): the selective setting a clustered real corpus would
  *    run — near-orthogonal collision p ≈ 24·2^-16 ≈ 4e-4, so
  *    candidates (and admission cost) stay near-flat as the state
  *    grows, while pairs at cosine ≥ ~0.9 (true near-dups) still
  *    collide with high probability.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.SemIncProbe [reps...]
  */
object SemIncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps  = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16, 64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs   = Tables.embeddings(spark, sfDir)
    val corpus = embs.filter(col("vec_id") % 2 === 0)
    val batch  = embs.filter(col("vec_id") % 2 === 1).localCheckpoint()
    val nBatch = batch.count()
    val state  = Ann.quantizeInt8(corpus, "vec_id", "embedding")

    for ((bands, bits) <- Seq((96, 6), (24, 16)); n <- reps) {
      val grown = (0 until n).map { k =>
        state.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          col("scale"), col("qvec"))
      }.reduce(_ unionByName _).localCheckpoint()
      val nState = grown.count()
      def run(): Long = {
        val (admitted, _, release) = CorpusPipeline.incrementalSemanticDedupManaged(
          grown, batch, "vec_id", "embedding", threshold = 0.45,
          bands = bands, bitsPerBand = bits)
        try {
          admitted.write.mode("overwrite").format("noop").save()
          admitted.count()
        } finally release()
      }
      val nAdmitted = run() // warm (JVM/codegen); decisions scale-invariant
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[semincprobe] bands=($bands%d,$bits%d) state=$n%dx " +
        f"stateRows=$nState%d batchRows=$nBatch%d admitted=$nAdmitted%d time=$sec%.2f s")
      grown.unpersist(blocking = false)
    }
    spark.stop()
  }
}
