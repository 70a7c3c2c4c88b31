package graft.tools
import graft.Tables
import graft.pipelines.CorpusPipeline
import graft.similarity.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of q92's dedupBeforeVerify knob at bench shape (sf0.1,
  * min-of-3 after warm), plus a stage-level split of the winning
  * setting (Q75Probe methodology). */
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = Tables.embeddings(spark, d)
    val corpus = embs.filter(col("vec_id") % 2 === 0)
    val batch  = embs.filter(col("vec_id") % 2 === 1)
    for (dbv <- Seq(true, false)) {
      def run(): Long = {
        val state = Ann.quantizeInt8(corpus, "vec_id", "embedding")
        val (admitted, _, release) = CorpusPipeline.incrementalSemanticDedupManaged(
          state, batch, "vec_id", "embedding", threshold = 0.45,
          dedupBeforeVerify = dbv)
        try {
          val out = batch.select("vec_id")
            .join(admitted.select("vec_id"), Seq("vec_id"), "left_anti")
            .localCheckpoint()
          out.count()
        } finally release()
      }
      val n = run() // warm
      val sec = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q92probe] dedupBeforeVerify=$dbv rejected=$n time=$sec%.2f s")
    }
    // stage split at the winning setting
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q92probe] stage $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val state = t("quantize corpus")(
      Ann.quantizeInt8(corpus, "vec_id", "embedding").localCheckpoint())
    val (admitted, _, release) = t("manage (eager stages)")(
      CorpusPipeline.incrementalSemanticDedupManaged(
        state, batch, "vec_id", "embedding", threshold = 0.45))
    t("final write")(batch.select("vec_id")
      .join(admitted.select("vec_id"), Seq("vec_id"), "left_anti")
      .write.mode("overwrite").format("noop").save())
    t("release")(release())
    spark.stop()
  }
}
