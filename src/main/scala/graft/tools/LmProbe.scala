package graft.tools

import graft.Tables
import graft.text.NgramLm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling check for the bigram-LM train+score path (q93):
  * corpus grown 1×–8× by replication with per-replica token suffixes
  * (replicas share no vocabulary, so BOTH the row count and the model
  * size — distinct unigrams/bigrams — grow exactly n×; same-text
  * replication would only grow counts). Train on the grown corpus,
  * score the grown corpus, time the full train+score+noop pipeline.
  * Linear growth (no quadratic term, no driver-side blowup beyond the
  * O(1) (N, V) scalar) is the claim; a super-linear curve would
  * indicate the model join degenerating.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.LmProbe [reps...]
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps  = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    for (n <- reps) {
      val grown = (0 until n).map { k =>
        docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1r$k").as("text"))
      }.reduce(_ unionByName _).localCheckpoint()
      val nDocs = grown.count()
      def run(): Long = {
        val lm = NgramLm.trainBigramLm(grown, "text")
        val out = NgramLm.scorePerplexity(grown, "doc_id", "text", lm)
        out.write.mode("overwrite").format("noop").save()
        out.count()
      }
      val scored = run() // warm
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[lmprobe] corpus=$n%dx docs=$nDocs%d scored=$scored%d time=$sec%.2f s")
      grown.unpersist(blocking = false)
    }
    spark.stop()
  }
}
