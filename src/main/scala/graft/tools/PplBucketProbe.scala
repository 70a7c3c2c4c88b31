package graft.tools

import graft.Tables
import graft.pipelines.CorpusPipeline
import graft.text.NgramLm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling check for the CCNet bucket path (q99): corpus
  * grown 1×–8× with the LmProbe replication (disjoint per-replica
  * vocabularies — rows AND model size grow exactly n×), then the FULL
  * train + score + bucket pipeline timed, plus the size of the
  * threshold-side frames the operator claims are small: the
  * (group, ppl) histogram (≤ one row per scored doc, typically far
  * fewer) and the per-group threshold table (#groups rows). Linear
  * wall and #groups-sized thresholds are the claim; a super-linear
  * curve would point at the histogram cumsum degenerating.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PplBucketProbe [reps...]
  */
object PplBucketProbe {
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
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")

    for (n <- reps) {
      val grown = (0 until n).map { k =>
        docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          col("lang"),
          regexp_replace(col("text"), "(\\S+)", s"$$1r$k").as("text"))
      }.reduce(_ unionByName _).localCheckpoint()
      val nDocs = grown.count()
      def run(): Long = {
        val lm = NgramLm.trainBigramLm(grown, "text")
        val out = CorpusPipeline.perplexityBuckets(
          grown, "doc_id", "text", "lang", lm)
        out.write.mode("overwrite").format("noop").save()
        out.count()
      }
      val bucketed = run() // warm
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      // threshold-side frame sizes at this scale
      val lm = NgramLm.trainBigramLm(grown, "text")
      val scored = NgramLm.scorePerplexity(grown, "doc_id", "text", lm)
        .join(grown.select("doc_id", "lang"), "doc_id")
      val histRows = scored.groupBy("lang", "ppl").count().count()
      val nGroups = scored.select("lang").distinct().count()
      println(f"[pplprobe] corpus=$n%dx docs=$nDocs%d bucketed=$bucketed%d " +
        f"hist_rows=$histRows%d groups=$nGroups%d time=$sec%.2f s")
      grown.unpersist(blocking = false)
    }
    spark.stop()
  }
}
