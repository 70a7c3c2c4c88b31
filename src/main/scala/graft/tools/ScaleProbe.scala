package graft.tools

import graft.Tables
import graft.dedup.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the sub-quadratic dedup paths: replicate
  * the documents corpus N× with per-replica token suffixes (so replicas
  * share no shingles — duplicate structure stays constant per replica
  * and true pairs scale exactly linearly), then time the MinHash-LSH
  * pipeline. A quadratic path would show ~N² time and cross-replica
  * pair leakage; the banded path should show ~linear time and exactly
  * N× the base pair count.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ScaleProbe [reps...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps  = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (n <- reps) {
      val corpus = (0 until n).map { k =>
        docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1r$k").as("text"))
      }.reduce(_ unionByName _)
      val nDocs = corpus.count()
      val t0 = System.nanoTime()
      val pairs = NearDup.minhashLshPairs(corpus, "doc_id", "text",
        shingleLen = 3, numPerms = 64, bands = 32, threshold = 0.8).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] reps=$n%d docs=$nDocs%d pairs=$pairs%d time=$sec%.2f s")
      // dup-span path (q84): per-replica token suffixes keep spans from
      // crossing replicas, so dup spans scale exactly N× while a
      // healthy run shows ~linear time (hash-keyed agg, no quadratic)
      val t1 = System.nanoTime()
      val spans = graft.pipelines.CorpusPipeline.duplicateSpans(
        corpus, "doc_id", "text", windowTokens = 8, minDocs = 2).count()
      val sec1 = (System.nanoTime() - t1) / 1e9
      println(f"[scaleprobe] reps=$n%d dup_spans=$spans%d span_time=$sec1%.2f s")
      // span REMOVAL path (q91): same replica structure — removed-token
      // totals scale exactly N×, wall should stay ~linear (the covered
      // set is output-proportional and all sorts are per-document)
      val t2 = System.nanoTime()
      val removed = graft.pipelines.CorpusPipeline.removeDuplicateSpans(
          corpus, "doc_id", "text", windowTokens = 8, minDocs = 2)
        .agg(sum("n_removed_tokens")).head().getLong(0)
      val sec2 = (System.nanoTime() - t2) / 1e9
      println(f"[scaleprobe] reps=$n%d removed_tokens=$removed%d removal_time=$sec2%.2f s")
    }
    spark.stop()
  }
}
