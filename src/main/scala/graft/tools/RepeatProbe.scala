package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-scale probe for the round-13 window-hash index family
  * (q311 repeatSpectrum, q313 memorizationScreen, q314
  * spanDedupBatch): wall time and output mass at sf0.001/0.01/0.1.
  * The design claim to check is near-linear growth — every stage is
  * a map-side explode plus 8/12-byte-key aggregates, so a 100×
  * corpus should cost ~100× (same flatness contract the LSH and
  * incremental-state probes pin in SCALE.md). Prints one line per
  * (sf, operator).
  */
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = graft.Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val (specRows, tSpec) = time {
        graft.pipelines.CorpusPipeline.repeatSpectrum(
          docs, "doc_id", "text", "source").count()
      }
      val (memRows, tMem) = time {
        graft.pipelines.CorpusPipeline.memorizationScreen(
          docs, "doc_id", "text", col("doc_id") % 31 === 0).count()
      }
      val (spanRows, tSpan) = time {
        val tmp = java.nio.file.Files.createTempDirectory("rprobe")
        val state = tmp.toString + "/state"
        val mx = docs.agg(max("doc_id")).head().getLong(0)
        Seq(col("doc_id") <= mx / 2, col("doc_id") > mx / 2)
          .zipWithIndex.foreach { case (p, b) =>
            graft.streaming.StreamingOps.spanDedupBatch(
              docs.filter(p), b.toLong, "doc_id", "text", state, 16)
          }
        val n = graft.streaming.StreamingOps
          .noveltyFromSpanState(spark, state).count()
        graft.TempTrees.deleteQuietly(tmp)
        n
      }
      println(f"$sf%-8s repeatSpectrum rows=$specRows%4d t=$tSpec%6.2fs  " +
        f"memScreen rows=$memRows%5d t=$tMem%6.2fs  " +
        f"spanAdmit rows=$spanRows%6d t=$tSpan%6.2fs")
    }
    spark.stop()
  }
}
