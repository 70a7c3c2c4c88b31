package graft.tools

import graft.Tables
import graft.dedup.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of the incremental-dedup scaling claim: per-batch
  * admission cost is BATCH-sized, with the growing corpus signature
  * state contributing only its band keys to the probe join.
  *
  * The corpus signature state is grown 1×–64× by replicating the
  * corpus half of `documents` with per-replica token suffixes (replicas
  * share no shingles, so the admission decisions for the fixed batch
  * are identical at every scale — only the state size varies). The
  * state is materialized first (localCheckpoint standing in for the
  * stored parquet partitions of `incrementalDedupStream`), then the
  * fixed batch is admitted and ONLY that is timed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.IncrementalProbe [reps...]
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps  = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8, 32, 64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs   = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") < 250)
    val batch  = docs.filter(col("doc_id") >= 250).localCheckpoint()
    val nBatch = batch.count()

    for (n <- reps) {
      val grown = (0 until n).map { k =>
        corpus.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1r$k").as("text"))
      }.reduce(_ unionByName _)
      val sigs  = NearDup.minhashSignatures(grown, "doc_id", "text").localCheckpoint()
      val nSigs = sigs.count()
      // warm + timed run, bench-shape (noop sink); managed form so each
      // run's cached intermediates are released — a leak here would
      // distort the very scaling curve being measured
      def run(): Unit = {
        val (admitted, _, release) = NearDup.incrementalDedupManaged(
          sigs, batch, "doc_id", "text", threshold = 0.8)
        try admitted.write.mode("overwrite").format("noop").save()
        finally release()
      }
      // warm once (JVM/codegen), then min-of-2 timed FULL executions —
      // with per-run cache release each timed run honestly re-executes
      // the whole admission pipeline (the old single timed run read the
      // warm run's leaked caches and under-reported)
      run()
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[incprobe] state=$n%dx sigRows=$nSigs%d batchRows=$nBatch%d time=$sec%.2f s")
    }
    spark.stop()
  }
}
