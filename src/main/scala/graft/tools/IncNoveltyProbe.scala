package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for simhashDedupBatch's probe-vs-state asymmetry:
  * a FIXED 500-doc batch is admitted against signature states of
  * 1x/4x/16x/64x the sf0.1 corpus (id-shifted + token-salted copies
  * so signatures differ), timing the per-batch wall-clock. The claim
  * under test: batch cost grows with band-key MATCHES, not with the
  * state (only batch bands drive the pigeonhole join). Feeds
  * SCALE.md.
  */
object IncNoveltyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    val n = docs.count()
    val batch = docs.filter(col("doc_id") % 10 === 0).limit(500)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    for (mult <- Seq(1, 4, 16, 64)) {
      val state = (0 until mult).map(i =>
        docs.select((col("doc_id") + lit(i.toLong * n)).as("doc_id"),
          concat(col("text"), lit(s" salt$i")).as("text")))
        .reduce(_ unionByName _)
      val dir = java.nio.file.Files
        .createTempDirectory(s"incnov$mult").toString + "/state"
      graft.streaming.StreamingOps.simhashDedupBatch(
        state, 0L, "doc_id", "text", dir)
      val t0 = System.nanoTime()
      graft.streaming.StreamingOps.simhashDedupBatch(
        batch, 1L, "doc_id", "text", dir)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[incnov] state=${mult * n}%8d sigs  batch=500  ${dt}%6.2f s")
    }
    spark.stop()
  }
}
