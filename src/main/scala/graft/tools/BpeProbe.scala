package graft.tools

import graft.Tables
import graft.similarity.{Ann, KmeansInt8}
import graft.text.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the BPE / k-means scale claims (SCALE.md):
  * the merge loop and the Lloyd loop are histogram- / codebook-sized,
  * so their wall time should be FLAT across scale factors while only
  * the corpus-sized stages (word histogram, token-count application,
  * cell assignment) grow. Prints one table row per SF.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println("sf      docs   histo_s  train20_s  counts_s  kmfit_s  kmassign_s")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = Tables.documents(spark, d).persist()
      val nDocs = docs.count()

      val (_, tHisto) = timed(
        Bpe.wordHistogram(docs, "text").agg(count(lit(1))).collect())
      val (model, tTrain) = timed(Bpe.train(docs, "text", 20))
      val (_, tCounts) = timed(
        Bpe.tokenCounts(docs, "doc_id", "text", model)
          .write.mode("overwrite").format("noop").save())

      val emb = Tables.embeddings(spark, d)
      val codes = Ann.quantizeInt8(emb, "vec_id", "embedding").persist()
      codes.count()
      val (km, tFit) = timed(KmeansInt8.fit(codes, "vec_id", "qvec", 8, 3))
      val (_, tAssign) = timed(
        KmeansInt8.assign(codes, "vec_id", "qvec", km)
          .write.mode("overwrite").format("noop").save())

      println(f"$sf%-7s $nDocs%6d   $tHisto%6.2f   $tTrain%7.2f   $tCounts%6.2f   $tFit%5.2f   $tAssign%8.2f")
      docs.unpersist(blocking = false)
      codes.unpersist(blocking = false)
    }
    spark.stop()
  }
}
