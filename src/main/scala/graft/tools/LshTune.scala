package graft.tools

import graft.Tables
import graft.dedup.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter probe for the banded cosine-LSH scale path (not part of
  * the driver contract): recall of lshCosinePairsBanded vs the exact
  * quadratic baseline per SF, for candidate (bands, bitsPerBand).
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val thresh = 0.45
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      val exact = NearDup.cosineDupPairs(emb, "vec_id", "embedding", thresh)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((bands, bits) <- Seq((64, 6), (96, 6), (128, 6), (128, 5))) {
        val t0 = System.nanoTime()
        val got = NearDup.lshCosinePairsBanded(emb, "vec_id", "embedding", thresh, bands, bits)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val missed = exact -- got
        println(f"[lshtune] $sf exact=${exact.size} B=$bands r=$bits got=${got.size} " +
          f"missed=${missed.size} extras=${(got -- exact).size} ${secs}%.1fs")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
