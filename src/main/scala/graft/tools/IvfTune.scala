package graft.tools

import graft.Tables
import graft.similarity.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe per-query recall@10 of ivfKmeansTopK vs brute force per SF
  * (not part of the driver contract).
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); run <- Seq(1); nProbe <- Seq(6, 8)) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      val queries = emb.filter(col("vec_id") < 20)
      val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Ann.ivfKmeansTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 10,
        nCells = 16, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQ = brute.groupBy(_._1).map { case (q, s) =>
        q -> s.count(ivf.contains).toDouble / s.size }
      println(f"[ivftune] $sf probe$nProbe minRecall=${perQ.values.min}%.2f " +
        f"meanRecall=${perQ.values.sum / perQ.size}%.2f n=${perQ.size}")
      emb.unpersist()
    }
    spark.stop()
  }
}
