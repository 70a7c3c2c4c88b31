package graft.tools

import graft.Tables
import graft.dedup.NearDup
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, d)
    val shingled = docs.select(col("doc_id"),
      TextOps.wordShingles(col("text"), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
    time("shingles only")(shingled.write.mode("overwrite").format("noop").save())

    val sigOnly = shingled
      .select(col("doc_id"), NearDup.minhashSignature(col("__sh"), 64).as("__sig"))
    time("signatures")(sigOnly.write.mode("overwrite").format("noop").save())

    val sigR = sigOnly.repartition(col("doc_id"))
    val bands = NearDup.lshBands(sigR, "doc_id", "__sig", 32, 64)
    time("bands")(bands.write.mode("overwrite").format("noop").save())
    val cands = NearDup.lshCandidatePairs(bands, "doc_id")
    println("[scratch] n_cands=" + time("cand pairs")(cands.count()))
    val full = NearDup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 32, 0.8)
    println("[scratch] n_pairs=" + time("full pipeline")(full.count()))
    spark.stop()
  }
}
