package graft.tools

import graft.Tables
import graft.pipelines.CorpusPipeline
import org.apache.spark.sql.SparkSession

/** Consumer driver: full corpus curation on the sf0.01 documents
  * table, printing the per-stage attrition report.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val (out, report) = CorpusPipeline.curate(
      docs, langs = Seq("en"),
      gates = CorpusPipeline.QualityGates(
        minTokens = 10, minAlphaRatio = 0.3, maxPunctRatio = 0.5, minStopwordRatio = 0.0),
      tokenBudgetOpt = Some(20000L),
      // round-8 stages: CCNet LM gate (self-trained reference) +
      // embedding-space semantic dedup
      lmOpt = Some((docs, 10000.0)),
      semanticOpt = Some(CorpusPipeline.SemanticDedup(
        embs, "vec_id", "embedding", 0.45)))
    Seq("input", "after_quality", "after_lang", "after_lm",
      "after_exact_dedup", "after_near_dedup", "after_semantic_dedup",
      "final").foreach(k => println(f"$k%-22s ${report(k)}"))
    println("sample keeper ids: " +
      out.select("doc_id").limit(5).collect().map(_.getLong(0)).mkString(", "))
    spark.stop()
  }
}
