package graft.tools
import graft.Tables
import graft.dedup.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val corpus = docs.filter(col("doc_id") < 2500)
    val batch  = docs.filter(col("doc_id") >= 2500)
    val sigs = t("corpus sigs build+count") {
      val s = NearDup.minhashSignatures(corpus, "doc_id", "text"); s.count(); s
    }
    t("incrementalDedup full") {
      val (admitted, _) = NearDup.incrementalDedup(sigs, batch, "doc_id", "text", threshold = 0.8)
      admitted.count()
    }
    // stage splits
    val inSigs = t("batch sigs") {
      val s = NearDup.minhashSignatures(batch, "doc_id", "text").repartition(col("doc_id")); s.count(); s }
    val inBands = NearDup.lshBands(inSigs, "doc_id", "__sig", 16, 64)
    val cBands = NearDup.lshBands(sigs, "doc_id", "__sig", 16, 64)
    val vs = t("vsCorpus cands+verify") {
      val v = inBands.select(col("band"), col("band_hash"), col("doc_id").as("id_new"))
        .join(cBands.select(col("band"), col("band_hash"), col("doc_id").as("id_old")), Seq("band","band_hash"))
        .select("id_new","id_old").distinct()
        .join(inSigs.select(col("doc_id").as("id_new"), col("__sig").as("__sn")), "id_new")
        .join(sigs.select(col("doc_id").as("id_old"), col("__sig").as("__so")), "id_old")
        .filter(NearDup.sigJaccardEst(col("__sn"), col("__so")) >= 0.8)
        .select(col("id_new")).distinct()
      println("  vsCorpus rows " + v.count()); v }
    val surv = inSigs.join(vs.withColumnRenamed("id_new","doc_id"), Seq("doc_id"), "left_anti").repartition(col("doc_id"))
    val selfC = t("selfCands") {
      val c = NearDup.lshCandidatePairs(NearDup.lshBands(surv, "doc_id", "__sig", 16, 64), "doc_id")
      println("  cands " + c.count()); c }
    val selfPairs = t("selfPairs verify") {
      val p = selfC.join(surv.select(col("doc_id").as("id_a"), col("__sig").as("__sa")), "id_a")
        .join(surv.select(col("doc_id").as("id_b"), col("__sig").as("__sb")), "id_b")
        .filter(NearDup.sigJaccardEst(col("__sa"), col("__sb")) >= 0.8)
        .select("id_a","id_b").repartition(col("id_a"))
      println("  pairs " + p.count()); p }
    t("CC") {
      val nodes = selfPairs.select(col("id_a").as("node")).unionByName(selfPairs.select(col("id_b").as("node"))).distinct()
      graft.pipelines.CorpusPipeline.minLabelComponents(nodes, selfPairs).count()
    }
    spark.stop()
  }
}
