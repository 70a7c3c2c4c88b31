package graft.tools

import graft.Tables
import graft.dedup.NearDup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the banded cosine-LSH candidate pipeline: distinct
  * BEFORE the verify joins (one full-candidate-set shuffle, each pair
  * verified once) vs verify FIRST and distinct only the survivors
  * (no big shuffle; a pair colliding in k bands pays k cosines —
  * expected k ≈ 1.5 for non-dup collisions at 6-bit bands). Asserts
  * both produce identical pair sets.
  */
object CosineLshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.embeddings(spark, sfDir)
    val (idCol, vecCol, threshold, bands, bits, seed) =
      ("vec_id", "embedding", 0.45, 96, 6, 42L)

    // the probe must exercise the REAL operator — an inline copy would
    // keep validating a snapshot after the operator changes
    def pipeline(distinctFirst: Boolean): DataFrame =
      NearDup.lshCosinePairsBanded(df, idCol, vecCol, threshold,
        bands, bits, seed, dedupBeforeVerify = distinctFirst)

    def time(name: String, f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cosprobe] $name $s%.2f s"); s
    }
    // equality first
    val d1 = pipeline(true).collect().toSet
    val d2 = pipeline(false).collect().toSet
    assert(d1 == d2, s"pair sets differ: ${d1.size} vs ${d2.size}")
    println(s"[cosprobe] pair sets identical, n=${d1.size}")
    // warm then min-of-2 each
    for (variant <- Seq(true, false)) {
      val label = if (variant) "distinct-first" else "verify-first"
      time(s"$label warm", pipeline(variant).write.mode("overwrite").format("noop").save())
      val best = (1 to 2).map(_ => time(label,
        pipeline(variant).write.mode("overwrite").format("noop").save())).min
      println(f"[cosprobe] $label best=$best%.2f s")
    }
    spark.stop()
  }
}
