package graft.tools

import graft.pipelines.CorpusPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the DISTRIBUTED connected-components path
  * (pointer-jumping fixpoint): synthetic graphs well above the 100k-edge
  * driver-union-find gate, with topologies chosen to stress the two
  * convergence regimes —
  *  - long chains: worst-case diameter, rounds ≈ log2(chain length)
  *    (pointer jumping halves the distance-to-root each round);
  *  - big stars: diameter 2, converges in O(1) rounds regardless of
  *    degree (the skew shape: one hub key carries the whole component).
  *
  * Correctness is asserted structurally at full scale (every chain
  * node's label must be its chain's head; every star leaf its hub),
  * then rounds × wall are tabled for SCALE.md.
  *
  * Usage: runMain graft.tools.CcProbe
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** chains: ids [0, nChains*len), chain c = [c*len, (c+1)*len). */
    def chainEdges(nChains: Int, len: Int): DataFrame =
      spark.range(nChains.toLong * len)
        .filter(col("id") % len =!= (len - 1))
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))

    /** stars: hub h*(leaves+1), its leaves the next `leaves` ids. */
    def starEdges(nStars: Int, leaves: Int): DataFrame = {
      val span = leaves + 1
      spark.range(nStars.toLong * span)
        .filter(col("id") % span =!= 0)
        .select((col("id") - col("id") % span).as("id_a"), col("id").as("id_b"))
    }

    def run(name: String, edges: DataFrame, expectLabel: org.apache.spark.sql.Column): Unit = {
      val e = edges.localCheckpoint() // materialize the generator out of the timing
      val nEdges = e.count()
      val nodes = e.select(col("id_a").as("node"))
        .unionByName(e.select(col("id_b").as("node"))).distinct()
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (labels, rounds) = CorpusPipeline.minLabelComponentsWithRounds(nodes, e)
      val wrong = labels.filter(col("label") =!= expectLabel).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nComp = labels.select("label").distinct().count()
      println(f"[ccprobe] $name%-28s edges=$nEdges%8d rounds=$rounds%2d " +
        f"components=$nComp%7d wrong=$wrong%d wall=$sec%.1f s")
      assert(wrong == 0, s"$name: $wrong nodes mislabeled")
    }

    // every graph is >100k edges => distributed fixpoint path
    run("chains 128 x 2048",  chainEdges(128, 2048),
      col("node") - col("node") % 2048)
    run("chain 1 x 262144",   chainEdges(1, 262144), lit(0L))
    run("stars 32 x 8191",    starEdges(32, 8191),
      col("node") - col("node") % 8192)
    run("mixed chains+stars",
      chainEdges(64, 2048).unionByName(
        starEdges(16, 8191).select(
          (col("id_a") + 10000000L).as("id_a"), (col("id_b") + 10000000L).as("id_b"))),
      when(col("node") >= 10000000L,
        (col("node") - 10000000L) - (col("node") - 10000000L) % 8192 + 10000000L)
        .otherwise(col("node") - col("node") % 2048))
    spark.stop()
  }
}
