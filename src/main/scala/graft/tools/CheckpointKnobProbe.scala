package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost receipt for the round-15 reliable-checkpoint knob
  * (`spark.graft.reliableCheckpoints`, `state.Checkpoints`): the CF
  * surface — the checkpoint-heaviest operator family (itemSimilarity
  * alone cuts lineage twice per run, itemRecHoldout five times) —
  * timed with the default eager localCheckpoint vs the reliable
  * `checkpoint(eager)` into a local checkpoint dir. On a real cluster
  * the reliable path's extra cost is this write+read round-trip
  * against DFS latency instead of local disk, in exchange for
  * executor-loss recovery; the single-JVM number here is its FLOOR.
  * Prints one line per (sf, operator, mode): wall seconds, min-of-3.
  */
object CheckpointKnobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptDir = java.nio.file.Files.createTempDirectory("ckptprobe")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    def timeMin3(f: => Long): (Long, Double) = {
      var rows = 0L
      val walls = (1 to 3).map { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        val t0 = System.nanoTime()
        rows = f
        (System.nanoTime() - t0) / 1e9
      }
      (rows, walls.min)
    }
    try {
      for (sf <- Seq("sf0.01", "sf0.1")) {
        val dir = s"/root/testdata/$sf"
        val ratings = graft.Tables.events(spark, dir)
          .select(col("user_id"), col("event_type").as("item"), col("ts"))
        for (reliable <- Seq(false, true)) {
          spark.conf.set(graft.state.Checkpoints.ReliableFlag,
            reliable.toString)
          val mode = if (reliable) "reliable" else "local"
          val (simRows, tSim) = timeMin3 {
            graft.operators.AnalyticsOps
              .itemSimilarity(ratings, "user_id", "item", k = 5).count()
          }
          val (hoRows, tHo) = timeMin3 {
            graft.operators.AnalyticsOps
              .itemRecHoldout(ratings, "user_id", "item", "ts", k = 5)
              .count()
          }
          println(f"$sf%-7s $mode%-8s itemSimilarity rows=$simRows%4d " +
            f"t=$tSim%6.2fs  recHoldout rows=$hoRows%4d t=$tHo%6.2fs")
        }
      }
    } finally {
      spark.conf.unset(graft.state.Checkpoints.ReliableFlag)
      graft.TempTrees.deleteQuietly(ckptDir)
      spark.stop()
    }
  }
}
