package graft.tools
import org.apache.spark.sql.SparkSession
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = "bm_" + System.currentTimeMillis
    graft.sources.Sinks.writeBucketedMaster(
      (1L to 100000L).map(i => (i, s"v$i")).toDF("id", "v"), t + "_a", "id", 16)
    val incoming = Seq((5L, "NEW"), (999999L, "ADD")).toDF("id", "v")
    graft.tables.ScaleJoins.mergeIntoBucketedMaster(spark, t + "_a", t + "_b", incoming, "id", 16)
    println("rows after merge: " + spark.table(t + "_b").count())
    println("id=5 -> " + spark.table(t + "_b").filter($"id" === 5).select("v").as[String].head())
    println("salted join: " + graft.operators.SkewOps.saltedJoin(
      (1 to 10000).map(i => ("hot", i)).toDF("key", "v"),
      Seq(("hot", "H")).toDF("key", "tag"), Seq("key"), 8).count() + " rows")
    spark.stop()
  }
}
