package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q239 item-item CF build at a given SF
  * dir — pins WHERE the wall-clock goes (incidence build, basket cap,
  * pair generation + count, floored downstream) so "add a floor"
  * class fixes target the real bottleneck. Feeds SCALE.md.
  */
object CfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cfprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val baskets = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("__u"), col("l_partkey").as("__i"))
    val ui = baskets.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("incidence distinct")(println(s"  rows=${ui.count()}"))
    val small = ui.groupBy("__u").agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= 60).select("__u")
    val kept = ui.join(small, Seq("__u"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("basket cap semi-join")(println(s"  rows=${kept.count()}"))
    val cooc = kept.select(col("__u"), col("__i").as("__ia"))
      .join(kept.select(col("__u"), col("__i").as("__ib")), "__u")
      .filter(col("__ia") < col("__ib"))
      .groupBy("__ia", "__ib").agg(count(lit(1)).as("__c"))
    timed("pair count (no floor)")(println(s"  pairs=${cooc.count()}"))
    timed("pair count (floor >= 2)")(
      println(s"  pairs=${cooc.filter(col("__c") >= 2).count()}"))
    timed("full itemSimilarity") {
      graft.operators.AnalyticsOps.itemSimilarity(
        baskets, "__u", "__i", k = 5, maxBasket = 60, minCooc = 2L)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
