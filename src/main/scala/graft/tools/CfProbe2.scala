package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 A/B probe for the q239/q246 wall-clock: isolates the
  * single-split scan segment (the sf fixture is ONE parquet row
  * group, so everything up to the first exchange is one task),
  * repartition-after-scan, packed pair keys, and the q246 holdout
  * tail stage by stage. Findings (sf0.1, warm): repartition after the
  * scan LOSES (the serial segment is only ~0.6 s), packed-long pair
  * keys LOSE (~+0.35 s vs the 2-col key), so the q239 chain is kept
  * as-is; q246's overhang is its own persists + eval tail. Feeds
  * SCALE.md.
  */
object CfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r1 = f
      val t1 = System.nanoTime(); val r2 = f
      val t2 = System.nanoTime()
      println(f"[cf2] $label%-34s cold=${(t1 - t0) / 1e9}%.2f warm=${(t2 - t1) / 1e9}%.2f rows=$r1%d/$r2%d")
    }

    def basketsTs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("__u"), col("l_partkey").as("__i"),
        col("o_orderdate").as("__ts"))

    val rows = basketsTs
      .select(col("__u"), col("__i"), to_date(col("__ts")).as("__day"))
      .persist()
    timed("rows persist")(rows.count())
    val daySpan = rows.agg(min("__day").as("__d0"), max("__day").as("__d1"))
      .select(expr(
        "date_add(__d0, CAST(floor(datediff(__d1, __d0) * 0.5) AS INT))")
        .as("__split"))
    val tagged = rows.crossJoin(broadcast(daySpan))
    val train = tagged.filter(col("__day") <= col("__split"))
      .select("__u", "__i").distinct().persist()
    val test = tagged.filter(col("__day") > col("__split"))
      .select("__u", "__i").distinct().persist()
    timed("train distinct")(train.count())
    timed("test distinct")(test.count())
    val sims = graft.operators.AnalyticsOps.itemSimilarity(
      train, "__u", "__i", k = 5, maxBasket = 60, minCooc = 2L,
      assumeDistinct = true).persist()
    timed("itemSimilarity(train)")(sims.count())
    val cand = train
      .join(sims.select(col("item").as("__i"),
        col("similar_item").as("__c")), "__i")
      .select(col("__u"), col("__c")).distinct()
      .join(train.select(col("__u"), col("__i").as("__c")),
        Seq("__u", "__c"), "left_anti")
    timed("cand build")(cand.count())
    val evalUsers = train.select("__u").distinct()
      .join(test.select("__u").distinct(), Seq("__u"), "left_semi")
    timed("evalUsers")(evalUsers.count())
    val candOfEval = cand.join(evalUsers, Seq("__u"), "left_semi")
    timed("candOfEval + hits")(
      candOfEval.join(test.select(col("__u"), col("__i").as("__c")),
        Seq("__u", "__c"), "left_semi").select("__u").distinct().count())
    spark.stop()
  }
}
