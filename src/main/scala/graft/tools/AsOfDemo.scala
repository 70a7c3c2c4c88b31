package graft.tools
import graft.plans.AsOfJoin
import org.apache.spark.sql.SparkSession
/** Consumer driver: the as-of join operator on trades/quotes-shaped
  * data, plus its physical plan.
  */
object AsOfDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val statusUpdates = Seq(
      (101L, 1000L, "open"), (101L, 2000L, "in progress"), (101L, 3000L, "closed"),
      (202L, 1500L, "open")).toDF("ticket", "ut", "status")
    val probes = Seq((101L, 2500L), (101L, 500L), (202L, 9999L), (303L, 100L))
      .toDF("ticket", "pt")
    val joined = AsOfJoin.asofJoin(probes, statusUpdates, Seq("ticket"), "pt", "ut")
    println("=== status as-of each probe instant ===")
    joined.orderBy("ticket", "pt").show(false)
    println(joined.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("AsOfJoin") || l.contains("Exchange") || l.contains("Sort"))
      .mkString("\n"))
    spark.stop()
  }
}
