package graft.tools
import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
/** Consumer driver: streaming dedup + watermarked stream-stream join
  * over file drops, printed from memory sinks.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streamdemo").toFile
    Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:00:30"), (2L, "2024-01-01 00:01:00"))
      .toDF("id", "s").selectExpr("id", "cast(s as timestamp) as ts")
      .write.json(dir + "/in")
    val schema = StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType)))
    val deduped = StreamingOps.streamingDedup(
      spark.readStream.schema(schema).json(dir + "/in"), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("demo_dedup").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    println("=== streaming dedup (3 rows in, dup of id=1 dropped) ===")
    spark.table("demo_dedup").orderBy("id").show(false)
    spark.stop()
  }
}
