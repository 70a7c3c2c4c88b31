package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). Current
  * target: q131 stage anatomy post-floor — where do the ~7.4 s go?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, d).persist()
    docs.count()

    // baseline: the gram explode + a trivial count
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^\\p{L}\\p{N}\\s]", ""), "\\s+", " "))
    val grams = docs.select(col("doc_id"), col("lang"),
      explode(transform(sequence(lit(1), greatest(length(norm) - 2, lit(0))),
        i => norm.substr(i, lit(3)))).as("w"))
    for (r <- 1 to 2)
      time(s"explode+count run$r")(grams.agg(count(lit(1))).collect())
    time("explode+hash+distinct")(
      grams.select(xxhash64(col("w")).as("h")).distinct().count())

    // train alone (includes its own actions), twice for warm numbers
    var model: graft.text.Classify.NbModel = null
    for (r <- 1 to 2)
      model = time(s"train run$r")(
        graft.text.Classify.trainNaiveBayesChar(docs, "lang", "text",
          minPairCount = 3))
    println("[scratch] model rows = " + model.tokenLogs.count())

    // score alone under the pre-trained model
    for (r <- 1 to 2)
      time(s"score run$r")(
        graft.text.Classify.scoreNaiveBayesChar(docs, "doc_id", "text", model)
          .write.mode("overwrite").format("noop").save())

    // candidate design B: no (doc, gram) pre-aggregation — explode,
    // broadcast-join the model, partial-agg straight to (doc, label)
    for (r <- 1 to 2) time(s"scoreB run$r") {
      val occ = docs.select(col("doc_id"),
        explode(transform(sequence(lit(1), greatest(length(norm) - 2, lit(0))),
          i => norm.substr(i, lit(3)))).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("w_hash"))
      val sparse = occ.join(broadcast(model.tokenLogs), "w_hash")
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("log_c1")).as("__num"))
      sparse.write.mode("overwrite").format("noop").save()
    }

    // full q131 as benched
    for (r <- 1 to 2)
      time(s"full q131 run$r")(
        graft.SparkEntry.queries("q131_charngram_langid")(spark, d)
          .write.mode("overwrite").format("noop").save())

    spark.stop()
  }
}
