package graft.tools

import graft.Tables
import graft.expressions.ExprOps
import org.apache.spark.sql.{Column, SparkSession}
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

    // the REAL charNgrams shape: normalization bound once via bind
    def charNgrams(c: Column, n: Int): Column = {
      val norm = trim(regexp_replace(
        regexp_replace(lower(c), "[^\\p{L}\\p{N}\\s]", ""), "\\s+", " "))
      ExprOps.bind(coalesce(norm, lit(""))) { s =>
        when(length(s) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(s) - n + 1),
            i => s.substr(i, lit(n))))
      }
    }

    val grams = docs.select(col("doc_id"), col("lang"),
      explode(charNgrams(col("text"), 3)).as("w"))
    for (r <- 1 to 2)
      time(s"explode+count run$r")(grams.agg(count(lit(1))).collect())
    for (r <- 1 to 2)
      time(s"explode+hash+docagg run$r")(
        grams.groupBy(col("doc_id"), xxhash64(col("w")).as("h"))
          .agg(count(lit(1))).agg(count(lit(1))).collect())

    var model: graft.text.Classify.NbModel = null
    for (r <- 1 to 2)
      model = time(s"train run$r")(
        graft.text.Classify.trainNaiveBayesChar(docs, "lang", "text",
          minPairCount = 3))
    println("[scratch] model rows = " + model.tokenLogs.count())

    for (r <- 1 to 2)
      time(s"score run$r")(
        graft.text.Classify.scoreNaiveBayesChar(docs, "doc_id", "text", model)
          .write.mode("overwrite").format("noop").save())

    // candidate design B: no (doc, gram) pre-aggregation — explode,
    // broadcast-join the (tiny, floored) model, partial-agg straight
    // to (doc, label); then the same dense assembly as scoreNb
    for (r <- 1 to 2) time(s"scoreB run$r") {
      val base = docs.select(col("doc_id"),
        charNgrams(col("text"), 3).as("__t"))
        .select(col("doc_id"), size(col("__t")).as("n_tokens"), col("__t"))
      val occ = base.select(col("doc_id"), explode(col("__t")).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("w_hash"))
      val sparse = occ.join(broadcast(model.tokenLogs), "w_hash")
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("log_c1")).as("__num"))
      val dense = base.drop("__t")
        .crossJoin(broadcast(model.classes))
        .join(sparse, Seq("doc_id", "label"), "left")
        .withColumn("__score", col("log_prior") + coalesce(col("__num"), lit(0.0))
          - col("n_tokens").cast("double") * col("log_denom"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("__score").desc, col("label").asc)
      dense.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("label").as("pred_label"),
          round(col("__score"), 6).as("score"),
          col("n_tokens").cast("long").as("n_tokens"))
        .write.mode("overwrite").format("noop").save()
    }

    // cost of materializing the shared gram frame once (the fusion
    // candidate: train and score both read this cache instead of each
    // re-running the explode)
    for (r <- 1 to 2) time(s"gram frame materialize run$r") {
      val g = grams.select(col("doc_id"), col("lang"),
        xxhash64(col("w")).as("w_hash")).persist()
      g.count()
      g.unpersist(blocking = false)
    }

    for (r <- 1 to 2)
      time(s"full q131 run$r")(
        graft.SparkEntry.queries("q131_charngram_langid")(spark, d)
          .write.mode("overwrite").format("noop").save())

    spark.stop()
  }
}
