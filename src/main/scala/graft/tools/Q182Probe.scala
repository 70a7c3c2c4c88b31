package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q182 (entity clusters): deletion-neighborhood
  * explode, candidate equi-join, levenshtein verify, re-join, CC.
  */
object Q182Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r1 = f
      val t1 = System.nanoTime(); val r2 = f
      println(f"[q182] $label%-30s cold=${(t1 - t0) / 1e9}%.2f warm=${(t2(t1)) }%.2f rows=$r1%d")
      def t2(t1: Long) = (System.nanoTime() - t1) / 1e9
    }
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"))
    val ents = p.select(col("p_partkey").cast("long").as("id"),
        col("p_name").as("name"))
      .unionByName(p.filter(col("p_partkey") % 5 === 0)
        .select((col("p_partkey") + 1000000L).cast("long").as("id"),
          concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)"))
            .as("name")))
    timed("ents")(ents.count())
    def delN(s: org.apache.spark.sql.Column) =
      when(length(s) === 0, array(s)).otherwise(
        array_union(array(s),
          array_distinct(transform(sequence(lit(1), length(s)),
            i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))))
    val lv = ents.select(col("name").as("__lv")).filter(col("__lv").isNotNull)
      .distinct().withColumn("__k", explode(delN(col("__lv"))))
    timed("neighborhood explode")(lv.count())
    val rv = lv.select(col("__lv").as("__rv"), col("__k"))
    val candKeys = lv.join(rv, "__k").select("__lv", "__rv")
    timed("key join raw")(candKeys.count())
    val cand = candKeys.distinct()
      .withColumn("ed", levenshtein(col("__lv"), col("__rv")))
      .filter(col("ed") <= 1)
    timed("cand distinct+lev")(cand.count())
    val pairs = graft.operators.FuzzyJoin.editDistanceJoin(
        ents.select(col("id").as("id_a"), col("name").as("name_a")), "name_a",
        ents.select(col("id").as("id_b"), col("name").as("name_b")), "name_b")
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    timed("full editDistanceJoin")(pairs.count())
    val labels = graft.pipelines.CorpusPipeline.minLabelComponents(
      ents.select(col("id").as("node")), pairs)
    timed("minLabelComponents")(labels.count())
    spark.stop()
  }
}
