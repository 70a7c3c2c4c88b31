package graft.state

import graft.similarity.KmeansInt8
import graft.text.{Bpe, Classify}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet persistence for the engine's trained artifacts — the
  * train-once / apply-everywhere contract a production pipeline needs
  * (tokenize tomorrow's crawl with TODAY's vocabulary; assign new
  * embeddings to LAST WEEK's cells; score with the classifier the
  * quality team signed off). Every model here is small relational
  * state (merge lists, centroid tables, count logs), so plain parquet
  * frames ARE the serialization format: versionable, diffable,
  * readable by any engine — the same philosophy as the incremental
  * dedup stores, with the same deterministic layouts.
  *
  * Loading round-trips exactly: the specs assert loaded models
  * reproduce the original's outputs bit-for-bit (counts, cells,
  * scores), which holds because every model apply-path is exact
  * integer/fixed-order arithmetic over these frames.
  */
object ModelStore {

  // ---- BPE ----------------------------------------------------------

  def saveBpe(model: Bpe.BpeModel, dir: String): Unit = {
    model.merges.write.mode("overwrite").parquet(s"$dir/merges")
    model.vocabSegs.write.mode("overwrite").parquet(s"$dir/vocab")
  }

  def loadBpe(spark: SparkSession, dir: String): Bpe.BpeModel =
    Bpe.BpeModel(
      spark.read.parquet(s"$dir/merges"),
      spark.read.parquet(s"$dir/vocab"))

  // ---- int8 k-means -------------------------------------------------

  /** Centroids stored long-format (cell, dim, value) — stable under
    * dimension growth and trivially diffable across trainings.
    */
  def saveKmeans(model: KmeansInt8.Model, spark: SparkSession,
                 dir: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.flatMap { case (c, cell) =>
      c.zipWithIndex.map { case (v, dim) => (cell, dim, v) }
    }.toDF("cell", "dim", "value")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def loadKmeans(spark: SparkSession, dir: String): KmeansInt8.Model = {
    val rows = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    require(rows.nonEmpty, s"no centroids at $dir")
    val k = rows.map(_._1).max + 1
    val dims = rows.map(_._2).max + 1
    val cents = Array.fill(k)(new Array[Long](dims))
    rows.foreach { case (cell, dim, v) => cents(cell)(dim) = v }
    KmeansInt8.Model(k, dims, cents.toIndexedSeq)
  }

  // ---- Naive Bayes --------------------------------------------------

  def saveNb(model: Classify.NbModel, dir: String): Unit = {
    model.classes.write.mode("overwrite").parquet(s"$dir/classes")
    model.tokenLogs.write.mode("overwrite").parquet(s"$dir/token_logs")
  }

  def loadNb(spark: SparkSession, dir: String): Classify.NbModel =
    Classify.NbModel(
      spark.read.parquet(s"$dir/classes"),
      spark.read.parquet(s"$dir/token_logs"))
}
