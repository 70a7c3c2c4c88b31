package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic dataset splitting / sampling for training pipelines.
  *
  * Random sampling (`df.sample`) is seed- and partitioning-dependent —
  * unacceptable for reproducible train/val/test assignment at 100 TB
  * (a re-run or repartition would reshuffle membership). These ops
  * hash a stable key instead: assignment is a pure function of the
  * row key, identical on any cluster layout, any engine.
  */
object SplitOps {

  /** Uniform [0, 2^32) value from the md5 of the key — portable across
    * engines (md5 is everywhere; xxhash64 is Spark-specific).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10).cast(LongType)

  /** Keep a deterministic `fraction` of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < (fraction * 4294967296.0).toLong)

  /** Assign train/val/test (or any named splits) by hash percentile.
    * `splits` are (name, weight) — weights normalised internally.
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)] = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
                  outCol: String = "split"): DataFrame = {
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val b = hashBucket(col(keyCol)).cast(DoubleType) / 4294967296.0
    val assignment = splits.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, assignment)
  }
}
