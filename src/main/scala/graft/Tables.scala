package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All engine code is path-parameterised so the same
  * query runs at any scale factor.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  /** The driver-generated events table stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects; read it
    * as nano-count long (legacy conf) and convert to a microsecond
    * TimestampType column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div` keeps full 64-bit precision (a double division would
    // round at the 2^53 mantissa limit for nano-scale epochs)
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
