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
  /** The events table's `ts` physical type has varied across driver
    * testdata generations — parquet TIMESTAMP(NANOS) (unreadable by
    * Spark's vectorized reader: loaded as nano-count long via the
    * legacy conf), TIMESTAMP(MICROS) without UTC adjustment (loaded as
    * TIMESTAMP_NTZ), or a plain instant. Normalize all three to a
    * microsecond TimestampType column so every downstream query and
    * spec sees one shape; the session timezone is UTC everywhere
    * (Bench/Verify/specs), so the NTZ wall clock and the instant agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType regardless of
    * which physical form it was read in. Works on batch and streaming
    * frames alike (schema-only dispatch, no action). Every branch is
    * SESSION-TIMEZONE-INDEPENDENT: the NTZ wall clock is pinned to UTC
    * explicitly (a bare cast would interpret it in the session zone,
    * silently shifting every instant in a session that forgot to set
    * spark.sql.session.timeZone=UTC), and the nanos-long branch is
    * epoch-based to begin with.
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      // integer `div` keeps full 64-bit precision (a double division
      // would round at the 2^53 mantissa limit for nano-scale epochs)
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", expr("to_utc_timestamp(ts, 'UTC')"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
