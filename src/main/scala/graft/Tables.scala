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
    * via pure NTZ wall-clock arithmetic — micros between the NTZ epoch
    * literal and the value, re-materialized with `timestamp_micros` —
    * which never consults the session zone. The earlier
    * `to_utc_timestamp(ts, 'UTC')` form did NOT do this: NTZ input is
    * first implicitly cast to TimestampType IN THE SESSION ZONE (the
    * function's inputTypes are TimestampType-only) and
    * `to_utc_timestamp(x, 'UTC')` is then an identity on the instant,
    * so a session at Asia/Tokyo silently shifted every instant by 9 h
    * (verified empirically; TimeOpsSpec pins the fix under a non-UTC
    * session zone). The nanos-long branch is epoch-based to begin with.
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      // integer `div` keeps full 64-bit precision (a double division
      // would round at the 2^53 mantissa limit for nano-scale epochs)
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", expr(
        "timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
