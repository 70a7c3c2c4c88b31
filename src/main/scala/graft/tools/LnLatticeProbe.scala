package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The RETIRED uncast half of the ln-lattice probe pair (VERDICT r13
  * task #2). Through round 13 `zz_probe_ln_lattice` ran in the oracle
  * suite DELIBERATELY uncast — its engine leg emits `floor(ln(k)·1e12)`
  * as LONG while the DuckDB oracle's bare `floor()` returns DOUBLE —
  * to measure whether the driver's result hash is sensitive to the
  * column TYPE independent of the values. The r13 driver artifact
  * answered it: the uncast row hashed red while its `_cast` twin
  * (both legs BIGINT, still in [[graft.queries.ProbeQueries]]) hashed
  * green on identical values ⇒ the driver hash is type-sensitive and
  * no libm/value skew ever existed. Question settled, the
  * permanently-red row retired here so the correctness headline stays
  * clean and a future genuine red on that row cannot be masked.
  *
  * Run manually to reproduce the engine leg; compare against the SQL
  * below in any DuckDB:
  *
  * {{{
  * SELECT CAST(x AS BIGINT) AS k,
  *   floor(ln(CAST(x AS DOUBLE)) * 1e12) AS ln_e12   -- DOUBLE, uncast
  * FROM generate_series(2, 20) g(x)
  * }}}
  */
object LnLatticeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2L, 21L).select(col("id").as("k"),
        floor(log(col("id").cast(DoubleType)) * lit(1e12d)).as("ln_e12"))
      .show(20, truncate = false)
    spark.stop()
  }
}
