package graft.tools

import graft.Tables
import graft.operators.AnalyticsOps
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for two round-9 scale claims (SCALE.md):
  *
  *  1. Winnowing fingerprint DENSITY — Schleimer 2003 proves the
  *     expected selected fraction of gram positions is 2/(w+1); the
  *     posting frame downstream joins scale with this constant, so the
  *     measured density across scale factors and window widths should
  *     sit near the bound and be SF-independent.
  *  2. Poisson-bootstrap cell-frame FLATNESS — the shuffled frame is
  *     #groups × reps cells regardless of corpus size; only the
  *     map-side explode scales with rows.
  *
  * Prints one table row per (sf, setting).
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println("sf      w   grams     fps      density  2/(w+1)  winnow_s")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); w <- Seq(4, 8)) {
      val dir = s"/root/testdata/$sf"
      val docs = Tables.documents(spark, dir)
      val grams = docs
        .select(explode(TextOps.wordNgrams(col("text"), 3)).as("g")).count()
      val (fps, secs) = timed(
        TextOps.winnowFingerprints(docs, "doc_id", "text", k = 3, w = w)
          .count())
      val density = fps.toDouble / grams
      println(f"$sf%-7s $w%-3d $grams%-9d $fps%-8d $density%.4f   ${2.0 / (w + 1)}%.4f   $secs%.2f")
    }

    println()
    println("sf      events   cells  bootstrap_s")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val ev = Tables.events(spark, dir)
      val n = ev.count()
      val (cells, secs) = timed {
        val out = AnalyticsOps.bootstrapCiMean(
          ev, "event_type", "event_id", "value", reps = 64)
        // cells = n_groups x reps (bounded); count the report's reps sum
        out.agg(sum("n_reps")).head().getLong(0)
      }
      println(f"$sf%-7s $n%-8d $cells%-6d $secs%.2f")
    }
    spark.stop()
  }
}
