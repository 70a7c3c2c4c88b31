package graft.pipelines

import graft.operators.ColumnOps
import graft.state.Watermark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Twilio conversations ETL (SURVEY §3.3;
  * af2_dags/dependencies/pandas_etl/twilio_conversations_etl.py):
  * the pandas layer's dataframe-style cleanup as Spark expressions.
  * The watermark decides full-history vs one-day incremental; the
  * token-dance/202-retry export loop is a connector concern outside
  * the engine.
  */
object TwilioPipeline {

  /** Final column contract (FINAL_COLS, etl.py:164-165). */
  val FinalCols: Seq[(String, String)] = Seq(
    "conversation_id" -> "conversation_id",
    "date" -> "conversation_date",
    "kind" -> "kind",
    "abandoned" -> "abandoned",
    "phone" -> "phone")

  /** Cleanup chain (etl.py:152-165):
    *  - `set_col_b_based_on_col_a_val`: Abandoned=="Yes" → kind="Abandoned"
    *  - drop the helper column
    *  - phone cast to string
    *  - all-null normalization (empty string → NULL across columns)
    *  - rename to FINAL_COLS
    */
  def transform(raw: DataFrame): DataFrame = {
    val kinded = ColumnOps.setColBBasedOnColA(raw, "abandoned", "Yes", "kind", "Abandoned")
    val phoned = kinded.withColumn("phone", col("phone").cast(StringType))
    // exact-match nulling per the reference's applymap (etl.py:160:
    // `None if x == '' or x == 'nan' else x`) — NO trim, so a
    // whitespace-only value survives; one projection, not a
    // per-column withColumn fold
    val nulled = phoned.select(phoned.columns.map { c =>
      val s = col(c).cast(StringType)
      when(s === "" || s === "nan", lit(null)).otherwise(col(c)).as(c)
    }: _*)
    ColumnOps.renameFields(nulled, FinalCols)
      .select(FinalCols.map { case (_, n) => col(n) }: _*)
  }

  /** Incremental window decision (etl.py:88-98): no prior successful
    * run → full history; otherwise resume from the watermark.
    */
  def runWindow(logPath: String, nowUnix: Long): (Long, Long) = {
    val last = Watermark.lastSuccessfulRun(logPath, default = 0L)
    if (last.currentRun == 0L) (0L, nowUnix) else (last.currentRun, nowUnix)
  }
}
