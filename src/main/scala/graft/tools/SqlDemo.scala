package graft.tools
import org.apache.spark.sql.SparkSession
/** Consumer driver: a session created with GraftExtensions, queried
  * through plain spark.sql — the SQL-author's view of the engine.
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    graft.GraftExtensions.registerUdfs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    spark.sql("""
      SELECT doc_id,
             graft_text_stats(text).n_tokens AS n_tokens,
             rolling_hash(text) AS fp,
             standardize_parcel('1-X-1-1-1') AS parc
      FROM documents ORDER BY doc_id LIMIT 3""").show(false)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    spark.sql("""
      SELECT a.vec_id, b.vec_id AS other,
             round(cosine_sim(a.embedding, b.embedding), 4) AS cos
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 3""").show(false)
    spark.stop()
  }
}
