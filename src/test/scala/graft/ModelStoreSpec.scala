package graft

import graft.similarity.{Ann, KmeansInt8}
import graft.state.ModelStore
import graft.text.{Bpe, Classify}
import org.apache.spark.sql.functions._

class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    tempDir(prefix).toString

  test("BPE model round-trips: loaded model reproduces token counts " +
    "and fertility bit-for-bit") {
    val docs = Seq((1L, "en", "low lower lowest low"),
      (2L, "de", "slow slower")).toDF("doc_id", "lang", "text")
    val model = Bpe.train(docs, "text", 6)
    val dir = tmp("bpe")
    ModelStore.saveBpe(model, dir)
    val loaded = ModelStore.loadBpe(spark, dir)
    assert(loaded.merges.orderBy("rank").collect().toSeq ===
      model.merges.orderBy("rank").collect().toSeq)
    val want = Bpe.tokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Bpe.tokenCounts(docs, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("k-means model round-trips: loaded centroids assign every " +
    "vector to the same cell at the same distance") {
    val rnd = new scala.util.Random(5)
    val emb = (1L to 80L).map(id =>
      (id, Seq.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val codes = Ann.quantizeInt8(emb, "vec_id", "embedding")
    val model = KmeansInt8.fit(codes, "vec_id", "qvec", k = 4, iters = 2)
    val dir = tmp("km")
    ModelStore.saveKmeans(model, spark, dir)
    val loaded = ModelStore.loadKmeans(spark, dir)
    assert(loaded.k === model.k && loaded.dims === model.dims)
    assert(loaded.centroids.map(_.toSeq) === model.centroids.map(_.toSeq))
    val want = KmeansInt8.assign(codes, "vec_id", "qvec", model)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val got = KmeansInt8.assign(codes, "vec_id", "qvec", loaded)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("NB model round-trips: loaded model scores identically, " +
    "including prior-only docs") {
    val docs = Seq(
      (1L, "en", "the quick brown fox"),
      (2L, "de", "der schnelle braune fuchs"),
      (3L, "en", "")).toDF("doc_id", "lang", "text")
    val model = Classify.trainNaiveBayesChar(docs, "lang", "text")
    val dir = tmp("nb")
    ModelStore.saveNb(model, dir)
    val loaded = ModelStore.loadNb(spark, dir)
    val want = Classify.scoreNaiveBayesChar(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    val got = Classify.scoreNaiveBayesChar(docs, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got === want)
  }
}
