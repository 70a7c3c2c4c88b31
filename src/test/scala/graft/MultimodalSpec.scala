package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def jpegish(n: Int, seed: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    val r = new scala.util.Random(seed)
    r.nextBytes(b)
    b(0) = 0xFF.toByte; b(1) = 0xD8.toByte
    b
  }

  test("withImageMeta: format sniff + size + stable hash") {
    val df = Seq(
      (1L, jpegish(1000, 1)),
      (2L, Array[Byte](0x89.toByte, 'P'.toByte, 1, 2, 3, 4, 5, 6)),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "img")
    val out = Multimodal.withImageMeta(df, "img").select("id", "meta.*")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("format") === "jpeg")
    assert(out(0).getAs[Long]("n_bytes") === 1000L)
    assert(out(0).getAs[Int]("width") >= 64)
    assert(out(1).getAs[String]("format") === "png")
    assert(out(2).getAs[String]("format") === "unknown")
    assert(out(2).getAs[Long]("n_bytes") === 0L)
  }

  test("extractFeatures: partition-batched, deterministic, declared schema") {
    val df = Seq((1L, jpegish(500, 7)), (2L, jpegish(500, 8))).toDF("id", "img")
      .repartition(2)
    val feats = Multimodal.extractFeatures(df, "id", "img", dim = 16)
    assert(feats.schema.fieldNames.toSeq === Seq("id", "features"))
    val rows = feats.orderBy("id").as[(Long, Array[Float])].collect()
    assert(rows.forall(_._2.length === 16))
    // determinism: same bytes => same features
    val again = Multimodal.extractFeatures(df, "id", "img", dim = 16)
      .orderBy("id").as[(Long, Array[Float])].collect()
    assert(rows.map(_._2.toSeq).toSeq === again.map(_._2.toSeq).toSeq)
    // different bytes => different features
    assert(rows(0)._2.toSeq !== rows(1)._2.toSeq)
  }

  test("sampleFrames: chunk explosion with stride") {
    val df = Seq((1L, Array.tabulate(100)(_.toByte))).toDF("id", "video")
    val frames = Multimodal.sampleFrames(df, "id", "video", frameBytes = 10, everyNth = 2)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.length === 5, "10 chunks, every 2nd => 5")
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length === 10))
    // null payload => zero rows, no crash
    val empty = Multimodal.sampleFrames(
      Seq((2L, null.asInstanceOf[Array[Byte]])).toDF("id", "video"),
      "id", "video", 10, 2)
    assert(empty.count() === 0)
  }

  test("resizeImages: target-geometry payload, deterministic, NULL kept") {
    val img = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val df = Seq((1L, img), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "image")
    val out = Multimodal.resizeImages(df, "id", "image", w = 4, h = 4)
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[Array[Byte]]("resized").length === 4 * 4 * 3)
    assert(r1.getInt(2) === 4 && r1.getInt(3) === 4)
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeImages(df, "id", "image", 4, 4)
      .orderBy("id").collect()(0).getAs[Array[Byte]]("resized")
    assert(java.util.Arrays.equals(r1.getAs[Array[Byte]]("resized"), again))
    // NULL payload: row kept, NULL fields
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
