package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines.
  *
  * Design: media travel as opaque `binary` columns with a typed
  * metadata struct alongside (format, width/height or sample
  * rate/duration, byte size, content hash). Decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms — the
  * Scala analog of `mapInPandas`: one `mapPartitions` over rows,
  * decoding library invoked per batch inside the partition, schema
  * declared up front.
  *
  * The decode kernels themselves are STUBBED with a deterministic fake
  * (this container ships no image/audio codecs); everything around
  * them — schema, batching, partitioning, null/corrupt handling, the
  * UDF signatures — is real and tested. Swapping in a real codec means
  * replacing `FakeCodec` only.
  */
object Multimodal {

  final case class ImageMeta(format: String, width: Int, height: Int,
                             n_bytes: Long, content_hash: Long)

  /** Deterministic stand-in for an image/audio codec: "decodes"
    * header-like fields from the first bytes and derives stable
    * pseudo-features from a rolling hash. Replace with a real codec
    * binding in production.
    */
  object FakeCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes == null || bytes.length < 2) "unknown"
      else if (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte) "png"
      else if (bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte) "wav"
      else "raw"

    def dims(bytes: Array[Byte]): (Int, Int) = {
      if (bytes == null || bytes.length < 8) (0, 0)
      else {
        // deterministic pseudo-dimensions from the byte prefix
        val w = 64 + (math.abs(java.util.Arrays.hashCode(bytes.take(4))) % 1984)
        val h = 64 + (math.abs(java.util.Arrays.hashCode(bytes.slice(4, 8))) % 1984)
        (w, h)
      }
    }

    /** Deterministic d-dim feature vector — stands in for an encoder
      * forward pass over the decoded media.
      */
    def features(bytes: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Float](d)
      if (bytes == null) return out
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var j = 0
      var s = h
      while (j < d) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(j) = ((s >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
        j += 1
      }
      out
    }
  }

  /** Attach the metadata struct to a binary column. Pure expressions
    * where possible (size, hash), stubbed codec for format/dims.
    */
  def withImageMeta(df: DataFrame, binCol: String, out: String = "meta"): DataFrame = {
    val sniff = udf((b: Array[Byte]) => {
      val (w, h) = FakeCodec.dims(b)
      ImageMeta(FakeCodec.sniffFormat(b), w, h,
        if (b == null) 0L else b.length.toLong,
        if (b == null) 0L else java.util.Arrays.hashCode(b).toLong)
    })
    df.withColumn(out, sniff(col(binCol)))
  }

  /** Partition-batched feature extraction — the mapInPandas-shaped
    * path: iterate the partition's rows, run the (stub) encoder per
    * row, emit (id, features). Batch shape and schema are the real
    * contract; only the kernel is fake.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    df.select(col(idCol), col(binCol))
      .mapPartitions { rows =>
        // per-partition batch loop — the place a real codec would be
        // initialised once per partition, then invoked per row/batch
        rows.map { r =>
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(r.get(0), FakeCodec.features(bytes, dim))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Resize plumbing: per-partition batched transform producing a
    * target-geometry payload plus the output dimensions. The stub
    * kernel deterministically subsamples the source bytes to
    * `w*h*3` (what a nearest-neighbor downscale's buffer size would
    * be); a real codec slots into the same partition loop. NULL or
    * undecodable input → NULL payload with NULL dims (rows are kept,
    * matching the quarantine-not-drop convention).
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
                   w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("resized", BinaryType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType)))
    val target = w * h * 3
    df.select(col(idCol), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null || bytes.isEmpty) Row(r.get(0), null, null, null)
          else {
            val out = Array.tabulate[Byte](target)(i =>
              bytes((i.toLong * bytes.length / target).toInt))
            Row(r.get(0), out, w, h)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame-sampling plumbing for video-like payloads: split a binary
    * column into fixed-size chunk rows (`posexplode` of a computed
    * chunk array) — the partition/row-explosion shape a real
    * frame-sampler produces, with deterministic chunking standing in
    * for codec frame boundaries.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, everyNth: Int): DataFrame = {
    val chunker = udf((b: Array[Byte]) =>
      if (b == null) Array.empty[Array[Byte]]
      else b.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0).map(_._1).toArray)
    df.select(col(idCol), posexplode(chunker(col(binCol))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame_bytes"))
  }
}
