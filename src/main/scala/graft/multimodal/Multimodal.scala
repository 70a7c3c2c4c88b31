package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * Decode is REAL and JDK-native (`java.desktop` module, no external
  * dependency): `javax.imageio.ImageIO` for JPEG/PNG/BMP/GIF header
  * probe + pixel decode, `javax.sound.sampled` for WAV header probe +
  * PCM decode. Perceptual near-dup is REAL end-to-end for both
  * modalities: images via the 64-bit dHash, audio via the 64-bit
  * Haitsma–Kalker band-energy fingerprint, each feeding the shared
  * pigeonhole Hamming blocking. EMBEDDINGS are real too: images get
  * the Swain–Ballard color-histogram descriptor
  * ([[Multimodal.withImageEmbedding]]) and audio the L2-normalized
  * band-energy matrix ([[Multimodal.withAudioEmbedding]]), both
  * `array<float>` columns the cosine/ANN/quantize/semantic-dedup
  * operators consume directly. The one remaining stand-in is
  * `FakeCodec.features` — a NEURAL encoder forward pass (such a model
  * is genuinely not available in this container); its
  * batching/schema plumbing is the real contract, and every shipped
  * operator now runs on the real descriptors instead.
  */
object Multimodal {

  final case class ImageMeta(format: String, width: Int, height: Int,
                             n_bytes: Long, content_hash: Long)

  final case class AudioMeta(format: String, sample_rate: Double,
                             channels: Int, n_frames: Long,
                             n_bytes: Long, content_hash: Long)

  /** JDK-native codec kernels. All probes/decodes are total: corrupt
    * or unrecognized bytes yield None, never an exception — the
    * quarantine-not-drop convention of the sources layer.
    */
  object JdkCodec {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    // never spill decode scratch to temp files on executors
    ImageIO.setUseCache(false)

    /** Header-only probe: (format, width, height) read from the image
      * header by the matching ImageIO reader WITHOUT decoding pixel
      * data — the cheap path for metadata extraction over billions of
      * images. None if no installed reader recognizes the bytes or the
      * header is corrupt.
      */
    def probeImage(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Full pixel decode. None for unrecognized/corrupt payloads. */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length == 0) return None
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    }

    /** Nearest-neighbor resample to (w, h), emitted as a packed RGB24
      * buffer (w*h*3 bytes, row-major). Hand-rolled rather than
      * Graphics2D so the output is bit-deterministic across JVMs and
      * rendering pipelines — a requirement for content-hash dedup of
      * the resized corpus.
      */
    def resizeRgb(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h * 3)
      var y = 0; var i = 0
      while (y < h) {
        val sy = (y.toLong * img.getHeight / h).toInt
        var x = 0
        while (x < w) {
          val sx  = (x.toLong * img.getWidth / w).toInt
          val rgb = img.getRGB(sx, sy)
          out(i) = ((rgb >> 16) & 0xFF).toByte
          out(i + 1) = ((rgb >> 8) & 0xFF).toByte
          out(i + 2) = (rgb & 0xFF).toByte
          i += 3; x += 1
        }
        y += 1
      }
      out
    }

    /** 64-bit difference hash (dHash) — the public-knowledge perceptual
      * image signature: downsample to a 9×8 grayscale grid with the
      * deterministic nearest-neighbor resample, then bit (y·8 + x) is
      * set iff luminance(x, y) > luminance(x+1, y). Robust to
      * re-encoding, mild JPEG artifacts, and small local edits (the
      * 9×8 pooling absorbs them), which is exactly the near-dup
      * equivalence class wanted for scraped image corpora. All-integer
      * arithmetic over the bit-deterministic [[resizeRgb]] buffer, so
      * the hash is bit-exact across JVMs/platforms (spec pins a
      * literal). Luminance = (299·R + 587·G + 114·B) — the integer
      * ITU-R BT.601 weighting.
      */
    def dHash64(img: java.awt.image.BufferedImage): Long = {
      val px = resizeRgb(img, 9, 8) // 9*8*3 bytes, row-major RGB
      def lum(x: Int, y: Int): Int = {
        val i = (y * 9 + x) * 3
        299 * (px(i) & 0xFF) + 587 * (px(i + 1) & 0xFF) + 114 * (px(i + 2) & 0xFF)
      }
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (lum(x, y) > lum(x + 1, y)) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }

    /** L1-normalized RGB color histogram — a REAL public-knowledge
      * image descriptor (Swain & Ballard 1991, "Color Indexing"):
      * pixels of the bit-deterministic 32×32 resample bin into
      * `binsPerChannel`³ color cells (bin = channel·bins >> 8, pure
      * integer), and the counts normalize by the fixed 1024-pixel
      * total — so the embedding is a ratio of integers, bit-exact
      * across JVMs/platforms. Robust to re-encoding and resizing
      * (the resample pools), sensitive to palette — the complement
      * of [[dHash64]]'s structure sensitivity, and a REAL vector for
      * the cosine/ANN machinery (no FakeCodec on the image path).
      */
    def colorHistogram(img: java.awt.image.BufferedImage,
                       binsPerChannel: Int = 8): Array[Float] = {
      val px = resizeRgb(img, 32, 32)
      val counts = new Array[Int](binsPerChannel * binsPerChannel * binsPerChannel)
      var i = 0
      while (i < px.length) {
        val r = ((px(i) & 0xFF) * binsPerChannel) >> 8
        val g = ((px(i + 1) & 0xFF) * binsPerChannel) >> 8
        val b = ((px(i + 2) & 0xFF) * binsPerChannel) >> 8
        counts((r * binsPerChannel + g) * binsPerChannel + b) += 1
        i += 3
      }
      counts.map(c => c / 1024.0f)
    }

    /** Full PCM decode to mono double samples in [-1, 1]: the JDK's
      * own conversion chain normalizes any supported encoding (8/16
      * bit, signed/unsigned, either endianness) to 16-bit signed
      * little-endian, then channels are mixed by average. None for
      * non-audio/corrupt payloads or an empty data section.
      */
    def decodeAudio(bytes: Array[Byte]): Option[(Array[Double], Float)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val in0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val f0 = in0.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
            f0.getSampleRate, false)
          // the conversion stream owns codec resources of its own —
          // close BOTH streams (close is idempotent on the source)
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in0)
          val raw = try in.readAllBytes() finally in.close()
          val ch = math.max(1, f0.getChannels)
          val n = raw.length / (2 * ch)
          if (n == 0) return None
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0; var c = 0
            while (c < ch) {
              val off = (i * ch + c) * 2
              acc += ((raw(off) & 0xFF) | (raw(off + 1) << 8)).toShort / 32768.0
              c += 1
            }
            out(i) = acc / ch; i += 1
          }
          Some((out, f0.getSampleRate))
        } finally in0.close()
      } catch { case _: Exception => None }
    }

    /** 64-bit audio fingerprint — the public-knowledge band-energy
      * signature (Haitsma & Kalker 2002, "A Highly Robust Audio
      * Fingerprinting System", simplified to one 64-bit block): the
      * signal splits into 9 equal time frames, each frame's energy is
      * measured in 9 frequency bands, and bit (f·8 + b) is the sign of
      * the time-and-band SECOND difference
      * `(E[f+1][b] − E[f+1][b+1]) − (E[f][b] − E[f][b+1])` — invariant
      * to global amplitude scaling (every energy scales by c²), which
      * is exactly the volume-normalized-re-encode equivalence class
      * wanted for scraped audio corpora. Band energies come from
      * Goertzel recurrences at 9 normalized frequencies over a
      * ≤1024-sample decimation of each frame (2 multiply-adds per
      * sample per band, ONE `StrictMath.cos` per band — StrictMath, so
      * the fingerprint is bit-exact across JVMs/platforms; spec pins a
      * literal). None for signals shorter than 2 samples per frame.
      */
    def aHash64(samples: Array[Double]): Option[Long] =
      bandEnergies(samples, 9, 9).map { e =>
        var bits = 0L
        var f = 0
        while (f < 8) {
          var b = 0
          while (b < 8) {
            val d = (e(f + 1)(b) - e(f + 1)(b + 1)) - (e(f)(b) - e(f)(b + 1))
            if (d > 0) bits |= 1L << (f * 8 + b)
            b += 1
          }
          f += 1
        }
        bits
      }

    /** The time×frequency band-energy matrix behind [[aHash64]] —
      * `frames` equal time slices × `bands` Goertzel energies each
      * (StrictMath throughout, so the matrix is bit-exact across
      * JVMs). None for signals shorter than 2 samples per frame.
      */
    def bandEnergies(samples: Array[Double], frames: Int,
                     bands: Int): Option[Array[Array[Double]]] = {
      if (samples == null || samples.length < frames * 2) return None
      val e = Array.ofDim[Double](frames, bands)
      var f = 0
      while (f < frames) {
        val start = (f.toLong * samples.length / frames).toInt
        val end = ((f + 1).toLong * samples.length / frames).toInt
        val stride = math.max(1, (end - start) / 1024)
        var b = 0
        while (b < bands) {
          val c = 2.0 * StrictMath.cos(StrictMath.PI * (b + 1) / (bands + 1))
          var s1 = 0.0; var s2 = 0.0; var idx = start
          while (idx < end) {
            val s0 = samples(idx) + c * s1 - s2
            s2 = s1; s1 = s0; idx += stride
          }
          e(f)(b) = s1 * s1 + s2 * s2 - c * s1 * s2
          b += 1
        }
        f += 1
      }
      Some(e)
    }

    /** REAL audio embedding: the flattened [[bandEnergies]] matrix
      * L2-normalized — a time×frequency energy descriptor for the
      * cosine/ANN machinery. Global amplitude scaling multiplies every
      * energy by c², so the NORMALIZED vector is exactly invariant to
      * volume (the [[aHash64]] equivalence class, as a vector). A
      * silent (all-zero-energy) signal yields the zero vector.
      */
    def audioEmbedding(samples: Array[Double], frames: Int = 8,
                       bands: Int = 8): Option[Array[Float]] =
      bandEnergies(samples, frames, bands).map { e =>
        val flat = e.flatten
        val norm = StrictMath.sqrt(flat.map(x => x * x).sum)
        if (norm == 0.0) flat.map(_ => 0.0f)
        else flat.map(x => (x / norm).toFloat)
      }

    /** WAV (and any other javax.sound-supported container) header
      * probe: (format, sampleRate, channels, frameCount). None for
      * non-audio payloads.
      */
    def probeAudio(bytes: Array[Byte]): Option[(String, Double, Int, Long)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new ByteArrayInputStream(bytes))
        val f = aff.getFormat
        // getFrameLength is NOT_SPECIFIED (-1) for containers whose
        // header carries no frame count — clamp so duration math
        // downstream never goes negative
        Some((aff.getType.getExtension.toLowerCase,
          f.getSampleRate.toDouble, f.getChannels,
          math.max(0L, aff.getFrameLength.toLong)))
      } catch { case _: Exception => None }
    }
  }

  /** Magic-byte sniff + the documented encoder stand-in. `sniffFormat`
    * labels payloads ImageIO/javax.sound cannot parse (corrupt file
    * with a recognizable prefix → its claimed format; anything else →
    * "raw"); `features` stands in for a neural encoder forward pass.
    */
  object FakeCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes == null || bytes.length < 2) "unknown"
      else if (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte) "png"
      else if (bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte) "wav"
      else "raw"

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

  /** Attach the metadata struct to a binary column. Format and
    * dimensions come from a REAL header-only ImageIO probe (no pixel
    * decode); payloads no installed reader can parse fall back to the
    * magic-byte sniff with (0, 0) dims, so corrupt rows are labeled,
    * not dropped.
    */
  def withImageMeta(df: DataFrame, binCol: String, out: String = "meta"): DataFrame = {
    val sniff = udf((b: Array[Byte]) => {
      val (fmt, w, h) = JdkCodec.probeImage(b)
        .getOrElse((FakeCodec.sniffFormat(b), 0, 0))
      ImageMeta(fmt, w, h,
        if (b == null) 0L else b.length.toLong,
        if (b == null) 0L else java.util.Arrays.hashCode(b).toLong)
    })
    df.withColumn(out, sniff(col(binCol)))
  }

  /** Audio twin of [[withImageMeta]]: sample rate / channels / frame
    * count from a real `javax.sound.sampled` header probe (WAV, AIFF,
    * AU with the stock JDK). Non-audio payloads → format from the
    * magic-byte sniff, zeroed audio fields.
    */
  def withAudioMeta(df: DataFrame, binCol: String, out: String = "meta"): DataFrame = {
    val sniff = udf((b: Array[Byte]) => {
      val (fmt, rate, ch, frames) = JdkCodec.probeAudio(b)
        .getOrElse((FakeCodec.sniffFormat(b), 0.0, 0, 0L))
      AudioMeta(fmt, rate, ch, frames,
        if (b == null) 0L else b.length.toLong,
        if (b == null) 0L else java.util.Arrays.hashCode(b).toLong)
    })
    df.withColumn(out, sniff(col(binCol)))
  }

  /** Attach the 64-bit perceptual dHash of a binary image column
    * ([[JdkCodec.dHash64]]). Undecodable or NULL payloads get a NULL
    * hash — kept, not dropped, per the quarantine convention; the
    * near-dup path below excludes them explicitly.
    */
  def withImageDHash(df: DataFrame, binCol: String,
                     out: String = "dhash"): DataFrame = {
    val h = udf((b: Array[Byte]) => JdkCodec.decodeImage(b).map(JdkCodec.dHash64))
    df.withColumn(out, h(col(binCol)))
  }

  /** Image near-dup pairs — REAL perceptual dedup end-to-end: decode →
    * dHash → the same quarter-pigeonhole Hamming blocking the SimHash
    * text path uses ([[graft.dedup.NearDup.hammingPairs64]]; full
    * recall for maxHamming ≤ 3). Returns (id_a, id_b, hamming).
    * Re-encoded / mildly edited copies of an image collapse; distinct
    * images survive. Scale shape: one decode pass (map-only), then
    * only (quarter, id, hash) rows shuffle — pixels never do.
    */
  def imageDupPairs(df: DataFrame, idCol: String, binCol: String,
                    maxHamming: Int = 3): DataFrame =
    graft.dedup.NearDup.hammingPairs64(
      withImageDHash(df.select(col(idCol), col(binCol)), binCol)
        .filter(col("dhash").isNotNull)
        .select(col(idCol), col("dhash")),
      idCol, "dhash", maxHamming)

  /** Image dedup end-to-end: [[imageDupPairs]] clusters → keep each
    * cluster's minimum id → undecodable/unique rows pass through
    * untouched (quarantine-not-drop: a NULL-hash row is unknowable,
    * not a duplicate).
    */
  def imageDupDrop(df: DataFrame, idCol: String, binCol: String,
                   maxHamming: Int = 3): DataFrame =
    graft.pipelines.CorpusPipeline.dropByPairs(
      df, idCol, imageDupPairs(df, idCol, binCol, maxHamming))

  /** Audio twin of [[imageDupDrop]] over [[audioDupPairs]]. */
  def audioDupDrop(df: DataFrame, idCol: String, binCol: String,
                   maxHamming: Int = 12): DataFrame =
    graft.pipelines.CorpusPipeline.dropByPairs(
      df, idCol, audioDupPairs(df, idCol, binCol, maxHamming))

  /** Attach the 64-bit audio fingerprint of a binary audio column
    * ([[JdkCodec.aHash64]] over [[JdkCodec.decodeAudio]]). Undecodable,
    * NULL, or too-short payloads get a NULL fingerprint — kept, not
    * dropped; the near-dup path below excludes them explicitly.
    */
  def withAudioFingerprint(df: DataFrame, binCol: String,
                           out: String = "afp"): DataFrame = {
    val h = udf((b: Array[Byte]) =>
      JdkCodec.decodeAudio(b).flatMap { case (s, _) => JdkCodec.aHash64(s) })
    df.withColumn(out, h(col(binCol)))
  }

  /** Audio near-dup pairs — REAL perceptual dedup end-to-end, the
    * audio twin of [[imageDupPairs]]: decode → band-energy fingerprint
    * → the same pigeonhole Hamming blocking
    * ([[graft.dedup.NearDup.hammingPairs64]]; full recall at ANY
    * maxHamming — the blocking splits into maxHamming+1 ranges).
    * Volume-scaled / bit-depth-re-encoded copies of a clip collapse;
    * spectrally different clips survive. The default threshold is
    * wider than the image path's because a single 64-bit H-K block
    * tolerates re-encode BER ~0.15 (Haitsma & Kalker match at BER
    * 0.35 over 8192 bits): measured in the spec, an 8-bit re-encode
    * lands at Hamming 9 and unrelated clips at 31–32, so 12 sits in
    * the gap. More blocks = shorter block keys = more candidate
    * collisions at scale — tune down for corpora where only exact
    * re-encodes matter. Scale shape: one decode pass (map-only), then
    * only (block, id, hash) rows shuffle — PCM never does.
    */
  def audioDupPairs(df: DataFrame, idCol: String, binCol: String,
                    maxHamming: Int = 12): DataFrame =
    graft.dedup.NearDup.hammingPairs64(
      withAudioFingerprint(df.select(col(idCol), col(binCol)), binCol)
        .filter(col("afp").isNotNull)
        .select(col(idCol), col("afp")),
      idCol, "afp", maxHamming)

  /** REAL image embeddings: the [[JdkCodec.colorHistogram]] descriptor
    * as an `array<float>` column ready for the cosine/ANN operators
    * ([[graft.similarity.Ann]], [[graft.dedup.NearDup.lshCosinePairsBanded]],
    * `quantizeInt8`, the semantic-dedup family). NULL or undecodable
    * payloads get a NULL embedding (quarantine-not-drop). With this,
    * the image path is real END TO END — decode, perceptual hash,
    * descriptor embedding, similarity search — and `FakeCodec`
    * remains only as the documented stand-in for a NEURAL encoder.
    */
  def withImageEmbedding(df: DataFrame, binCol: String,
                         binsPerChannel: Int = 8,
                         outCol: String = "img_embedding"): DataFrame = {
    val h = udf((b: Array[Byte]) =>
      JdkCodec.decodeImage(b).map(JdkCodec.colorHistogram(_, binsPerChannel)))
    df.withColumn(outCol, h(col(binCol)))
  }

  /** REAL audio embeddings: [[JdkCodec.audioEmbedding]] (L2-normalized
    * band-energy matrix, volume-invariant) as an `array<float>`
    * column for the cosine/ANN operators — the audio twin of
    * [[withImageEmbedding]]. NULL/undecodable payloads keep a NULL
    * embedding.
    */
  def withAudioEmbedding(df: DataFrame, binCol: String,
                         outCol: String = "audio_embedding"): DataFrame = {
    val h = udf((b: Array[Byte]) =>
      JdkCodec.decodeAudio(b).flatMap { case (s, _) => JdkCodec.audioEmbedding(s) })
    df.withColumn(outCol, h(col(binCol)))
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

  /** Real image resize as a per-partition batched transform: ImageIO
    * pixel decode → deterministic nearest-neighbor resample → packed
    * RGB24 payload (`w*h*3` bytes) plus the output dimensions. NULL or
    * undecodable input → NULL payload with NULL dims (rows are kept,
    * matching the quarantine-not-drop convention — a downstream mask
    * on `resized IS NULL` routes them to quarantine).
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
                   w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("resized", BinaryType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType)))
    df.select(col(idCol), col(binCol))
      .mapPartitions { rows =>
        // per-partition loop: ImageIO reader instances are pooled by
        // the JDK per thread; nothing else to initialise per partition
        rows.map { r =>
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          JdkCodec.decodeImage(bytes) match {
            case Some(img) => Row(r.get(0), JdkCodec.resizeRgb(img, w, h), w, h)
            case None      => Row(r.get(0), null, null, null)
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

  /** Interleaved multimodal pack audit (VERDICT r13 #8): the q79
    * concat-then-chunk packer run over a MIXED stream where each item
    * contributes `imgPatchCol` image-patch positions (ViT-style patch
    * tokens, 0 for text-only items) followed by `textTokCol` text
    * tokens, in id order. Per `packLen`-sized window the report gives
    * the doc/text/patch composition plus `n_split_images` — images
    * whose patch span straddles the window's opening boundary, i.e.
    * exactly the items a real interleaved packer must pad, shift, or
    * replicate to keep whole. Σ n_split_images over packs is the
    * padding bill of naive chunking; "how much of my batch is pixels"
    * is `image_patches` vs `text_tokens` per pack.
    *
    * Scale shape: start offsets ride the two-level cumsum (no global
    * window); each item explodes into only the ≤ cost/packLen + 1
    * windows it touches; the rollup is one map-side-combined groupBy
    * on pack_id. Zero-cost items (empty text, no image) own no
    * position and are absent.
    */
  def interleavedPackReport(items: DataFrame, idCol: String,
                            textTokCol: String, imgPatchCol: String,
                            packLen: Long): DataFrame = {
    require(packLen > 0, s"packLen must be positive, got $packLen")
    val costed = items.select(col(idCol),
      coalesce(col(textTokCol).cast(LongType), lit(0L)).as("__tt"),
      coalesce(col(imgPatchCol).cast(LongType), lit(0L)).as("__ip"))
      .withColumn("__cost", col("__tt") + col("__ip"))
      .filter(col("__cost") > 0L)
    val (bucketed, wi) = graft.operators.TwoLevelCumsum.withOffsets(
      costed, expr(s"`$idCol` div 100000L"), col("__cost"),
      Seq(col(idCol)))
    val spans = bucketed
      .withColumn("__s", col("__off") + sum("__w").over(wi) - col("__cost"))
      .select(col(idCol), col("__tt"), col("__ip"), col("__cost"),
        col("__s"))
      .withColumn("pack_id",
        explode(sequence(expr(s"__s div ${packLen}L"),
          expr(s"(__s + __cost - 1) div ${packLen}L"))))
    def overlap(lo: Column, hi: Column): Column = greatest(lit(0L),
      least(hi, (col("pack_id") + 1) * packLen) -
        greatest(lo, col("pack_id") * packLen))
    spans
      .withColumn("__imgIn", overlap(col("__s"), col("__s") + col("__ip")))
      .withColumn("__txtIn",
        overlap(col("__s") + col("__ip"), col("__s") + col("__cost")))
      .withColumn("__split",
        // the image straddles this pack's opening boundary
        when(col("__ip") > 0L &&
          col("__s") < col("pack_id") * packLen &&
          col("__s") + col("__ip") > col("pack_id") * packLen, 1L)
          .otherwise(0L))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("__txtIn").as("text_tokens"),
        sum("__imgIn").as("image_patches"),
        sum("__split").as("n_split_images"))
  }
}
