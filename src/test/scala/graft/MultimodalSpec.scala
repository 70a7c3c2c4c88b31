package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Real 1x1 RGBA PNG (hand-verified header: IHDR width=1 height=1,
    * bit depth 8, color type 6) — an EMBEDDED byte literal, not
    * something encoded by the same library that decodes it.
    */
  private val onePxPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
      "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  /** Real JPEG bytes at known dims, produced by the JDK encoder for a
    * synthetic gradient (decode path under test is shared with PNG; the
    * embedded literal above guards against encode/decode circularity).
    */
  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 40 % 256) << 16 | (y * 60 % 256) << 8 | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  /** Real PNG with exact known pixels (PNG is lossless, so decoded
    * pixels match `rgb` exactly — unlike JPEG).
    */
  private def realPng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Minimal valid WAV: hand-built 44-byte RIFF/WAVE header + PCM16
    * mono 8 kHz payload with `frames` samples.
    */
  private def realWav(frames: Int): Array[Byte] = {
    val dataSize = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)          // PCM, mono
    bb.putInt(8000); bb.putInt(16000)       // sample rate, byte rate
    bb.putShort(2); bb.putShort(16)         // block align, bits/sample
    bb.put("data".getBytes); bb.putInt(dataSize)
    for (i <- 0 until frames) bb.putShort((i * 1000).toShort)
    bb.array()
  }

  private def corruptJpegish(n: Int, seed: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    new scala.util.Random(seed).nextBytes(b)
    b(0) = 0xFF.toByte; b(1) = 0xD8.toByte
    b
  }

  test("withImageMeta: real ImageIO header probe — embedded 1x1 PNG and " +
    "generated JPEG get true dims; corrupt payload falls back to sniff") {
    val jpeg = realJpeg(7, 5)
    val df = Seq(
      (1L, onePxPng),
      (2L, jpeg),
      (3L, corruptJpegish(1000, 1)),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "img")
    val out = Multimodal.withImageMeta(df, "img").select("id", "meta.*")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("format") === "png")
    assert(out(0).getAs[Int]("width") === 1)
    assert(out(0).getAs[Int]("height") === 1)
    assert(out(0).getAs[Long]("n_bytes") === onePxPng.length.toLong)
    assert(out(1).getAs[String]("format") === "jpeg")
    assert(out(1).getAs[Int]("width") === 7)
    assert(out(1).getAs[Int]("height") === 5)
    // corrupt: no reader can parse it -> sniffed label, zero dims
    assert(out(2).getAs[String]("format") === "jpeg")
    assert(out(2).getAs[Int]("width") === 0)
    assert(out(3).getAs[String]("format") === "unknown")
    assert(out(3).getAs[Long]("n_bytes") === 0L)
  }

  test("withAudioMeta: real javax.sound probe of a hand-built WAV; " +
    "non-audio payload labeled raw with zeroed fields") {
    val df = Seq(
      (1L, realWav(16)),
      (2L, corruptJpegish(100, 2)),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "audio")
    val out = Multimodal.withAudioMeta(df, "audio").select("id", "meta.*")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("format") === "wav")
    assert(out(0).getAs[Double]("sample_rate") === 8000.0)
    assert(out(0).getAs[Int]("channels") === 1)
    assert(out(0).getAs[Long]("n_frames") === 16L)
    // unparseable payload keeps its claimed-format signal via the
    // magic-byte sniff (this one has a JPEG prefix), like the image twin
    assert(out(1).getAs[String]("format") === "jpeg")
    assert(out(1).getAs[Long]("n_frames") === 0L)
    assert(out(2).getAs[String]("format") === "unknown")
  }

  test("extractFeatures: partition-batched, deterministic, declared schema") {
    val df = Seq((1L, realJpeg(7, 5)), (2L, realJpeg(9, 3))).toDF("id", "img")
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

  /** Deterministic textured pattern (non-monotone luminance — a smooth
    * gradient would dHash to 0 and prove nothing).
    */
  private def tex(x: Int, y: Int): Int = {
    val v = (x * x * 31 + y * y * 17 + x * y * 7) % 256
    v << 16 | ((v * 3) % 256) << 8 | ((x * 13 + y * 29) % 256)
  }

  test("dHash64: bit-exact pinned literal over a lossless PNG — " +
    "all-integer pipeline, same hash on any JVM/platform") {
    val h = Multimodal.JdkCodec.dHash64(
      Multimodal.JdkCodec.decodeImage(realPng(64, 64, tex)).get)
    assert(h === 0x4a6aaaac674a3356L,
      f"dHash must be deterministic, got 0x$h%016x")
  }

  test("imageDupPairs: re-encoded and locally-edited copies collapse " +
    "(Hamming <= 3), distinct images survive, undecodable/NULL excluded") {
    val baseImg = Multimodal.JdkCodec.decodeImage(realPng(64, 64, tex)).get
    val jpegCopy = { // same pixels through the lossy JPEG encoder
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(baseImg, "jpeg", bos); bos.toByteArray
    }
    val edited = realPng(64, 64, (x, y) => // small white block painted over
      if (x >= 34 && x < 38 && y >= 31 && y < 35) 0xFFFFFF else tex(x, y))
    val inverted = realPng(64, 64, (x, y) => tex(63 - x, y))
    val df = Seq(
      (1L, realPng(64, 64, tex)),
      (2L, jpegCopy),
      (3L, edited),
      (4L, inverted),
      (5L, corruptJpegish(500, 7)),
      (6L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "img")
    val pairs = Multimodal.imageDupPairs(df, "id", "img", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "JPEG re-encode must collapse with its source")
    assert(pairs.contains((1L, 3L)), "small local edit must collapse")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "a structurally different image must NOT pair with anything")
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L),
      "undecodable/NULL payloads are excluded from pairing, not crashed on")

    // end-to-end drop: cluster {1,2,3} keeps min id 1; the distinct
    // image and the undecodable/NULL rows pass through untouched
    val kept = Multimodal.imageDupDrop(df, "id", "img", maxHamming = 3)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L), s"got $kept")
  }

  test("colorHistogram: exact values on a solid image, L1 sums to 1, " +
    "JPEG re-encode lands cosine-near its source while a different " +
    "palette lands far — a REAL embedding through the cosine machinery") {
    import graft.multimodal.Multimodal.JdkCodec
    // solid mid-red: every pixel bins into one cell with mass 1.0
    val solid = JdkCodec.decodeImage(realPng(16, 16, (_, _) => 0x800000)).get
    val hSolid = JdkCodec.colorHistogram(solid)
    assert(hSolid.sum === 1.0f)
    assert(hSolid.count(_ > 0f) === 1)
    assert(hSolid(((0x80 * 8) >> 8) * 64) === 1.0f) // (r=4, g=0, b=0) cell

    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    // smooth gradient — the natural-image regime a color histogram is
    // built for (JPEG preserves smooth palettes; the tex() noise
    // fixture exists to stress dHash's STRUCTURE sensitivity instead)
    def grad(x: Int, y: Int): Int = ((x << 2) << 16) | ((y << 2) << 8) | 0x40
    val base = JdkCodec.colorHistogram(
      JdkCodec.decodeImage(realPng(64, 64, grad)).get)
    val jpegBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(
        JdkCodec.decodeImage(realPng(64, 64, grad)).get, "jpeg", bos)
      bos.toByteArray
    }
    val reenc = JdkCodec.colorHistogram(JdkCodec.decodeImage(jpegBytes).get)
    val other = JdkCodec.colorHistogram(
      JdkCodec.decodeImage(realPng(64, 64, (x, y) => 0x0000FF | (y << 8))).get)
    assert(cos(base, reenc) > 0.8, s"re-encode cosine ${cos(base, reenc)}")
    assert(cos(base, other) < 0.5, s"different palette cosine ${cos(base, other)}")

    // the DataFrame surface: NULL/undecodable rows keep a NULL
    // embedding; decodable rows carry the 512-dim descriptor
    val df = Seq(
      (1L, realPng(16, 16, (_, _) => 0x800000)),
      (2L, corruptJpegish(300, 3)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "img")
    val out = Multimodal.withImageEmbedding(df, "img")
      .select("id", "img_embedding")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty && out(3L).isEmpty)
  }

  test("resizeImages: real decode + nearest-neighbor resample with exact " +
    "pixel values; corrupt or NULL payloads kept as NULL rows") {
    // lossless source: 4x2 PNG, left half red, right half blue
    val png = realPng(4, 2, (x, _) => if (x < 2) 0xFF0000 else 0x0000FF)
    val df = Seq(
      (1L, png),
      (2L, corruptJpegish(1000, 3)),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "image")
    val out = Multimodal.resizeImages(df, "id", "image", w = 2, h = 1)
      .orderBy("id").collect()
    val r1 = out(0)
    val px = r1.getAs[Array[Byte]]("resized")
    assert(px.length === 2 * 1 * 3)
    assert(r1.getInt(2) === 2 && r1.getInt(3) === 1)
    // nearest-neighbor at (0,0) samples source (0,0)=red, (1,0) samples
    // source (2,0)=blue — exact, PNG being lossless
    assert((px(0) & 0xFF, px(1) & 0xFF, px(2) & 0xFF) === ((255, 0, 0)))
    assert((px(3) & 0xFF, px(4) & 0xFF, px(5) & 0xFF) === ((0, 0, 255)))
    // deterministic across runs
    val again = Multimodal.resizeImages(df, "id", "image", 2, 1)
      .orderBy("id").collect()(0).getAs[Array[Byte]]("resized")
    assert(java.util.Arrays.equals(px, again))
    // corrupt and NULL payloads: rows kept, NULL fields
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  /** PCM16 mono 8 kHz WAV whose frequency steps per ninth of the clip
    * (so each fingerprint frame has distinct band structure): segment
    * f plays `baseHz + stepHz * pattern(f)` at amplitude `amp`.
    */
  private def toneWav16(pattern: Seq[Int], baseHz: Double, stepHz: Double,
                        amp: Double, nSamples: Int = 9000): Array[Byte] = {
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataSize)
    for (i <- 0 until nSamples) {
      val seg = math.min(8, i * 9 / nSamples)
      val hz = baseHz + stepHz * pattern(seg)
      val s = amp * math.sin(2 * math.Pi * hz * i / 8000.0)
      bb.putShort((s * 32767).toShort)
    }
    bb.array()
  }

  /** The same signal re-encoded as PCM8 (unsigned, WAV convention) —
    * a genuine bit-depth re-encode for robustness testing.
    */
  private def toneWav8(pattern: Seq[Int], baseHz: Double, stepHz: Double,
                       amp: Double, nSamples: Int = 9000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + nSamples); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(8000)
    bb.putShort(1); bb.putShort(8)
    bb.put("data".getBytes); bb.putInt(nSamples)
    for (i <- 0 until nSamples) {
      val seg = math.min(8, i * 9 / nSamples)
      val hz = baseHz + stepHz * pattern(seg)
      val s = amp * math.sin(2 * math.Pi * hz * i / 8000.0)
      bb.put(((s * 127).toInt + 128).toByte)
    }
    bb.array()
  }

  test("aHash64: bit-exact pinned literal; amplitude scaling is an exact " +
    "invariance; decode handles PCM8/PCM16 and rejects non-audio") {
    val up = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8)
    val wav = toneWav16(up, 300, 150, 0.8)
    val Some((samples, rate)) = Multimodal.JdkCodec.decodeAudio(wav)
    assert(rate === 8000.0f && samples.length === 9000)
    val Some(h) = Multimodal.JdkCodec.aHash64(samples)
    // recompute → identical (determinism within this JVM); the literal
    // pin below guards cross-JVM/platform (StrictMath contract)
    assert(Multimodal.JdkCodec.aHash64(samples) === Some(h))
    // exact scale invariance on the DECODED samples: every band energy
    // scales by c², every second difference keeps its sign
    assert(Multimodal.JdkCodec.aHash64(samples.map(_ * 0.31)) === Some(h))
    assert(Multimodal.JdkCodec.decodeAudio(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.JdkCodec.aHash64(Array.fill(5)(0.1)) === None,
      "sub-frame signals have no fingerprint")
    // pinned literal: recomputing this on any JVM must agree bit-for-bit
    assert(h === -361971266154004225L,
      f"aHash64 drifted: got ${h}%d (0x${h}%016x)")
  }

  test("audioEmbedding: volume scaling is an EXACT invariance of the " +
    "normalized band-energy vector; distinct tone patterns land far; " +
    "aHash64 refactor preserves its pinned literal") {
    import graft.multimodal.Multimodal.JdkCodec
    val (a, _) = JdkCodec.decodeAudio(
      toneWav16(Seq(0, 1, 2, 3, 4, 5, 6, 7, 8), 400.0, 150.0, amp = 0.6)).get
    val loud = a.map(_ * 0.5)
    val ea = JdkCodec.audioEmbedding(a).get
    val eLoud = JdkCodec.audioEmbedding(loud).get
    // energies scale by c² uniformly → normalized vectors identical
    assert(ea.zip(eLoud).forall { case (x, y) => math.abs(x - y) < 1e-6 })
    assert(math.abs(ea.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    val (b, _) = JdkCodec.decodeAudio(
      toneWav16(Seq(8, 7, 6, 5, 4, 3, 2, 1, 0), 2600.0, -300.0, amp = 0.6)).get
    val eb = JdkCodec.audioEmbedding(b).get
    val cos = ea.zip(eb).map { case (x, y) => x.toDouble * y }.sum
    assert(cos < 0.9, s"distinct patterns too close: $cos")
    // silence → exact zero vector, not NaN
    val silent = JdkCodec.audioEmbedding(Array.fill(1024)(0.0)).get
    assert(silent.forall(_ === 0.0f))
  }

  test("end-to-end image retrieval: withImageEmbedding → Ann.bruteForceTopK " +
    "ranks the JPEG re-encode of the query image first") {
    import graft.similarity.Ann
    def grad(x: Int, y: Int): Int = ((x << 2) << 16) | ((y << 2) << 8) | 0x40
    val baseBytes = realPng(64, 64, grad)
    val jpegBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(
        Multimodal.JdkCodec.decodeImage(baseBytes).get, "jpeg", bos)
      bos.toByteArray
    }
    val others = (0 until 6).map { k =>
      (10L + k, realPng(64, 64, (x, y) => (k * 40) << 16 | 0x20 << 8 | (y << 2)))
    }
    val corpus = Multimodal.withImageEmbedding(
      (Seq((1L, baseBytes), (2L, jpegBytes)) ++ others).toDF("id", "img"), "img")
      .filter(col("img_embedding").isNotNull)
      .select(col("id"), col("img_embedding"))
    val query = corpus.filter(col("id") === 1L)
    val top = Ann.bruteForceTopK(query, corpus, "id", "img_embedding",
      "id", "img_embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(top.head === 2L,
      s"the re-encoded copy must be the nearest neighbor, got ${top.toSeq}")
  }

  test("audioDupPairs: volume-scaled and bit-depth-re-encoded copies " +
    "collapse; a spectrally different clip survives; non-audio excluded") {
    val up   = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8)
    val down = Seq(8, 7, 6, 5, 4, 3, 2, 1, 0)
    val df = Seq(
      (1L, toneWav16(up, 300, 150, 0.8)),
      (2L, toneWav16(up, 300, 150, 0.2)),   // volume-scaled copy
      (3L, toneWav8(up, 300, 150, 0.8)),    // 8-bit re-encode
      (4L, toneWav16(down, 300, 150, 0.8)), // reversed spectral pattern
      (5L, corruptJpegish(500, 7)),
      (6L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "audio")
    val pairs = Multimodal.audioDupPairs(df, "id", "audio")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // measured distances: volume-scaled = 0, 8-bit re-encode = 9,
    // reversed-pattern clip = 31-32 (≈ the 32 expected for unrelated
    // 64-bit fingerprints) — the default threshold 12 sits in the gap
    assert(pairs.contains((1L, 2L)), "volume-scaled copy must collapse")
    assert(pairs.contains((1L, 3L)), "8-bit re-encode must collapse")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "a spectrally different clip must NOT pair with anything")
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L),
      "non-audio/NULL payloads are excluded from pairing, not crashed on")

    // end-to-end drop: cluster {1,2,3} keeps min id 1; the distinct
    // clip and the non-audio/NULL rows pass through untouched
    val kept = Multimodal.audioDupDrop(df, "id", "audio")
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L), s"got $kept")
  }

  test("interleavedPackReport: hand-packed mixed stream — per-window " +
    "text/patch overlap is exact, an image straddling a window's " +
    "opening boundary is flagged there, zero-cost items are absent") {
    import spark.implicits._
    val items = Seq(
      (1L, 4L, 0L),  // text [0,4)
      (2L, 3L, 5L),  // img [4,9), text [9,12)
      (3L, 0L, 6L),  // img [12,18)
      (4L, 2L, 6L),  // img [18,24) straddles 20, text [24,26)
      (5L, 0L, 0L))  // zero-cost: absent
      .toDF("doc_id", "tt", "ip")
    val out = Multimodal
      .interleavedPackReport(items, "doc_id", "tt", "ip", packLen = 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((2L, 5L, 5L, 0L)),
      "pack 0: doc1 text 4 + doc2 img 5 + doc2 text 1")
    assert(out(1L) === ((3L, 2L, 8L, 0L)),
      "pack 1: doc2 text 2, doc3 img 6, doc4 img 2 (starts here)")
    assert(out(2L) === ((1L, 2L, 4L, 1L)),
      "pack 2: doc4 img tail 4 + text 2, image straddle flagged")
  }
}
