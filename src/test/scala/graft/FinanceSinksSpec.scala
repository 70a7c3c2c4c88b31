package graft

import graft.pipelines.FinancePipeline
import graft.similarity.Ann
import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FinanceSinksSpec extends SparkSpec {
  import spark.implicits._

  test("finance cleanup: crosswalk + title case + address strip + billing-city null") {
    val extracted = Seq(
      ("0001X00001000101", "2024-01-15", "0 MAIN ST", "PGH, PA", "ALLENTOWN SLOPES"),
      ("0002Y00002000202", "2024-02-20", "45 OAK AVE", ", ", "DOWNTOWN"))
      .toDF("PIN", "MODIFY_DATE", "ADDRESS", "BILLING_CITY", "NEIGHBORHOOD")
    val out = FinancePipeline.cleanup(extracted).orderBy("parc_num").collect()
    assert(out(0).getAs[String]("address") === "MAIN ST", "leading '0 ' stripped")
    assert(out(0).getAs[String]("neighborhood") === "Allentown", "crosswalk + title")
    assert(out(1).isNullAt(out(1).fieldIndex("billing_city")), "', ' => NULL")
    assert(out(1).getAs[String]("neighborhood") === "Central Business District")
  }

  test("finance enrich + publish: centroid join, month partitions, csv export") {
    val parcels = Seq(("0001X00001000101", "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"))
      .toDF("zone", "geometry")
    val zones = Map("neighborhood_geo" -> Seq(
      ("central", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))", 0L, None: Option[Long])))
    val df = Seq(
      ("0001X00001000101", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), "MAIN ST", "Allentown", 1700000000L),
      ("0002Y00002000202", java.sql.Timestamp.valueOf("2024-02-20 00:00:00"), "OAK AVE", "Shadyside", 1700000000L))
      .toDF("parc_num", "modify_date", "address", "neighborhood", "mod_unix")
    val enriched = FinancePipeline.enrich(df, parcels, zones, "mod_unix")
    val rows = enriched.orderBy("parc_num").collect()
    assert(rows(0).getAs[Double]("latitude") === 1.0)
    assert(rows(0).getAs[String]("neighborhood_name") === "central", "geo zone wins")
    assert(rows(1).isNullAt(rows(1).fieldIndex("latitude")), "unknown parcel => null coords")
    assert(rows(1).getAs[String]("neighborhood_name") === "Shadyside", "fallback to extracted")

    val dir = tempDir("fin").toFile
    FinancePipeline.publish(enriched, s"$dir/table", s"$dir/csv",
      Seq("parc_num", "address", "neighborhood_name"))
    val parts = new java.io.File(s"$dir/table").listFiles().map(_.getName).filter(_.startsWith("__part="))
    assert(parts.toSet === Set("__part=2024-01", "__part=2024-02"))
    val csv = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(csv.columns.toSeq === Seq("parc_num", "address", "neighborhood_name"))
    assert(csv.count() === 2)
  }

  test("writePartitioned: small-files control — filesPerPartition bounds " +
    "parquet files per partition directory") {
    val dir = tempDir("partfiles").toFile
    val df = (1 to 2000).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-0${i % 2 + 1}%d-15 00:00:00"))
    }.toDF("id", "d")
    def filesIn(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("__part="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    // the unaligned shape this sink exists to prevent: every writing
    // task emits a file into every partition dir it touches
    df.withColumn("__part", date_format(date_trunc("month", col("d")), "yyyy-MM"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("__part").parquet(s"$dir/naive")
    assert(filesIn(s"$dir/naive").values.forall(_ > 1),
      s"naive write should fan out: ${filesIn(s"$dir/naive")}")
    Sinks.writePartitioned(df, s"$dir/one", "d")
    assert(filesIn(s"$dir/one") === Map("__part=2024-01" -> 1, "__part=2024-02" -> 1),
      "default: exactly one file per partition")
    // filesPerPartition is an UPPER bound — AQE may coalesce the salted
    // shuffle below it on small data, never above it
    Sinks.writePartitioned(df, s"$dir/four", "d", filesPerPartition = 4)
    val four = filesIn(s"$dir/four")
    assert(four.keySet === Set("__part=2024-01", "__part=2024-02"))
    assert(four.values.forall(n => n >= 1 && n <= 4), s"salted fan-out bounded: $four")
    assert(spark.read.parquet(s"$dir/four").count() === 2000)
  }

  test("writeStage round-trips with schema validation") {
    val dir = tempDir("stage").toFile
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val declared = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    Sinks.writeStage(df, s"$dir/out", Some(declared))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    // schema validation rejects a frame missing a declared column
    intercept[IllegalArgumentException] {
      Sinks.writeStage(df.drop("name"), s"$dir/out2", Some(declared))
    }
  }

  test("ivfKmeansTopK: trained quantizer recall vs brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfKmeansTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // approximate: require >= 40% overlap with exact top-5 at 4/8 probing
    val overlap = ivf.intersect(brute).size.toDouble / brute.size
    assert(overlap >= 0.4, s"recall too low: $overlap (ivf=$ivf brute=$brute)")
  }

  test("ivfTopK: map-side cell assignment — recall holds and the only " +
    "shuffle is the final top-k aggregate (no corpus exchange at index build)") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4)
    val got = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val overlap = got.intersect(brute).size.toDouble / brute.size
    assert(overlap >= 0.4, s"recall too low: $overlap (ivf=$got brute=$brute)")
    // index build must be a map pass: the one shuffle in the whole plan
    // is the bounded-heap top-k aggregate (plus broadcast exchanges)
    val shuffles = ivf.queryExecution.executedPlan.toString()
      .linesIterator.count(l => l.contains("Exchange hashpartitioning")
        || l.contains("Exchange rangepartitioning"))
    assert(shuffles <= 1, s"expected only the top-k aggregate shuffle, got $shuffles")
  }

  test("hardNegatives: half-open band [floor, ceil) — near-dups above " +
    "the ceiling and dissimilar rows below the floor are both excluded, " +
    "and the result equals the band-filtered brute-force ranking") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),                 // the query
      (1L, Seq(1.0f, 0.01f)),                // cos ~1.0 — near-dup, excluded
      (2L, Seq(1.0f, 1.0f)),                 // cos ~0.7071 — in band
      (3L, Seq(0.5f, 1.0f)),                 // cos ~0.4472 — in band
      (4L, Seq(0.0f, 1.0f)),                 // cos 0 — below floor
      (5L, Seq(-1.0f, 0.0f)))                // cos -1 — below floor
      .toDF("vec_id", "embedding")
    val out = Ann.hardNegatives(
      emb.filter(col("vec_id") === 0L), emb,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 10, simFloor = 0.3, dupCeil = 0.9)
      .select("rank", "neighbor_id", "score").as[(Int, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) === Seq(2L, 3L))
    assert(out.forall { case (_, _, s) => s >= 0.3 && s < 0.9 })
    // parity with the full sf0.001 corpus: band-filter the exact
    // brute-force scores independently and compare sets
    val ref = Tables.embeddings(spark, sf("sf0.001"))
    val queries = ref.filter(col("vec_id") < 3)
    val brute = Ann.bruteForceTopK(queries, ref, "vec_id", "embedding",
      "vec_id", "embedding", k = 1000)
      .filter(col("score") >= 0.30 && col("score") < 0.45)
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("r") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val mined = Ann.hardNegatives(queries, ref, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, simFloor = 0.30, dupCeil = 0.45)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(mined === brute)
  }

  test("bruteForceTopK: string corpus ids rank with lexicographic tie-break") {
    val emb = Seq(
      ("q", Seq(1.0f, 0.0f)),
      ("a", Seq(1.0f, 0.1f)), ("b", Seq(1.0f, 0.1f)),   // tied scores
      ("c", Seq(0.9f, 0.5f)), ("d", Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(
      emb.filter(col("vec_id") === "q"), emb, "vec_id", "embedding", "vec_id", "embedding", 3)
      .select("rank", "neighbor_id").as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) === Seq("a", "b", "c"),
      s"score desc then id asc expected, got $out")
  }

  test("lshTopK: probeHamming=3 enumerates all C(nBits,d) masks and beats d=0 recall") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(d: Int): Double = {
      val got = Ann.lshTopK(queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5,
        nBits = 8, probeHamming = d)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val r0 = recallAt(0)
    val r3 = recallAt(3)   // 1 + 8 + 28 + 56 = 93 of 256 buckets probed
    assert(r3 >= r0, s"deeper probing must not lose recall (d0=$r0 d3=$r3)")
    assert(r3 >= 0.5, s"Hamming-3 probing recall too low: $r3")
  }

  test("bruteForceTopKInt8: the int8 candidate scan + fp32 rerank returns " +
    "EXACTLY the exact brute-force top-k at sf0.001 and sf0.1") {
    import spark.implicits._
    for (sfDir <- Seq("sf0.001", "sf0.1")) {
      val emb = Tables.embeddings(spark, sf(sfDir))
      val queries = emb.filter(col("vec_id") < 5)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val exact = rows(Ann.bruteForceTopK(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding", 10))
      val got = rows(Ann.bruteForceTopKInt8(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding", 10))
      assert(got === exact, s"int8+rerank must recover the exact answer at $sfDir")
    }
  }

  test("quantizeInt8: codes in [-127,127], dequantization error <= scale/254 " +
    "per element, zero vector -> zeros, map-only plan") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .unionByName(Seq((99999L, Array.fill(8)(0f), 0))
        .toDF("vec_id", "embedding", "label"))
    val q = Ann.quantizeInt8(emb, "vec_id", "embedding")
    val joined = q.join(emb, "vec_id")
      .select(col("vec_id"), col("scale"), col("qvec"), col("embedding"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      val orig  = r.getSeq[Float](3)
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"vec ${r.getLong(0)}: code out of range")
      if (scale == 0d) assert(codes.forall(_ == 0), "zero vector must quantize to zeros")
      else codes.zip(orig).foreach { case (c, x) =>
        // floor(t + 0.5) rounds to nearest: |x - c*scale/127| <= scale/254
        assert(math.abs(x.toDouble - c * scale / 127d) <= scale / 254d + 1e-12,
          s"vec ${r.getLong(0)}: dequantization error beyond half a step")
      }
    }
    // pure row map: no exchange anywhere in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }
}
