package graft

import graft.sources.{AvroSink, SchemaRegistry}
import org.apache.spark.sql.types._

class AvroSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writeAvro produces genuine Avro object-container files " +
    "(magic bytes, embedded schema, _SUCCESS) and readAvro round-trips " +
    "every envelope type including NULLs") {
    val dir = tempDir("avro_sink").toFile.getPath
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "alpha", 7, 1.5, true,
          Array[Byte](1, 2, 3), java.sql.Timestamp.valueOf("2024-03-01 10:11:12.123456"),
          java.sql.Date.valueOf("2024-03-01")),
        org.apache.spark.sql.Row(2L, null, null, null, null, null, null, null)),
      StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("n", IntegerType), StructField("x", DoubleType),
        StructField("flag", BooleanType), StructField("payload", BinaryType),
        StructField("ts", TimestampType), StructField("day", DateType))))
    AvroSink.writeAvro(df, s"$dir/out")

    // commit protocol artifacts + real Avro magic
    val outDir = new java.io.File(s"$dir/out")
    assert(new java.io.File(outDir, "_SUCCESS").exists, "Hadoop commit marker")
    val avroFiles = outDir.listFiles.filter(_.getName.endsWith(".avro"))
    assert(avroFiles.nonEmpty)
    val head = java.nio.file.Files.readAllBytes(avroFiles.head.toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)), "Avro container magic")

    val back = AvroSink.readAvro(spark, s"$dir/out")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = back.orderBy("id").collect()
    val r1 = rows(0)
    assert(r1.getLong(0) === 1L && r1.getString(1) === "alpha" && r1.getInt(2) === 7)
    assert(r1.getDouble(3) === 1.5 && r1.getBoolean(4) === true)
    assert(r1.getAs[Array[Byte]](5).toSeq === Seq[Byte](1, 2, 3))
    assert(r1.getTimestamp(6) === java.sql.Timestamp.valueOf("2024-03-01 10:11:12.123456"),
      "microsecond precision survives the logical-type round trip")
    assert(r1.getDate(7) === java.sql.Date.valueOf("2024-03-01"))
    val r2 = rows(1)
    assert(r2.getLong(0) === 2L && (1 to 7).forall(r2.isNullAt),
      "nulls survive the [null, T] unions")
  }

  test("writeAvro with a declared schema validates like the reference's " +
    "Avro stage: missing columns error, types conform") {
    val dir = tempDir("avro_schema").toFile.getPath
    val declared = SchemaRegistry.flatSchema("id" -> LongType, "name" -> StringType)
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name") // id is int: must cast
    AvroSink.writeAvro(df, s"$dir/ok", Some(declared))
    val back = AvroSink.readAvro(spark, s"$dir/ok")
    assert(back.schema("id").dataType === LongType, "conformed to declared int64")
    assert(back.count() === 2)
    val e = intercept[IllegalArgumentException](
      AvroSink.writeAvro(df.drop("name"), s"$dir/bad", Some(declared)))
    assert(e.getMessage.contains("name"))
  }

  test("writeAvro rejects complex-typed columns loudly instead of " +
    "toString-encoding them") {
    val dir = tempDir("avro_complex").toFile.getPath
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException](AvroSink.writeAvro(df, s"$dir/out"))
    assert(e.getMessage.contains("flat Avro envelope"))
  }

  test("a failed overwrite job leaves the previous output intact " +
    "(write-new-then-swap)") {
    val dir = tempDir("avro_swap").toFile.getPath
    val good = Seq((1L, "keep"), (2L, "me")).toDF("id", "v")
    AvroSink.writeAvro(good, s"$dir/out")
    val boom = org.apache.spark.sql.functions.udf(
      (x: Long) => { if (x >= 0) throw new RuntimeException("boom"); x })
    intercept[Exception] {
      AvroSink.writeAvro(
        good.withColumn("id", boom(org.apache.spark.sql.functions.col("id"))),
        s"$dir/out")
    }
    val back = AvroSink.readAvro(spark, s"$dir/out")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(back === Seq((1L, "keep"), (2L, "me")),
      "mid-job failure must not destroy the previous output")
  }

  test("structToAvsc emits the reference's flat nullable envelope and " +
    "rejects invalid Avro names") {
    val avsc = AvroSink.structToAvsc(
      SchemaRegistry.flatSchema("id" -> LongType, "ts" -> TimestampType), "qalert")
    assert(avsc.contains(""""name":"id","type":["null","long"],"default":null"""))
    assert(avsc.contains(""""logicalType":"timestamp-micros""""))
    intercept[IllegalArgumentException](AvroSink.structToAvsc(
      SchemaRegistry.flatSchema("bad-name" -> LongType), "r"))
  }
}
