package graft

import graft.tables.CatalogOps
import java.nio.file.Files

class CatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  test("inputPresent gates on file/dir existence (ShortCircuitOperator)") {
    val dir = tempDir("gate").toFile
    assert(!CatalogOps.inputPresent(spark, s"$dir/absent"))
    val f = new java.io.File(dir, "drop.json")
    Files.write(f.toPath, "{}".getBytes)
    assert(CatalogOps.inputPresent(spark, f.getPath))
    val empty = new java.io.File(dir, "emptydir"); empty.mkdirs()
    assert(!CatalogOps.inputPresent(spark, empty.getPath), "empty dir = nothing to process")
  }

  test("dropTablesMatching drops the scratch group (EXECUTE IMMEDIATE loop)") {
    val tag = "scratch_" + System.nanoTime()
    Seq((1, "a")).toDF("id", "v").write.saveAsTable(s"${tag}_one")
    Seq((2, "b")).toDF("id", "v").write.saveAsTable(s"${tag}_two")
    Seq((3, "c")).toDF("id", "v").write.saveAsTable(s"keep_$tag")
    // a matching temp VIEW must be ignored, not DROP TABLE'd (throws
    // on Spark 4) — listTables includes session views
    Seq((4, "d")).toDF("id", "v").createOrReplaceTempView(s"${tag}_view")
    val dropped = CatalogOps.dropTablesMatching(spark, tag)
    assert(dropped.toSet === Set(s"${tag}_one", s"${tag}_two"))
    val remaining = spark.catalog.listTables().collect().map(_.name).toSet
    assert(!remaining.contains(s"${tag}_one"))
    assert(remaining.contains(s"keep_$tag"))
    assert(remaining.contains(s"${tag}_view"), "temp view untouched")
    spark.catalog.dropTempView(s"${tag}_view")
    CatalogOps.dropTablesMatching(spark, s"keep_$tag")
  }

  test("splitByTimeRange bounds shard count") {
    val df = Tables.events(spark, sf("sf0.001"))
    assert(CatalogOps.splitByTimeRange(df, "ts", 4).rdd.getNumPartitions === 4)
  }

  test("exportAllTables: catalog loop + per-table CSV (bulk export)") {
    val tag = "exp_" + System.nanoTime()
    Seq((1, "a")).toDF("id", "v").write.saveAsTable(s"${tag}_t1")
    Seq((2, "b")).toDF("id", "v").write.saveAsTable(s"${tag}_t2")
    val out = tempDir("bulk").toFile
    val exported = CatalogOps.exportAllTables(spark, tag, out.getPath)
    assert(exported.toSet === Set(s"${tag}_t1", s"${tag}_t2"))
    val back = spark.read.option("header", "true").csv(s"$out/${tag}_t1")
    assert(back.count() === 1)
    CatalogOps.dropTablesMatching(spark, tag)
  }

  test("inferSchema autodetects from ndjson") {
    val dir = tempDir("infer").toFile
    val f = new java.io.File(dir, "x.json")
    Files.write(f.toPath, """{"a": 1, "b": "x"}""".getBytes)
    val s = CatalogOps.inferSchema(spark, f.getPath)
    assert(s.fieldNames.toSet === Set("a", "b"))
  }

  test("profileTable: hand-computed per-column counts, NULL handling, " +
    "lexicographic min/max ('10' < '9'), stringify override, one-pass " +
    "no-Expand plan") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (9L, Option("a"), Option(1.25)),
      (10L, Option("a"), None),
      (10L, None, Option(2.5))
    ).toDF("id", "tag", "amt")
    val out = CatalogOps.profileTable(df, Map(
      "amt" -> col("amt").cast("decimal(18,2)").cast("string")))
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toMap
    // id: 3 rows, 0 nulls, distinct {"9","10"}, min "10" (string order!)
    assert(rows("id") === ((3L, 0L, 2L, Some("10"), Some("9"))))
    assert(rows("tag") === ((3L, 1L, 1L, Some("a"), Some("a"))))
    // amt through DECIMAL(18,2): {"1.25","2.50"}
    assert(rows("amt") === ((3L, 1L, 2L, Some("1.25"), Some("2.50"))))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"no Expand expected:\n$plan")
    // single scan of the source: exactly one Generate (explode) node
    // in the logical plan (the physical string repeats it in AQE's
    // initial-plan section)
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val gens = out.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.length === 1, s"one explode expected:\n$plan")
  }

  test("profileTable: an all-NULL column reports NULL min/max and zero " +
    "distincts") {
    import org.apache.spark.sql.functions._
    val df = Seq(1, 2).toDF("x").withColumn("n", lit(null).cast("string"))
    val rows = CatalogOps.profileTable(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)))).toMap
    assert(rows("n") === ((2L, 2L, 0L, None)))
  }
}
