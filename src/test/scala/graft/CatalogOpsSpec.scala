package graft

import graft.tables.CatalogOps
import java.nio.file.Files

class CatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  test("inputPresent gates on file/dir existence (ShortCircuitOperator)") {
    val dir = Files.createTempDirectory("gate").toFile
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
    val out = Files.createTempDirectory("bulk").toFile
    val exported = CatalogOps.exportAllTables(spark, tag, out.getPath)
    assert(exported.toSet === Set(s"${tag}_t1", s"${tag}_t2"))
    val back = spark.read.option("header", "true").csv(s"$out/${tag}_t1")
    assert(back.count() === 1)
    CatalogOps.dropTablesMatching(spark, tag)
  }

  test("inferSchema autodetects from ndjson") {
    val dir = Files.createTempDirectory("infer").toFile
    val f = new java.io.File(dir, "x.json")
    Files.write(f.toPath, """{"a": 1, "b": "x"}""".getBytes)
    val s = CatalogOps.inferSchema(spark, f.getPath)
    assert(s.fieldNames.toSet === Set("a", "b"))
  }
}
