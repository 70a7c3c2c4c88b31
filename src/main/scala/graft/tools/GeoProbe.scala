package graft.tools

import graft.geo.Geo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the gridRevGeoZone verify step: pre-parsed ring structs +
  * codegen RingsContain vs the old per-candidate-row `(wkt, x, y)` UDF
  * re-parse, at growing polygon counts (the national-scale case the
  * grid path exists for). Backs the SCALE.md table for VERDICT r5
  * "What's wrong #1".
  */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // synthetic zone grid: nZ square zones of ~40 vertices tiling a
    // strip, points scattered so each lands in one zone
    def zonesDf(nZ: Int) = (0 until nZ).map { i =>
      val x0 = (i % 1000) * 0.02; val y0 = (i / 1000) * 0.02
      val n = 40
      val pts = (0 until n).map { k =>
        val ang = 2 * math.Pi * k / n
        f"${x0 + 0.01 + 0.0099 * math.cos(ang)}%.6f ${y0 + 0.01 + 0.0099 * math.sin(ang)}%.6f"
      }
      val ring = (pts :+ pts.head).mkString(", ")
      (s"zone_$i", s"POLYGON(($ring))", 0L, null.asInstanceOf[java.lang.Long])
    }.toDF("zone", "wkt", "start_unix", "end_unix")
      .withColumn("end_unix", col("end_unix").cast("long"))

    def pointsDf(nP: Int, nZ: Int) = (0 until nP).map { i =>
      val z = i % nZ
      ((i.toLong, (z % 1000) * 0.02 + 0.01 + (i % 7 - 3) * 0.001,
        (z / 1000) * 0.02 + 0.01 + (i % 5 - 2) * 0.001, 100L))
    }.toDF("id", "long", "lat", "create_date_unix")

    // old formulation: WKT text through the join, parse per candidate row
    def gridOld(points: org.apache.spark.sql.DataFrame,
                zones: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val cellDeg = 0.01
      def packCells = udf((wkt: String) =>
        Geo.parseWkt(wkt).flatMap { p =>
          val x0 = math.floor(p.minX / cellDeg).toLong; val x1 = math.floor(p.maxX / cellDeg).toLong
          val y0 = math.floor(p.minY / cellDeg).toLong; val y1 = math.floor(p.maxY / cellDeg).toLong
          for (cx <- x0 to x1; cy <- y0 to y1) yield (cx << 32) | (cy & 0xffffffffL)
        }.distinct.toArray)
      val containsF = udf((wkt: String, x: java.lang.Double, y: java.lang.Double) =>
        x != null && y != null && Geo.ringsContain(Geo.parseWkt(wkt), x, y))
      val zoneCells = zones.select(col("zone").as("__zn"), col("wkt").as("__wkt"),
        col("start_unix").as("__zs"), coalesce(col("end_unix"), lit(Long.MaxValue)).as("__ze"),
        explode(packCells(col("wkt"))).as("__cell"))
      val cx = floor(col("long") / cellDeg).cast("long")
      val cy = floor(col("lat") / cellDeg).cast("long")
      val keyed = points.select(col("id"), col("lat"), col("long"), col("create_date_unix"),
          shiftleft(cx, 32).bitwiseOR(cy.bitwiseAND(lit(0xffffffffL))).as("__cell"))
        .where(col("lat").isNotNull && col("long").isNotNull)
      val tt = coalesce(col("create_date_unix"), lit(Long.MaxValue))
      keyed.join(zoneCells, "__cell")
        .where(col("__zs") <= tt && tt <= col("__ze")
          && containsF(col("__wkt"), col("long"), col("lat")))
        .groupBy("id").agg(min(col("__zn")).as("hood"))
    }

    for (nZ <- Seq(2000, 20000)) {
      val zs = zonesDf(nZ).localCheckpoint()
      val ps = pointsDf(200000, nZ).localCheckpoint()
      // warm-up then measure
      val newT = { t(Geo.gridRevGeoZone(ps, zs, "hood", "id").filter(col("hood").isNotNull).count())
        math.min(
          t(Geo.gridRevGeoZone(ps, zs, "hood", "id").filter(col("hood").isNotNull).count()),
          t(Geo.gridRevGeoZone(ps, zs, "hood", "id").filter(col("hood").isNotNull).count())) }
      val oldT = { t(gridOld(ps, zs).count())
        math.min(t(gridOld(ps, zs).count()), t(gridOld(ps, zs).count())) }
      val nMatch = Geo.gridRevGeoZone(ps, zs, "hood", "id")
        .filter(col("hood").isNotNull).count()
      println(f"[geo] zones=$nZ%6d points=200000 matched=$nMatch%6d " +
        f"preparsed=$newT%6.2f s wktreparse=$oldT%6.2f s speedup=${oldT / newT}%4.1f x")
    }
    spark.stop()
  }
}
