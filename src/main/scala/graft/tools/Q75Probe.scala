package graft.tools
import graft.Tables
import graft.dedup.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of q75_incremental_dedup exactly as the driver
  * bench runs it (sf0.1, corpus = doc_id < 250, batch = rest, two
  * timed runs, noop sink). Answers VERDICT r5 "What's wrong #3".
  */
object Q75Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // static conf: generated-class cache size (default 100). The
      // probe A/Bs it because codegen-cache eviction recompiles
      // classes JIT-cold — the suspected q75 variance mechanism.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_CODEGEN_CACHE", "100"))
      // let AQE coalesce CACHED plan output: without this every cached
      // KB-sized admission frame materializes at the static 32
      // shuffle partitions and each downstream stage pays 32-64
      // near-empty tasks
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_CACHED_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q75] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // steal detector: a daemon thread sleeping 50 ms per tick; if the
    // host starves the JVM, observed tick intervals stretch far past
    // the nominal sleep and `stallMs` accumulates the excess
    val stallMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val ticker = new Thread(() => {
      var prev = System.nanoTime()
      while (true) {
        Thread.sleep(50)
        val now = System.nanoTime()
        val excess = (now - prev) / 1000000L - 50L
        if (excess > 20) stallMs.addAndGet(excess)
        prev = now
      }
    })
    ticker.setDaemon(true); ticker.start()
    // job-level profiler: wall vs summed executor task time — a slow
    // job with small task time is scheduler/driver-side; huge task
    // time is CPU inside tasks. CAVEAT: taskMs is one global counter,
    // so when jobs overlap (broadcast-exchange builds run on separate
    // threads alongside the main action) a job's printed delta also
    // absorbs the overlap's task time — treat job lines as "CPU burned
    // somewhere in this window", and use the per-STAGE lines below
    // (attribution-exact) to pin the burner
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val run = Option(s.taskMetrics).map(_.executorRunTime).getOrElse(0L) / 1e3
        if (run > 2.0)
          println(f"[q75]   stage ${s.stageId} taskTime $run%.1f s tasks ${s.numTasks} ${s.name.take(80)}")
      }
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, (System.nanoTime(), taskMs.get()))
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStart.remove(e.jobId)
        if (st != null) {
          val wall = (System.nanoTime() - st._1) / 1e9
          val task = (taskMs.get() - st._2) / 1e3
          if (wall > 1.0)
            println(f"[q75]   job ${e.jobId} wall $wall%.2f s taskTime $task%.2f s")
        }
      }
    })
    def ts[A](name: String)(f: => A): A = {
      val s0 = stallMs.get(); val t0 = System.nanoTime(); val r = f
      println(f"[q75] $name ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(host stall ${(stallMs.get() - s0) / 1000.0}%.2f s)"); r
    }
    // bench-shape (mirrors the q75 query incl. its per-run cache
    // release, so run 2 honestly re-executes instead of reading run
    // 1's leaked caches)
    def q75run(tag: String): Unit = {
      val docs = Tables.documents(spark, d)
      val corpus = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      val sigs = ts(s"$tag corpus sigs build")(
        NearDup.minhashSignatures(corpus, "doc_id", "text"))
      val (admitted, _, release) = ts(s"$tag manage (eager stages)")(
        NearDup.incrementalDedupManaged(
          sigs, batch, "doc_id", "text", threshold = 0.8))
      try ts(s"$tag final write")(batch.select("doc_id")
        .join(admitted.select("doc_id"), Seq("doc_id"), "left_anti")
        .write.mode("overwrite").format("noop").save())
      finally ts(s"$tag release")(release())
    }
    ts("bench run 1")(q75run("r1"))
    ts("bench run 2")(q75run("r2"))
    ts("bench run 3")(q75run("r3"))

    // stage splits mirroring the checkpointed incrementalDedup body
    val docs = Tables.documents(spark, d)
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val inSigs = t("ckpt inSigs")(
      NearDup.minhashSignatures(batch, "doc_id", "text").localCheckpoint())
    val corpSigs = t("ckpt corpSigs")(
      NearDup.minhashSignatures(corpus, "doc_id", "text").localCheckpoint())
    val inBands = NearDup.lshBands(inSigs, "doc_id", "__sig", 16, 64)
    val cBands = NearDup.lshBands(corpSigs, "doc_id", "__sig", 16, 64)
    val vsCorpus = inBands.select(col("band"), col("band_hash"), col("doc_id").as("id_new"))
      .join(cBands.select(col("band"), col("band_hash"), col("doc_id").as("id_old")),
        Seq("band", "band_hash"))
      .select("id_new", "id_old").distinct()
      .join(inSigs.select(col("doc_id").as("id_new"), col("__sig").as("__sn")), "id_new")
      .join(corpSigs.select(col("doc_id").as("id_old"), col("__sig").as("__so")), "id_old")
      .filter(NearDup.sigJaccardEst(col("__sn"), col("__so")) >= 0.8)
      .select(col("id_new").as("doc_id")).distinct()
    val surv = t("ckpt survivors")(
      inSigs.join(vsCorpus, Seq("doc_id"), "left_anti").localCheckpoint())
    val selfPairs = t("ckpt selfPairs") {
      NearDup.lshCandidatePairs(
          NearDup.lshBands(surv, "doc_id", "__sig", 16, 64), "doc_id")
        .join(surv.select(col("doc_id").as("id_a"), col("__sig").as("__sa")), "id_a")
        .join(surv.select(col("doc_id").as("id_b"), col("__sig").as("__sb")), "id_b")
        .filter(NearDup.sigJaccardEst(col("__sa"), col("__sb")) >= 0.8)
        .select("id_a", "id_b").localCheckpoint()
    }
    val labels = t("CC") {
      val nodes = selfPairs.select(col("id_a").as("node"))
        .unionByName(selfPairs.select(col("id_b").as("node"))).distinct()
      val l = graft.pipelines.CorpusPipeline.minLabelComponents(nodes, selfPairs)
      l.count(); l
    }
    t("final assembly") {
      val keepIds = surv.select(col("doc_id"))
        .join(labels.filter(col("node") =!= col("label"))
            .select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
      val shortRows = batch.filter(
        coalesce(size(graft.text.TextOps.tokens(col("text"))), lit(0)) < 3)
      val admitted = batch.join(keepIds, Seq("doc_id"), "left_semi")
        .unionByName(shortRows)
      batch.select("doc_id")
        .join(admitted.select("doc_id"), Seq("doc_id"), "left_anti")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
