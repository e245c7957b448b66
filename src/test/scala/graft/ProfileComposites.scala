package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** One-off profiler for the constant-band composites (ops whose
  * Spark/DuckDB ratio is dominated by fixed per-job constants on a
  * sub-0.3s DuckDB denominator): wall time plus JOB and STAGE counts per
  * op, so the PLANS.md floor notes rest on measured stage structure
  * rather than eyeballed plans.
  * Run: sbt "Test/runMain graft.ProfileComposites" (idle machine). */
object ProfileComposites {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val ops = sys.env.get("SPARK_GRAFT_PROFILE_OPS")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("stream_sessionize", "q24_nested_agg",
        "q2_min_cost_supplier", "txt_tfidf_topk", "txt_ccnet_bucket",
        "txt_unigram_logprob", "dedup_source_overlap", "emb_knn_graph"))
    // pre-land shared artifacts so op lines are the op alone
    operators.DocArtifacts.ensureLanded(spark, dir)
    operators.Dedup.ensureTuningLanded(spark, dir)
    operators.Similarity.ensureKmeansLanded(spark, dir)
    operators.Similarity.ensureMomentsLanded(spark, dir)
    ops.foreach { name => // warm-up pass
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Caches.release(spark)
    }
    for (round <- 1 to 3; name <- ops) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.release(spark)
      Thread.sleep(200) // let stage-completed events drain
      println(f"[profile] r$round $name%-24s ${dt}%6.2fs " +
        f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
    }
    spark.stop()
  }
}
