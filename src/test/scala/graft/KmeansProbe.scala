package graft

/** One-off scale probe for the quantizer landing (SURVEY §6's k-cap
  * scaling table): times ensureKmeansLanded on an arbitrary embeddings
  * dir and reports n / k / wall / assigned-row count. The past-
  * broadcast-cap corpora it probes are GenScale embeddings-only
  * replicas (`Test/runMain graft.GenScale <src> <dst> <k> embeddings`).
  * Run: sbt "Test/runMain graft.KmeansProbe <dir>" (idle machine). */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf4m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val n = Tables.rowCount(spark, dir, "embeddings")
    val k = operators.Similarity.quantizerK(spark, dir)
    val t0 = System.nanoTime
    // SPARK_GRAFT_TWOLEVEL_K forces the past-134M two-level landing at
    // probe scale (coarse cells = the given k1) — the end-to-end drive
    // of trainKmeansTwoLevel the bundled SFs can never reach
    sys.env.get("SPARK_GRAFT_TWOLEVEL_K") match {
      case Some(k1) => operators.Similarity
        .trainKmeansTwoLevel(spark, dir, n, k1.toInt, 5)
      case None => operators.Similarity.ensureKmeansLanded(spark, dir)
    }
    val wall = (System.nanoTime - t0) / 1e9
    val assigned = spark.read
      .parquet(operators.Similarity.kmeansAssignDir(dir)).count()
    val cells = spark.read
      .parquet(operators.Similarity.kmeansAssignDir(dir))
      .select("cluster").distinct().count()
    println(f"[kmeans-probe] n=$n k=$k wall=$wall%.1fs " +
      s"assigned=$assigned nonempty_cells=$cells")
    spark.stop()
  }
}
