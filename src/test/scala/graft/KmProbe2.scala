package graft

/** Throwaway r18 probe: min-of-3 kmeans landing through the
  * production path; prints a centroid checksum for cross-version
  * bit-identity checks. Not part of any suite. */
object KmProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    Tables.embeddings(s, dir).count()
    val xs = (1 to 3).map { _ =>
      operators.Similarity.clearKmeansMemo()
      val t0 = System.nanoTime()
      operators.Similarity.ensureKmeansLanded(s, dir)
      val x = (System.nanoTime() - t0) / 1e9
      Caches.release(s); x
    }
    import org.apache.spark.sql.functions._
    val sum = s.read.parquet(graft.Tables.landingDir("kmeans_cent", dir))
      .select(org.apache.spark.sql.functions.sum(
        xxhash64(col("cluster"), col("cv").cast("string"))
          .cast("decimal(38,0)")).as("cs"))
      .collect()(0).getDecimal(0)
    println(f"[probe] kmeans landing min ${xs.min}%.3f  all ${xs.map(x => f"$x%.2f").mkString(",")}  checksum $sum")
    s.stop()
  }
}
