package graft

/** Throwaway r18 probe: stream_sessionize wall + per-batch progress. */
object SessProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/testdata/sf3")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.graft.debug.streamProgress", "true")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    t("warmup")(Tables.events(s, dir).count())
    for (i <- 1 to 2) {
      val df = t(s"sessionize $i")(
        SparkEntry.queries("stream_sessionize")(s, dir))
      t(s"noop $i")(df.write.format("noop").mode("overwrite").save())
      Caches.release(s)
    }
    s.stop()
  }
}
