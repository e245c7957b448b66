package graft

/** Throwaway r18 probe: min-of-3 timing of the dedup tuning landing
  * plus the minhash verify stages, one JVM. Not part of any suite. */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm
    operators.DocArtifacts.ensureLanded(s, dir)
    Caches.release(s)
    val land = (1 to 3).map { _ =>
      operators.Dedup.clearTuningMemo()
      val x = t(operators.Dedup.ensureTuningLanded(s, dir))
      Caches.release(s); x
    }
    val lsh = (1 to 3).map { _ =>
      val x = t(SparkEntry.queries("dedup_minhash_lsh")(s, dir)
        .write.format("noop").mode("overwrite").save())
      Caches.release(s); x
    }
    val inc = (1 to 3).map { _ =>
      val x = t(SparkEntry.queries("dedup_minhash_incremental")(s, dir)
        .write.format("noop").mode("overwrite").save())
      Caches.release(s); x
    }
    println(f"[probe] tuning_landing min ${land.min}%.3f  all ${land.map(x => f"$x%.2f").mkString(",")}")
    println(f"[probe] minhash_lsh    min ${lsh.min}%.3f  all ${lsh.map(x => f"$x%.2f").mkString(",")}")
    println(f"[probe] minhash_incr   min ${inc.min}%.3f  all ${inc.map(x => f"$x%.2f").mkString(",")}")
    s.stop()
  }
}
