package graft

/** Throwaway r18 probe: min-of-3 timing of the doc-artifacts landing
  * through the production path. Not part of any suite. */
object ArtLandProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    Tables.documents(s, dir).count() // warm the scan
    val xs = (1 to 3).map { _ =>
      operators.DocArtifacts.clearMemo()
      val t0 = System.nanoTime()
      operators.DocArtifacts.ensureLanded(s, dir)
      val x = (System.nanoTime() - t0) / 1e9
      Caches.release(s); x
    }
    println(f"[probe] doc_artifacts landing min ${xs.min}%.3f  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    s.stop()
  }
}
