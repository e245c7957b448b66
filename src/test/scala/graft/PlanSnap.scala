package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a comma-list of ops into
  * plans/<tag>/<op>_<suffix>.txt — the optimization-round evidence trail
  * (OPTIMIZATION_r18.md references these files).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_PLAN_OPS (comma list),
  * SPARK_GRAFT_PLAN_SUFFIX (before|after), SPARK_GRAFT_PLAN_TAG (r18).
  * Run: sbt "Test/runMain graft.PlanSnap". */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val ops = sys.env.getOrElse("SPARK_GRAFT_PLAN_OPS", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r18")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"/root/repo/plans/$tag")
    Files.createDirectories(outDir)
    ops.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        s"== $name ($suffix, $dir) ==\n" + formatted)
      Caches.release(spark)
      println(s"[plansnap] wrote $name" + s"_$suffix.txt")
    }
    spark.stop()
  }
}
