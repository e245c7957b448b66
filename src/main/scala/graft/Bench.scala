package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (SURVEY §6): runs the full operator inventory against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall times.
  * Queries materialize through the noop sink so timing covers the whole
  * plan (count() alone lets Spark skip column decode on some plans).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up on the smallest SF so headline numbers measure
    // the operators, not JIT compilation of generated code.
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, "/root/testdata/sf0.001").count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case _: Throwable => false }
      spark.catalog.clearCache() // ops persist derived tables
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
