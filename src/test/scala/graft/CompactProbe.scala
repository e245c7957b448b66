package graft

import org.apache.spark.sql.functions._
import scala.sys

/** Phase breakdown for etl_compact (r18 optimization probe): times the
  * fragmented write, the compacting rewrite, and the two audit count
  * passes separately so the optimization targets the real cost.
  * Run: sbt "Test/runMain graft.CompactProbe" (idle machine). */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[compact] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warm up the session/codegen on the same table
    Tables.events(spark, dir).count()
    if (sys.env.contains("GRAFT_PROBE_V2"))
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 2)
    for (round <- 1 to 2) {
      println(s"[compact] --- round $round")
      val tmp = System.getProperty("java.io.tmpdir")
      val frag = s"$tmp/graft_probe_frag_$round"
      val compacted = s"$tmp/graft_probe_comp_$round"
      val dated = timed("plan") {
        Tables.events(spark, dir)
          .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      }
      timed("frag write (32-way)") {
        dated.repartition(32)
          .write.mode("overwrite").partitionBy("event_date").parquet(frag)
      }
      timed("compact rewrite") {
        spark.read.parquet(frag)
          .repartition(col("event_date"))
          .write.mode("overwrite").partitionBy("event_date").parquet(compacted)
      }
      def counts(path: String, n: String, f: String) =
        spark.read.parquet(path)
          .withColumn("__f", input_file_name())
          .groupBy(col("event_date").cast("string").as("event_date"))
          .agg(count(lit(1)).as(n), countDistinct(col("__f")).as(f))
      timed("counts(frag)") {
        counts(frag, "n_rows_before", "files_before").collect()
      }
      timed("counts(compacted)") {
        counts(compacted, "n_rows_after", "files_after").collect()
      }
      timed("joined audit") {
        counts(frag, "n_rows_before", "files_before")
          .join(counts(compacted, "n_rows_after", "files_after"),
            "event_date")
          .orderBy(col("event_date")).collect()
      }
      val nFrag = new java.io.File(frag).listFiles().map(d =>
        if (d.isDirectory) d.listFiles().length else 1).sum
      println(s"[compact] frag file count (incl dirs) = $nFrag")
    }
    spark.stop()
  }
}
