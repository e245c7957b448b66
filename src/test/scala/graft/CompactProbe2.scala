package graft

import org.apache.spark.sql.functions._
import scala.sys

/** Variant probe: where do the frag write's seconds actually go. */
object CompactProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[compact2] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    Tables.events(spark, dir).count()
    val tmp = System.getProperty("java.io.tmpdir")
    val dated = Tables.events(spark, dir)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
    for (round <- 1 to 2) {
      println(s"[compact2] --- round $round")
      timed("scan+repartition32 (noop)") {
        dated.repartition(32)
          .write.format("noop").mode("overwrite").save()
      }
      timed("plain write 32 files, no partBy") {
        dated.repartition(32)
          .write.mode("overwrite").parquet(s"$tmp/gp2_plain_$round")
      }
      timed("partBy write, rr32 input (960f)") {
        dated.repartition(32)
          .write.mode("overwrite").partitionBy("event_date")
          .parquet(s"$tmp/gp2_rr_$round")
      }
      timed("partBy write, date-hash input (30f)") {
        dated.repartition(col("event_date"))
          .write.mode("overwrite").partitionBy("event_date")
          .parquet(s"$tmp/gp2_dh_$round")
      }
      timed("partBy 960f, uncompressed") {
        dated.repartition(32)
          .write.mode("overwrite").option("compression", "uncompressed")
          .partitionBy("event_date").parquet(s"$tmp/gp2_un_$round")
      }
      timed("partBy 960f, small block") {
        dated.repartition(32)
          .write.mode("overwrite").option("parquet.block.size", "1048576")
          .partitionBy("event_date").parquet(s"$tmp/gp2_sb_$round")
      }
      timed("partBy 960f, concurrent writers") {
        spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "64")
        try dated.repartition(32)
          .write.mode("overwrite").partitionBy("event_date")
          .parquet(s"$tmp/gp2_cw_$round")
        finally spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
      }
      timed("read 960-file frag (noop)") {
        spark.read.parquet(s"$tmp/gp2_rr_$round")
          .write.format("noop").mode("overwrite").save()
      }
      timed("read 30-file (noop)") {
        spark.read.parquet(s"$tmp/gp2_dh_$round")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
