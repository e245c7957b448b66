package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

/** r19 A/B (verdict item 4): Complete-mode snapshot vs Update-mode +
  * driver-side dedupe for the cheapest Complete-mode scaffolding ops
  * (stream_campaign_stats, stream_static_enrich). With no-data batches
  * already disabled, one AvailableNow pass updates every key exactly
  * once, so the update-mode memory sink holds the same rows as the
  * complete snapshot — the A/B isolates the sink/state write cost of
  * re-emitting the whole table. Paired min-of-3 per mode.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.StreamModeProbe". */
object StreamModeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.streaming.Streams.statePartitionsFor(
        Tables.rowCount(spark, dir, "events")).toString)

    def eventStream(s: SparkSession) =
      graft.streaming.Streams.eventStream(s, dir)
    def campaignAgg(s: SparkSession) = {
      val campaign =
        get_json_object(col("props"), "$.k").cast("int") % lit(10)
      eventStream(s).withColumn("campaign", campaign)
        .groupBy(col("campaign"))
        .agg(count(when(col("event_type") === "view", 1)).as("n_views"),
          count(when(col("event_type") === "click", 1)).as("n_clicks"),
          count(when(col("event_type") === "purchase", 1))
            .as("n_purchases"),
          sum(when(col("event_type") === "purchase",
            col("value").cast(DecimalType(18, 2)))).as("revenue_dec"))
    }
    def enrichAgg(s: SparkSession) = {
      val firstEv = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
          .as("f"))
        .select(col("user_id"), col("f.event_type").as("channel"))
      eventStream(s).join(firstEv, "user_id")
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).as("rev_dec"))
    }

    var qn = 0
    def runMode(tag: String, mode: OutputMode,
        agg: SparkSession => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        qn += 1
        val name = s"probe_$qn"
        val t0 = System.nanoTime()
        val q = agg(spark).writeStream.outputMode(mode)
          .format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
        val n = spark.table(name).collect().length
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.dropTempView(name)
        dt -> n
      }
      println(f"[streamprobe] $tag%-28s min=${ts.map(_._1).min}%.3f " +
        s"rows=${ts.head._2} runs=" +
        ts.map(x => f"${x._1}%.3f").mkString(","))
    }
    runMode("campaign Complete", OutputMode.Complete, campaignAgg)
    runMode("campaign Update", OutputMode.Update, campaignAgg)
    runMode("enrich Complete", OutputMode.Complete, enrichAgg)
    runMode("enrich Update", OutputMode.Update, enrichAgg)
    // second interleave to cancel drift
    runMode("campaign Complete (2)", OutputMode.Complete, campaignAgg)
    runMode("campaign Update (2)", OutputMode.Update, campaignAgg)
    spark.stop()
  }
}
