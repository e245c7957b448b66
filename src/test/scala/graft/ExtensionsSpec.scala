package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The injected single-task-window guard: silent on partitioned and
  * post-aggregate windows, loud (when asked to fail) on a global window
  * over raw data. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def withFail[T](body: => T): T = {
    spark.conf.set(plans.SingleTaskWindowGuard.FailKey, "true")
    try body
    finally spark.conf.unset(plans.SingleTaskWindowGuard.FailKey)
  }

  test("guard rejects a global window over a non-aggregated input") {
    val df = (1 to 100).map(i => (i, i * 2)).toDF("a", "b")
      .withColumn("rn", row_number().over(Window.orderBy(col("b"))))
    val e = intercept[Exception](withFail { df.collect() })
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("single-task window")), e)
  }

  test("guard permits partitioned and post-aggregate windows") {
    withFail {
      val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
      // partitioned: fine
      df.withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"))))
        .collect()
      // global but post-aggregate (bounded report table): fine
      df.groupBy(col("g")).agg(sum(col("v")).as("s"))
        .withColumn("rk", row_number().over(Window.orderBy(col("s"))))
        .collect()
    }
  }

  test("GraftSession sizes shuffle partitions from the caller's " +
      "parallelism, never the 200 default (SURVEY §4)") {
    // the shared test session is GraftSession.local(4): the factory must
    // thread that parallelism into the shuffle conf — on a cluster the
    // caller passes ~2-3x total executor cores the same way
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4",
      "shuffle partitions must track the parallelism GraftSession.local " +
        "was given")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "AQE must be on to re-plan partition counts at runtime")
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("every library operator passes under the failing guard") {
    // the engine's own inventory must never trip its own scale guard —
    // run the batch ops (streaming/write ops have their own harnesses)
    val skip = Set("stream_windowed_counts", "stream_sessionize",
      "stream_dedup", "stream_campaign_stats", "stream_static_enrich",
      "stream_incremental_landing", "etl_partitioned_write",
      "etl_json_landing", "etl_csv_landing", "etl_manifest",
      "etl_compact", "etl_landing_metadata", "q17_bucketed_join")
    withFail {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!skip.contains(name)) {
          try fn(spark, sfTiny).collect()
          catch { case e: Throwable =>
            fail(s"$name tripped the guard: ${e.getMessage.take(200)}")
          } finally {
            // the cache contract across a full-inventory sweep: after
            // release, NO persisted dataset or localCheckpoint RDD may
            // linger — a leak here grows unboundedly over a 190-op
            // Verify session (the r7 hygiene finding)
            Caches.release(spark)
            assert(spark.sparkContext.getPersistentRDDs.isEmpty,
              s"$name leaked persistent RDDs past Caches.release: " +
                spark.sparkContext.getPersistentRDDs.values
                  .map(_.toString).mkString("; "))
          }
        }
      }
    }
  }
}
