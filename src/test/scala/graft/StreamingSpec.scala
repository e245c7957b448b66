package graft

import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("stream windowed counts equals the batch tumbling aggregate") {
    val streamed = streaming.Streams.windowedCounts(spark, sfTiny)
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = operators.Events.tumblingWindow(spark, sfTiny)
      .select(col("hour"), col("event_type"), col("n_events"),
        col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("multi-batch sessionize never emits a session batch would merge") {
    // split events into 4 time-ordered files streamed one per trigger —
    // the regression case: a gap-closed session must NOT be emitted until
    // the watermark proves no later batch can merge it
    val splitDir = java.nio.file.Files
      .createTempDirectory("graft_multibatch").toString
    val ev = Tables.events(spark, sfTiny).orderBy("ts")
    val n = ev.count()
    val rows = ev.collect()
    rows.grouped((n / 4 + 1).toInt).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toList.map(r =>
          org.apache.spark.sql.Row(r.getLong(0), unixMicros(r, 1),
            r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))),
        org.apache.spark.sql.types.StructType(Seq(
          f("event_id"), fl("ts"), f("user_id"), fs("event_type"),
          fd("value"), fs("props"))))
        .coalesce(1).write.parquet(s"$splitDir/batch_$i")
      // explicit, strictly-increasing mtimes: the file source orders
      // batches by modification time, and filesystem mtime granularity
      // (or clock skew) could otherwise interleave them
      val t = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$splitDir/batch_$i"))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p, t))
    }
    val stream = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$splitDir/batch_*")
      .withColumn("ts", expr("timestamp_micros(ts)"))
    val streamed = streaming.Streams
      .sessionizePipeline(spark, stream, "graft_multibatch_sessions")
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .collect().map(_.toSeq).toSet
    val batch = operators.Events.sessionize(spark, sfTiny)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"multi-batch emitted merged-in-batch sessions: ${(streamed -- batch).take(3)}")
  }

  private def f(n: String) = org.apache.spark.sql.types
    .StructField(n, org.apache.spark.sql.types.LongType)
  private def fl(n: String) = f(n)
  private def fs(n: String) = org.apache.spark.sql.types
    .StructField(n, org.apache.spark.sql.types.StringType)
  private def fd(n: String) = org.apache.spark.sql.types
    .StructField(n, org.apache.spark.sql.types.DoubleType)
  private def unixMicros(r: org.apache.spark.sql.Row, i: Int): Long = {
    val ts = r.getAs[java.sql.Timestamp](i)
    ts.getTime / 1000L * 1000000L + (ts.getNanos / 1000L) % 1000000L
  }

  test("multi-batch stream funnel converges to the batch funnel") {
    // same 4-file time-ordered replay as the sessionize regression: the
    // max-rev snapshot per user must equal the batch funnel even when
    // stage events arrive across different triggers
    val splitDir = java.nio.file.Files
      .createTempDirectory("graft_funnel_mb").toString
    val ev = Tables.events(spark, sfTiny).orderBy("ts")
    val n = ev.count()
    val rows = ev.collect()
    rows.grouped((n / 4 + 1).toInt).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toList.map(r =>
          org.apache.spark.sql.Row(r.getLong(0), unixMicros(r, 1),
            r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))),
        org.apache.spark.sql.types.StructType(Seq(
          f("event_id"), fl("ts"), f("user_id"), fs("event_type"),
          fd("value"), fs("props"))))
        .coalesce(1).write.parquet(s"$splitDir/batch_$i")
      val t = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$splitDir/batch_$i"))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p, t))
    }
    val stream = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$splitDir/batch_*")
      .withColumn("ts", expr("timestamp_micros(ts)"))
    val streamed = streaming.Streams
      .funnelPipeline(spark, stream, "graft_multibatch_funnel")
      .collect().map(_.toSeq).toSet
    val batch = operators.Events.funnel(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"multi-batch snapshot diverged: ${(streamed -- batch).take(3)} / " +
        s"missing ${(batch -- streamed).take(3)}")
  }

  test("stream quarantine equals the batch quarantine row for row") {
    val st = streaming.Streams.quarantine(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    val batch = operators.Etl.quarantine(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    assert(st.nonEmpty)
    assert(st == batch)
  }

  test("stream top-k leaderboard equals the batch leaderboard") {
    // set-compare: the memory sink persists the sorted limit's ROWS but
    // a table scan need not preserve their order
    val st = streaming.Streams.topkHeavyHitters(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    val batch = operators.Events.topkHeavyHitters(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    assert(st.size == 10)
    assert(st == batch,
      "converged complete-mode snapshot must equal the batch top-k")
  }

  test("stream CDC merge snapshot equals the batch merge") {
    val st = streaming.Streams.cdcMerge(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    val batch = operators.Etl.cdcMerge(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    assert(st.nonEmpty)
    assert(st == batch,
      "converged complete-mode argmax state must equal the batch merge")
  }

  test("stream dedup matches batch distinct counts") {
    val streamed = streaming.Streams.dedup(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sfTiny)
      .select("user_id", "event_type", "ts").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("incremental landing is idempotent across reruns (checkpoint)") {
    val first = streaming.Streams.incrementalLanding(spark, sfTiny)
      .agg(sum("n_events")).first().getLong(0)
    val second = streaming.Streams.incrementalLanding(spark, sfTiny)
      .agg(sum("n_events")).first().getLong(0)
    assert(first == Tables.events(spark, sfTiny).count())
    assert(second == first, "rerun must not re-land already-seen files")
  }

  test("stream-static enrich equals the batch cohort report") {
    val streamed = streaming.Streams.staticEnrich(spark, sfTiny)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val firstEv = Tables.events(spark, sfTiny)
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
        .as("f"))
      .select(col("user_id"), col("f.event_type").as("channel"))
    val batch = Tables.events(spark, sfTiny)
      .join(firstEv, "user_id")
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._2).sum ==
      Tables.events(spark, sfTiny).count(),
      "every event lands in exactly one cohort")
  }

  test("stream sessionize: sentinel-converged snapshot equals batch") {
    // the sentinel pushes the final watermark past every session's
    // end + gap, so the stream flushes ALL state — full row equality
    // with the batch form (the basis of its DuckDB hash oracle)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"),
        col("duration_us"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = rows(operators.Events.sessionize(spark, sfTiny))
    val streamed = rows(streaming.Streams.sessionize(spark, sfTiny))
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("versioned checkpoint: restoring across a state-format break " +
      "fails with the named error, same-version restores pass") {
    import streaming.Streams.{versionedCheckpoint, stateFormatVersion}
    val base = java.nio.file.Files
      .createTempDirectory("graft_chk_ver").toString
    // fresh base: resolves to the current version's subdir
    val p1 = versionedCheckpoint(spark, base)
    assert(p1.endsWith(s"state_v$stateFormatVersion"))
    // same-version re-open (the normal resume): passes, same path
    new java.io.File(p1).mkdirs()
    assert(versionedCheckpoint(spark, base) == p1)
    // a checkpoint written by an OLDER state format: loud, named, with
    // both versions and the prescription in the message — never a
    // silent state-store misread
    val old = java.nio.file.Files
      .createTempDirectory("graft_chk_old").toString
    new java.io.File(s"$old/state_v${stateFormatVersion - 1}").mkdirs()
    val e = intercept[IllegalStateException] { versionedCheckpoint(spark, old) }
    assert(e.getMessage.contains(s"v${stateFormatVersion - 1}"))
    assert(e.getMessage.contains(s"v$stateFormatVersion"))
    assert(e.getMessage.contains("fresh checkpoint"))
    // and the durable seam itself trips it before any query starts: a
    // sessionize pointed at the stale base dies with the same error
    val e2 = intercept[IllegalStateException] {
      streaming.Streams.sessionizePipeline(spark,
        streaming.Streams.eventStream(spark, sfTiny),
        "graft_stream_ver_probe", checkpointBase = Some(old))
    }
    assert(e2.getMessage.contains("state format"))
  }
}
