package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  private def cfg(landing: String) = Pipeline.Config(
    sources = Seq(
      Pipeline.Source("marketing", "part", limit = Some(100)),
      Pipeline.Source("ads", "events"),
      Pipeline.Source("sales", "orders"),
      Pipeline.Source("crm", "customer"),
      Pipeline.Source("broken", "no_such_table")),
    landingDir = landing,
    runDate = "2026-08-12")

  test("pipeline lands every healthy source and continues past failures") {
    val landing = java.nio.file.Files
      .createTempDirectory("graft_pipeline").toString
    val summary = Pipeline.run(spark, sfTiny, cfg(landing)).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(summary("marketing") == (("ok", 100L)))
    assert(summary("ads")._1 == "ok", "events source must land (NANOS ts)")
    assert(summary("sales")._1 == "ok" && summary("sales")._2 > 0)
    assert(summary("crm")._1 == "ok")
    assert(summary("broken")._1 == "error")
    // landed layout is the reference's date-partitioned shape
    assert(new java.io.File(s"$landing/sales/date=2026-08-12").exists())
    // the execution summary itself lands in the metadata area
    val metaDir = s"$landing/metadata/executions/date=2026-08-12"
    assert(new java.io.File(metaDir).exists())
    assert(spark.read.parquet(metaDir).count() == 5)
    // landed records carry the standardized header
    val landed = spark.read.parquet(s"$landing/sales/date=2026-08-12")
    assert(landed.columns.toSet ==
      Set("record_id", "source", "extracted_date", "raw_data"))
    assert(landed.filter(length(col("record_id")) =!= 12).count() == 0)
    // rerun is idempotent (overwrite semantics, deterministic ids)
    val again = Pipeline.run(spark, sfTiny, cfg(landing)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again("sales") == summary("sales")._2)
  }

  test("pluggable extract leg: flaky source recovers on retry, dead " +
      "source records its error, run continues") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val extractor = new Pipeline.Extractor {
      def extract(s: org.apache.spark.sql.SparkSession,
          src: Pipeline.Source): org.apache.spark.sql.DataFrame =
        src.name match {
          case "flaky" =>
            // fails twice, succeeds on the third attempt (= retry 2)
            if (calls.incrementAndGet() <= 2)
              throw new RuntimeException("transient extract failure")
            Tables.load(s, sfTiny, src.table)
          case "dead" => throw new RuntimeException("endpoint down")
          case _ => Tables.load(s, sfTiny, src.table)
        }
    }
    val landing = java.nio.file.Files
      .createTempDirectory("graft_pipeline_ext").toString
    val config = Pipeline.Config(
      sources = Seq(
        Pipeline.Source("flaky", "region", maxRetries = 2),
        Pipeline.Source("dead", "nation", maxRetries = 1),
        Pipeline.Source("steady", "region")),
      landingDir = landing, runDate = "2026-08-12")
    val summary = Pipeline.run(spark, config, extractor).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(3))).toMap
    assert(summary("flaky")._1 == "ok", "must succeed on retry 2")
    assert(calls.get() == 3, "1 initial attempt + 2 retries")
    assert(summary("dead")._1 == "error")
    assert(summary("dead")._2.contains("endpoint down"),
      "the recorded error must carry the extract failure")
    assert(summary("steady")._1 == "ok",
      "a dead source must not stop later sources")
  }

  test("HTTP-shaped extractor unwraps the reference's response envelopes") {
    val bodies = Map(
      "api://crm" -> """{"results": [{"k": 1}, {"k": 2}]}""",
      "api://marketing" -> """{"products": [{"k": 3}]}""",
      "api://sales" -> """[{"k": 4}, {"k": 5}, {"k": 6}]""",
      "api://single" -> """{"k": 7}""")
    val ex = new Pipeline.JsonResponseExtractor(bodies(_))
    def rows(url: String): Seq[Long] =
      ex.extract(spark, Pipeline.Source("s", "", url = Some(url)))
        .select(col("k")).collect().map(_.getLong(0)).toSeq.sorted
    assert(rows("api://crm") == Seq(1L, 2L), "results envelope")
    assert(rows("api://marketing") == Seq(3L), "products envelope")
    assert(rows("api://sales") == Seq(4L, 5L, 6L), "bare array")
    assert(rows("api://single") == Seq(7L), "single object wraps to one row")
  }

  test("authed source sends its bearer token; a missing credential is a " +
      "recorded error; the secret never reaches the summary") {
    val secret = "sekrit-token-9f2c"
    val seenAuth = new java.util.concurrent.atomic.AtomicReference[String]("")
    val ex = new Pipeline.JsonResponseExtractor(
      fetch = (url, headers) => {
        if (url.contains("authed")) {
          seenAuth.set(headers.getOrElse("Authorization", ""))
          assert(headers("Content-Type") == "application/json")
        }
        """{"results": [{"k": 1}, {"k": 2}]}"""
      },
      tokenFor = name => if (name == "authed") Some(secret) else None)
    val landing = java.nio.file.Files
      .createTempDirectory("graft_pipeline_auth").toString
    val config = Pipeline.Config(
      sources = Seq(
        Pipeline.Source("authed", "", url = Some("api://authed"),
          authRequired = true),
        Pipeline.Source("no_cred", "", url = Some("api://no_cred"),
          authRequired = true),
        Pipeline.Source("open", "", url = Some("api://open"))),
      landingDir = landing, runDate = "2026-08-12")
    val rows = Pipeline.run(spark, config, ex).collect()
    val summary = rows
      .map(r => r.getString(0) -> (r.getString(1), r.getString(3))).toMap
    assert(summary("authed")._1 == "ok")
    assert(seenAuth.get() == s"Bearer $secret",
      "the authed request must carry the bearer header")
    assert(summary("no_cred")._1 == "error")
    assert(summary("no_cred")._2.contains("requires auth"),
      "the auth failure must name itself")
    assert(summary("open")._1 == "ok")
    // the credential must never appear in any summary field
    assert(!rows.mkString("|").contains(secret),
      "secret leaked into the execution summary")
  }

  test("per-source rate limit is honored across retries") {
    val stamps = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val extractor = new Pipeline.Extractor {
      def extract(s: org.apache.spark.sql.SparkSession,
          src: Pipeline.Source): org.apache.spark.sql.DataFrame = {
        stamps.add(System.nanoTime())
        // fail twice so the throttle must gate retries, not just sources
        if (stamps.size <= 2) throw new RuntimeException("transient")
        Tables.load(s, sfTiny, src.table)
      }
    }
    val landing = java.nio.file.Files
      .createTempDirectory("graft_pipeline_rl").toString
    val config = Pipeline.Config(
      sources = Seq(Pipeline.Source("limited", "region", maxRetries = 2,
        rateLimitPerSec = Some(5.0))), // >= 200ms between attempts
      landingDir = landing, runDate = "2026-08-12")
    val summary = Pipeline.run(spark, config, extractor).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(summary("limited") == "ok")
    val ts = stamps.toArray(Array.empty[java.lang.Long]).map(_.longValue)
    assert(ts.length == 3, "1 initial + 2 retries")
    val gaps = ts.sorted.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.forall(_ >= 190L * 1000000L),
      s"attempt gaps must respect the 200ms min interval: $gaps")
  }

  test("monitoring emission lands per-source metrics and alarms for " +
      "erroring sources (reference monitoring stanza)") {
    val landing = java.nio.file.Files
      .createTempDirectory("graft_pipeline_mon").toString
    val config = Pipeline.Config(
      sources = Seq(
        Pipeline.Source("healthy", "region"),
        Pipeline.Source("flappy", "no_such_table", maxRetries = 2)),
      landingDir = landing, runDate = "2026-08-12",
      monitoring = Pipeline.Monitoring(
        metricsEnabled = true, alarmEmail = Some("oncall@example.com")))
    Pipeline.run(spark, sfTiny, config).collect()
    val metrics = spark.read
      .parquet(s"$landing/metadata/metrics/date=2026-08-12")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(metrics("healthy")._1 == "ok" && metrics("healthy")._2 > 0)
    assert(metrics("healthy")._3 == 1L, "healthy source: one attempt")
    assert(metrics("flappy") == (("error", 0L, 3L)),
      "flappy source: 1 initial + 2 retries, all failed")
    val alarms = spark.read
      .parquet(s"$landing/metadata/alarms/date=2026-08-12").collect()
    assert(alarms.map(_.getString(0)).toSeq == Seq("flappy"),
      "only the erroring source alarms")
    assert(alarms.head.getString(2) == "oncall@example.com")
    // metrics are opt-in: a run without the stanza lands none
    val landing2 = java.nio.file.Files
      .createTempDirectory("graft_pipeline_mon2").toString
    Pipeline.run(spark, sfTiny,
      config.copy(landingDir = landing2,
        monitoring = Pipeline.Monitoring())).collect()
    assert(!new java.io.File(s"$landing2/metadata/metrics").exists())
  }

  test("config file parses auth_required and rate_limit (reference " +
      "registry fields)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_auth")
    val cfgPath = dir.resolve("config.json")
    java.nio.file.Files.writeString(cfgPath,
      """{ "data_sources": {
        |    "crm": {"url": "api://crm", "auth_required": true,
        |            "rate_limit": 2.5},
        |    "open": {"table": "region"}
        |  },
        |  "monitoring": { "metrics_enabled": true,
        |                  "alarm_email": "oncall@example.com" } }"""
        .stripMargin)
    val config = Pipeline.loadConfig(cfgPath.toString,
      dir.resolve("landing").toString, "2026-08-12")
    val crm = config.sources.find(_.name == "crm").get
    assert(crm.authRequired && crm.rateLimitPerSec.contains(2.5))
    val open = config.sources.find(_.name == "open").get
    assert(!open.authRequired && open.rateLimitPerSec.isEmpty)
    assert(config.monitoring.metricsEnabled)
    assert(config.monitoring.alarmEmail.contains("oncall@example.com"))
  }

  test("a source exceeding its timeout is cancelled and recorded; the " +
      "run continues") {
    val extractor = new Pipeline.Extractor {
      def extract(s: org.apache.spark.sql.SparkSession,
          src: Pipeline.Source): org.apache.spark.sql.DataFrame = {
        if (src.name == "slow") Thread.sleep(30000)
        Tables.load(s, sfTiny, src.table)
      }
    }
    val landing = java.nio.file.Files
      .createTempDirectory("graft_pipeline_to").toString
    val config = Pipeline.Config(
      sources = Seq(
        Pipeline.Source("slow", "region", timeoutSec = Some(1)),
        Pipeline.Source("after", "region")),
      landingDir = landing, runDate = "2026-08-12")
    val t0 = System.nanoTime()
    val summary = Pipeline.run(spark, config, extractor).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(summary("slow") == "error", "timeout records an error")
    assert(summary("after") == "ok")
    assert((System.nanoTime() - t0) / 1e9 < 25,
      "the run must not wait out the slow source")
  }

  test("pipeline runs from a JSON config file (reference registry shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val cfgPath = dir.resolve("config.json")
    java.nio.file.Files.writeString(cfgPath,
      """{ "data_sources": {
        |    "marketing": {"table": "part", "limit": 100, "format": "json"},
        |    "ads":       {"table": "events"},
        |    "broken":    {"table": "no_such_table", "retry_attempts": 2},
        |    "crm":       {"url": "api://crm", "timeout": 30}
        |  },
        |  "processing": {"error_handling": "continue",
        |                 "retry_attempts": 1} }""".stripMargin)
    val config = Pipeline.loadConfig(cfgPath.toString,
      dir.resolve("landing").toString, "2026-08-12")
    assert(config.sources.map(_.name) ==
      Seq("marketing", "ads", "broken", "crm"))
    assert(config.sources.head.limit.contains(100))
    assert(config.sources.head.maxRetries == 1,   "processing default")
    assert(config.sources(2).maxRetries == 2,     "per-source override")
    assert(config.sources.last.url.contains("api://crm"), "url source")
    assert(config.sources.last.timeoutSec.contains(30))
    assert(config.errorHandling == "continue")
    assert(config.sources.head.format == "json", "per-source format")
    assert(config.sources(1).format == "parquet", "format default")
    val summary = Pipeline.run(spark, sfTiny, config).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(summary("marketing") == (("ok", 100L)))
    assert(summary("ads")._1 == "ok")
    assert(summary("broken")._1 == "error",
      "bad source must exhaust retries then continue")
    // the JSON-format source landed newline-JSON (reference load_to_s3)
    val landedJson = new java.io.File(
      dir.resolve("landing/marketing/date=2026-08-12").toString)
    assert(landedJson.listFiles().exists(_.getName.endsWith(".json")))
  }

  test("schedule stanza parses the reference EventBridge shapes and " +
      "drives an incremental window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_sched")
    val cfgPath = dir.resolve("config.json")
    // the reference's own expression (scripts/setup_schedule.py:13)
    java.nio.file.Files.writeString(cfgPath,
      """{ "data_sources": { "ads": {"table": "events"} },
        |  "schedule": { "expression": "cron(0 2 * * ? *)",
        |                "enabled": true } }""".stripMargin)
    val config = Pipeline.loadConfig(cfgPath.toString,
      dir.resolve("landing").toString, "2024-01-10")
    val sched = config.schedule.get
    assert(sched.enabled)
    assert(sched.periodSeconds.contains(86400L), "daily cron is 1/day")
    assert(sched.windowFor("2024-01-10") == (("2024-01-10", "2024-01-11")))
    // rate forms
    assert(Pipeline.Schedule("rate(12 hours)").periodSeconds
      .contains(43200L))
    assert(Pipeline.Schedule("rate(3 days)").windowFor("2024-01-10") ==
      (("2024-01-10", "2024-01-13")))
    // an aperiodic cron parses (scheduler-side concern), garbage fails
    assert(Pipeline.Schedule("cron(0 2 ? * MON *)").periodSeconds.isEmpty)
    intercept[IllegalArgumentException] {
      Pipeline.Schedule("every tuesday")
    }
    // a 5-field Unix cron is NOT the EventBridge form: reject at parse,
    // don't let it pass as "valid but aperiodic"
    intercept[IllegalArgumentException] {
      Pipeline.Schedule("cron(0 2 * * 1)")
    }
    // an aperiodic cron has no derivable processing window — a silent
    // 1-day default would skip 6/7 of a weekly cadence
    intercept[IllegalArgumentException] {
      Pipeline.Schedule("cron(0 2 ? * MON *)").windowFor("2024-01-10")
    }
    // the window drives the daily-cadence incremental batch: every
    // event the batch keeps falls inside the schedule's window
    val (startD, endD) = sched.windowFor("2024-01-10")
    val win = Tables.events(spark, sfTiny)
      .filter(col("ts") >= lit(startD).cast("timestamp") &&
        col("ts") < lit(endD).cast("timestamp"))
    val inc = operators.Etl.incremental(spark, sfTiny)
      .filter(col("ts") >= lit(startD).cast("timestamp") &&
        col("ts") < lit(endD).cast("timestamp"))
    assert(win.count() > 0)
    assert(inc.agg(org.apache.spark.sql.functions.sum(col("n_dups")))
      .first().getLong(0) == win.count(),
      "window-filtered incremental accounts for every event in window")
  }

  test("missing or broken config degrades to the default registry " +
      "(reference get_configuration fallback)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_fb")
    // missing file
    val missing = Pipeline.loadConfig(
      dir.resolve("nope.json").toString,
      dir.resolve("landing").toString, "2026-08-14")
    assert(missing.sources.map(_.name) == Seq("marketing", "sales", "crm"))
    assert(missing.sources.forall(_.limit.contains(10)))
    // unparseable file
    val broken = dir.resolve("broken.json")
    java.nio.file.Files.writeString(broken, "{ not json !!!")
    val fb = Pipeline.loadConfig(broken.toString,
      dir.resolve("landing").toString, "2026-08-14")
    assert(fb.sources.map(_.name) == Seq("marketing", "sales", "crm"))
    // the fallback registry actually RUNS against the lake tables
    val summary = Pipeline.run(spark, sfTiny, fb).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(summary("marketing") == (("ok", 10L)))
    assert(summary("sales") == (("ok", 10L)))
    assert(summary("crm") == (("ok", 10L)))
    // a PARSEABLE config that violates the registry contract
    // (duplicate source names — json4s preserves duplicate JSON keys)
    // still fails fast: bad registry, not broken store
    val dup = dir.resolve("dup.json")
    java.nio.file.Files.writeString(dup,
      """{ "data_sources": { "a": {"table": "region"},
        |                    "a": {"table": "nation"} } }""".stripMargin)
    intercept[IllegalArgumentException] {
      Pipeline.loadConfig(dup.toString,
        dir.resolve("landing").toString, "2026-08-14")
    }
  }
}
