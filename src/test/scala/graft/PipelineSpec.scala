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

  test("pipeline runs from a JSON config file (reference registry shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val cfgPath = dir.resolve("config.json")
    java.nio.file.Files.writeString(cfgPath,
      """{ "data_sources": {
        |    "marketing": {"table": "part", "limit": 100, "format": "json"},
        |    "ads":       {"table": "events"},
        |    "broken":    {"table": "no_such_table", "retry_attempts": 2}
        |  },
        |  "processing": {"error_handling": "continue",
        |                 "retry_attempts": 1} }""".stripMargin)
    val config = Pipeline.loadConfig(cfgPath.toString,
      dir.resolve("landing").toString, "2026-08-12")
    assert(config.sources.map(_.name) == Seq("marketing", "ads", "broken"))
    assert(config.sources.head.limit.contains(100))
    assert(config.sources.head.maxRetries == 1,   "processing default")
    assert(config.sources.last.maxRetries == 2,   "per-source override")
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
}
