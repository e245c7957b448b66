package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven ETL pipeline runner — the reference's orchestration
  * shape (lambda_handler: per-source extract → transform → load, with
  * continue-on-error and an execution summary;
  * /root/reference/lambda/lambda_function.py:34-148 and
  * config/config.json `processing.error_handling: "continue"`).
  *
  * Each source is one Spark job over the landing layout; a failing
  * source records its error and the run proceeds — at 100 TB one bad
  * feed must never kill the nightly batch.
  */
object Pipeline {

  /** One data source: where it reads from, how its records shape, and how
    * many times a failed extract is retried before the error is recorded
    * (reference extract passes timeout/max_retries per source,
    * lambda_function.py:210-215). */
  final case class Source(
      name: String,
      table: String,
      limit: Option[Int] = None,
      maxRetries: Int = 0,
      format: String = "parquet")

  final case class Config(
      sources: Seq[Source],
      landingDir: String,
      runDate: String,
      errorHandling: String = "continue")

  /** Load a Config from a JSON config file mirroring the reference's
    * config/config.json registry shape (reference config/config.json:
    * `data_sources` keyed by source name, `processing.error_handling`,
    * `processing.retry_attempts`) — a user points the runner at a file
    * instead of constructing Config in code:
    *
    * {{{
    * { "data_sources": { "marketing": {"table": "part", "limit": 100},
    *                     "ads":       {"table": "events"} },
    *   "processing":   { "error_handling": "continue",
    *                     "retry_attempts": 2 } }
    * }}}
    *
    * `landingDir`/`runDate` stay caller-supplied: they are per-run
    * environment (the reference takes them from the Lambda event), not
    * source registry.
    */
  def loadConfig(path: String, landingDir: String, runDate: String): Config = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val json = JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val defaultRetries =
      (json \ "processing" \ "retry_attempts").extractOpt[Int].getOrElse(0)
    val sources = json \ "data_sources" match {
      case JObject(fields) => fields.map { case (name, v) =>
        Source(name,
          (v \ "table").extract[String],
          (v \ "limit").extractOpt[Int],
          (v \ "retry_attempts").extractOpt[Int].getOrElse(defaultRetries),
          (v \ "format").extractOpt[String].getOrElse("parquet"))
      }
      case _ => Nil
    }
    Config(sources, landingDir, runDate,
      (json \ "processing" \ "error_handling").extractOpt[String]
        .getOrElse("continue"))
  }

  final case class SourceResult(
      source: String, status: String, nRecords: Long, error: String)

  /** Reference `transform_data`: standardized header (content-hash id,
    * source tag, run date) on every record. */
  private def standardize(df: DataFrame, source: String, runDate: String)
      : DataFrame = {
    // hash the JSON form: unambiguous under nulls and separator-bearing
    // strings, unlike concat_ws (which drops nulls and can collide)
    df.select(
      substring(md5(concat(lit(source),
        to_json(struct(df.columns.map(col): _*)))), 1, 12)
        .as("record_id"),
      lit(source).as("source"),
      lit(runDate).as("extracted_date"),
      struct(df.columns.map(col): _*).as("raw_data"))
  }

  /** Run the pipeline: per-source extract/transform/load, then return the
    * execution summary as a DataFrame (the reference's
    * save_execution_summary, minus the wall-clock fields so reruns are
    * deterministic). */
  def run(spark: SparkSession, sfDir: String, config: Config): DataFrame = {
    import spark.implicits._
    val results = config.sources.map { src =>
      def attempt(remaining: Int): SourceResult =
        try {
          val raw = Tables.load(spark, sfDir, src.table)
          val limited = src.limit.map(raw.limit).getOrElse(raw)
          val shaped = standardize(limited, src.name, config.runDate)
          val out = s"${config.landingDir}/${src.name}/" +
            s"date=${config.runDate}"
          // per-source landing format (reference config.json declares
          // "format" per data_source); JSON needs the nested raw_data
          // struct serialized, which write.json does natively
          shaped.write.mode("overwrite").format(src.format).save(out)
          val n = spark.read.format(src.format)
            .schema(shaped.schema).load(out).count()
          SourceResult(src.name, "ok", n, "")
        } catch {
          case _: Throwable if remaining > 0 => attempt(remaining - 1)
          case e: Throwable if config.errorHandling == "continue" =>
            SourceResult(src.name, "error", 0L,
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      attempt(src.maxRetries)
    }
    val summary = results.toDF()
      .select(col("source"), col("status"), col("nRecords").as("n_records"),
        col("error"))
    // reference save_execution_summary: the run summary itself lands in a
    // date-partitioned metadata area alongside the data
    summary.write.mode("overwrite")
      .parquet(s"${config.landingDir}/metadata/executions/" +
        s"date=${config.runDate}")
    summary
  }
}
