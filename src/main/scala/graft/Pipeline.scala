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

  /** One data source: where it reads from and how its records shape. */
  final case class Source(
      name: String,
      table: String,
      limit: Option[Int] = None)

  final case class Config(
      sources: Seq[Source],
      landingDir: String,
      runDate: String,
      errorHandling: String = "continue")

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
      try {
        val raw = Tables.load(spark, sfDir, src.table)
        val limited = src.limit.map(raw.limit).getOrElse(raw)
        val shaped = standardize(limited, src.name, config.runDate)
        val out = s"${config.landingDir}/${src.name}/" +
          s"date=${config.runDate}"
        shaped.write.mode("overwrite").parquet(out)
        val n = spark.read.parquet(out).count()
        SourceResult(src.name, "ok", n, "")
      } catch {
        case e: Throwable if config.errorHandling == "continue" =>
          SourceResult(src.name, "error", 0L,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
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
