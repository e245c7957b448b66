package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** CSV landing source/sink (SURVEY §2A) — the second landing format a
  * multi-source lake speaks besides newline-JSON (reference
  * `load_to_s3` formats records per source; JsonLanding covers the JSON
  * leg). The CSV leg exercises the parts JSON doesn't: header handling,
  * quoting/escaping of payloads that contain the delimiter and quote
  * characters (the `props` JSON strings), and typed read-back through an
  * EXPLICIT schema — inference over a 100 TB lake is a full extra scan.
  */
object CsvLanding {

  /** Read-back schema, declared not inferred. `event_date` arrives as the
    * Hive partition column appended by the reader. */
  val landedSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("source", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Land standardized events as date-partitioned CSV (header + quoted
    * JSON payloads), read the landing back schema-first, re-parse the
    * payload, and aggregate per partition — the write-then-analyze cycle
    * over the second format. */
  def roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_csv_land_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
      s.sparkContext.applicationId
    Tables.events(s, dir)
      .select(
        substring(md5(concat_ws("_", col("event_id"), col("event_type"))),
          1, 12).as("record_id"),
        col("event_type").as("source"),
        col("value"), col("props"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
      // one writer task per date (guide §6 — see JsonLanding): avoids
      // splits×dates landing shrapnel and the serial one-task write at
      // small SFs
      .repartition(col("event_date"))
      .write.mode("overwrite").option("header", "true")
      // lz4: same landing profile as the JSON leg — text landings
      // compress ~3x; locally a wash (page cache), on real remote
      // storage the byte cut is the win
      .option("compression", "lz4")
      .partitionBy("event_date").csv(out)
    s.read.schema(landedSchema.add(StructField("event_date", StringType)))
      .option("header", "true").csv(out)
      .withColumn("k", from_json(col("props"),
        StructType(Seq(StructField("k", IntegerType)))).getField("k"))
      .groupBy(col("event_date"), col("source"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("value").cast(DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        sum(col("k")).as("sum_k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_csv_landing" -> (roundtrip _))

  val oracles: Map[String, String] = Map(
    "etl_csv_landing" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |  event_type AS source, COUNT(*) AS n_records,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |    AS sum_k
        |FROM events GROUP BY strftime(ts, '%Y-%m-%d'), event_type""".stripMargin)
}
