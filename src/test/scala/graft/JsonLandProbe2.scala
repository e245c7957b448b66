package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway r18 probe: decompose the JSON landing round-trip. */
object JsonLandProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/testdata/sf3")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warmup")(Tables.events(s, dir).count())
    val out = "/tmp/graft_probe_jsonland"
    val std = Tables.events(s, dir)
      .select(
        substring(md5(concat_ws("_", col("event_id"), col("event_type"))),
          1, 12).as("record_id"),
        col("event_type").as("source"),
        col("ts"), col("value"), col("props"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
    t("std projection noop")(noop(std))
    t("write json lz4 by date")(std.repartition(col("event_date"))
      .write.mode("overwrite").option("compression", "lz4")
      .partitionBy("event_date").json(out))
    val schema = sources.JsonLanding.landedSchema
      .add(StructField("event_date", StringType))
    t("read+agg")(noop(
      s.read.schema(schema).json(out)
        .withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k"))
        .groupBy(col("event_date"), col("source"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast("double").as("sum_value"),
          sum(col("k")).as("sum_k"))))
    t("read+agg 2nd")(noop(
      s.read.schema(schema).json(out)
        .withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k"))
        .groupBy(col("event_date"), col("source"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast("double").as("sum_value"),
          sum(col("k")).as("sum_k"))))
    // write without repartition (old form) for comparison
    t("write json lz4 scan-part")(std
      .write.mode("overwrite").option("compression", "lz4")
      .partitionBy("event_date").json(out + "_b"))
    t("read+agg scan-part")(noop(
      s.read.schema(schema).json(out + "_b")
        .withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k"))
        .groupBy(col("event_date"), col("source"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast("double").as("sum_value"),
          sum(col("k")).as("sum_k"))))
    s.stop()
  }
}
