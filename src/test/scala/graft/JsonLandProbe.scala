package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch pass-level profiler for the etl_json_landing round-trip.
  * Run: sbt "Test/runMain graft.JsonLandProbe <sfDir>". */
object JsonLandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse("/root/repo/target/testdata/sf3")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[jlprobe] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val out = s"/tmp/graft_jlprobe"
    val std = Tables.events(spark, dir)
      .select(
        substring(md5(concat_ws("_", col("event_id"), col("event_type"))),
          1, 12).as("record_id"),
        col("event_type").as("source"),
        col("ts"), col("value"), col("props"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
    time("project only (noop)") {
      std.write.format("noop").mode("overwrite").save(); 0L
    }
    time("project only (noop) 2") {
      std.write.format("noop").mode("overwrite").save(); 0L
    }
    time("scan only (noop)") {
      Tables.events(spark, dir).write.format("noop").mode("overwrite")
        .save(); 0L
    }
    time("scan+md5 only (noop)") {
      Tables.events(spark, dir)
        .select(substring(md5(concat_ws("_", col("event_id"),
          col("event_type"))), 1, 12).as("record_id"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("scan+datefmt only (noop)") {
      Tables.events(spark, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("write as-is (13 tasks x 30)") {
      std.write.mode("overwrite").partitionBy("event_date").json(out); 0L
    }
    time("write as-is 2") {
      std.write.mode("overwrite").partitionBy("event_date").json(out); 0L
    }
    time("write repart(event_date)") {
      std.repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").json(out); 0L
    }
    time("write lz4") {
      std.write.mode("overwrite").option("compression", "lz4")
        .partitionBy("event_date").json(out); 0L
    }
    time("write lz4 2") {
      std.write.mode("overwrite").option("compression", "lz4")
        .partitionBy("event_date").json(out); 0L
    }
    time("sort-within cost (noop)") {
      std.sortWithinPartitions(col("event_date"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    val landedSchema = StructType(Seq(
      StructField("record_id", StringType),
      StructField("source", StringType),
      StructField("ts", TimestampType),
      StructField("value", DoubleType),
      StructField("props", StringType),
      StructField("event_date", StringType)))
    time("read back + agg") {
      spark.read.schema(landedSchema).json(out)
        .withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k"))
        .groupBy(col("event_date"), col("source"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast("double").as("sum_value"),
          sum(col("k")).as("sum_k"))
        .count()
    }
    time("read back + agg (again)") {
      spark.read.schema(landedSchema).json(out)
        .withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k"))
        .groupBy(col("event_date"), col("source"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast("double").as("sum_value"),
          sum(col("k")).as("sum_k"))
        .count()
    }
    time("full roundtrip op") {
      sources.JsonLanding.roundtrip(spark, dir).count()
    }
    spark.stop()
  }
}
