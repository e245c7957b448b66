package graft
import org.apache.spark.sql.functions._
object DqProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/repo/target/testdata/sf3"
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[dq] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val reps: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "event_id" -> col("event_id").cast("string"),
      "ts" -> unix_micros(col("ts")).cast("string"),
      "user_id" -> col("user_id").cast("string"),
      "event_type" -> col("event_type"),
      "value" -> col("value").cast("decimal(18,2)").cast("string"),
      "props" -> col("props"))
    time("warm")(Tables.events(spark, dir).count())
    time("scan")(Tables.events(spark, dir).count())
    time("6 renders no agg") {
      Tables.events(spark, dir)
        .select(reps.map { case (n, c) => c.as(n) }: _*)
        .write.format("noop").mode("overwrite").save(); 0L }
    time("union6(nospread)+gb(name,v)") {
      reps.map { case (n, c) => Tables.events(spark, dir)
          .select(lit(n).as("cn"), c.as("v")) }
        .reduce(_ unionAll _)
        .groupBy("cn", "v").agg(count(lit(1))).count() }
    time("spread1+explode+gb(name,v)") {
      val ev = Tables.spreadScan(spark, s"$dir/events.parquet",
        Tables.events(spark, dir))
      ev.select(explode(array(reps.map { case (n, c) =>
          struct(lit(n).as("c"), c.as("v")) }: _*)).as("x"))
        .groupBy(col("x.c"), col("x.v")).agg(count(lit(1))).count() }
    time("full current op") {
      operators.Etl.dqProfile(spark, dir).count() }
    spark.stop()
  }
}
