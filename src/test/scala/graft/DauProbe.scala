package graft

import org.apache.spark.sql.functions._

/** Scratch pass-level profiler for ev_dau_wau.
  * Run: sbt "Test/runMain graft.DauProbe <sfDir>". */
object DauProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse("/root/repo/target/testdata/sf3")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[dauprobe] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    time("scan+select")(ev.count())
    val perUser = ev.groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("days"))
    time("collect_set")(perUser.count())
    time("collect_set 2")(perUser.count())
    time("distinct pairs")(ev.distinct().count())
    val full = perUser
      .select(explode(concat(
        transform(col("days"), d => struct(d.as("day"), lit(0).as("k"))),
        transform(array_distinct(flatten(transform(col("days"),
            d => sequence(d, date_add(d, 6))))),
          a => struct(a.as("day"), lit(1).as("k"))))).as("x"))
      .groupBy(col("x.day").as("day"))
      .agg(count(when(col("x.k") === 0, 1)).as("dau"),
        count(when(col("x.k") === 1, 1)).as("wau"))
      .filter(col("dau") > 0)
    time("full current")(full.count())
    time("full current 2")(full.count())
    // interval variant: sorted day array -> exact coverage intervals
    val perUserSorted = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("day"))).as("days"))
    val iv = perUserSorted
      .select(explode(concat(
        transform(col("days"), d => struct(d.as("day"), lit(0).as("k"))),
        flatten(transform(col("days"), (d, i) =>
          transform(sequence(d, least(date_add(d, 6),
              coalesce(date_sub(try_element_at(col("days"), i + 2), 1),
                date_add(d, 6)))),
            a => struct(a.as("day"), lit(1).as("k")))))))
        .as("x"))
      .groupBy(col("x.day").as("day"))
      .agg(count(when(col("x.k") === 0, 1)).as("dau"),
        count(when(col("x.k") === 1, 1)).as("wau"))
      .filter(col("dau") > 0)
    time("interval variant")(iv.count())
    time("interval variant 2")(iv.count())
    // cross-check
    val a = full.orderBy("day").collect().toSeq
    val b = iv.orderBy("day").collect().toSeq
    println(s"[dauprobe] equal=${a == b} (${a.length} vs ${b.length} rows)")
    spark.stop()
  }
}
