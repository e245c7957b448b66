package graft

import org.apache.spark.sql.functions._

/** Scratch pass-level profiler for the q13 wide-percentile pipeline.
  * Run: sbt "Test/runMain graft.QProbe <sfDir>". */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse("/root/repo/target/testdata/sf3")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[qprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"))
    time("warm scan")(base.count())
    time("scan count")(base.count())
    time("sample+approx") {
      val qs = (1 until 64).map(i => lit(i / 64.0))
      base.sample(0.05, 7L)
        .agg(percentile_approx(col("q"), array(qs: _*), lit(1000)),
          percentile_approx(col("p"), array(qs: _*), lit(1000)))
        .collect().length.toLong
    }
    val bq = (1 until 64).map(_.toDouble).toArray.toSeq
    val bp = (1 until 64).map(_ * 1500.0).toArray.toSeq
    def bkt(c: String, bs: Seq[Double]) =
      when(col(c).isNull, lit(-1)).otherwise(coalesce(
        graft.functions.VectorExprs.sortedUpperBound(col(c),
          typedLit(bs)), lit(0)))
    time("contingency") {
      base.select(col("l_returnflag"), bkt("q", bq).as("bq"),
          bkt("p", bp).as("bp"))
        .groupBy("l_returnflag", "bq", "bp")
        .agg(count(lit(1))).count()
    }
    time("refine explode (6/64)") {
      val tq = Seq(10, 31, 32, 60, 61)
      val tp = Seq(30, 31)
      val entries = Seq(
        when(bkt("q", bq).isin(tq: _*) && col("q").isNotNull,
          struct(lit("q").as("m"), col("q").as("__v"),
            bkt("q", bq).as("__bkt"))),
        when(bkt("p", bp).isin(tp: _*) && col("p").isNotNull,
          struct(lit("p").as("m"), col("p").as("__v"),
            bkt("p", bp).as("__bkt"))))
      base.select(col("l_returnflag"), explode(filter(array(entries: _*),
          e => e.isNotNull)).as("__e"))
        .groupBy(col("l_returnflag"), col("__e.m"), col("__e.__bkt"),
          col("__e.__v"))
        .agg(count(lit(1))).count()
    }
    time("full q13") {
      operators.Relational.q13Percentiles(spark, dir).count()
    }
    spark.stop()
  }
}
