package graft

import org.apache.spark.sql.functions._

/** Per-pass decomposition of q13_percentiles (r19): times pass 1
  * (min/max boundaries), pass 2 (contingency histogram collect) and
  * pass 3 (refinement query) separately, min-of-3 each, at the env SF.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.Q13Probe". */
object Q13Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def t(tag: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      println(f"[q13probe] $tag%-22s min=${ts.min}%.3f runs=" +
        ts.map(x => f"$x%.3f").mkString(","))
    }
    val base = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      col("l_quantity"), col("l_extendedprice"))
    t("pass1 minmax agg") {
      base.agg(min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice")))
        .collect()
    }
    println("[q13probe] pass1 plan:\n" + base.agg(min(col("l_quantity")))
      .queryExecution.executedPlan.toString.take(800))
    t("footer minmax (driver)") {
      graft.Tables.columnMinMax(spark, dir, "lineitem", "l_quantity")
      graft.Tables.columnMinMax(spark, dir, "lineitem", "l_extendedprice")
    }
    // pass 2 shape: bucket both measures, contingency agg, collect
    val nB = operators.Ranking.bucketsFor(
      Tables.rowCount(spark, dir, "lineitem"), 64)
    println(s"[q13probe] nBuckets=$nB")
    val bounds = Map(
      "l_quantity" -> (1 until nB).map(k => 1.0 + 49.0 * k / nB),
      "l_extendedprice" -> (1 until nB).map(k => 900.0 + 104099.0 * k / nB))
    def bkt(m: String) = coalesce(graft.functions.VectorExprs
      .sortedUpperBound(col(m), typedLit(bounds(m))), lit(0))
    t("pass2 contingency") {
      base.select(col("l_returnflag"), bkt("l_quantity").as("b1"),
          bkt("l_extendedprice").as("b2"))
        .groupBy(col("l_returnflag"), col("b1"), col("b2"))
        .agg(count(lit(1))).limit(1000001).collect()
    }
    t("full op") {
      operators.Relational.queries("q13_percentiles")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
