package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime()-t0)/1e9
      println(f"[scratch] $tag%-30s $dt%.3f s"); dt
    }
    operators.DocArtifacts.ensureLanded(spark, dir)
    graft.SparkEntry.queries("q1_pricing_summary")(spark, dir).count()
    // entropy with and without final orderBy
    def entropyBase = {
      import graft.functions.TextFns._
      import org.apache.spark.sql.types.DecimalType
      val tf = Tables.documents(spark, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val term = round(col("tf").cast("double") * log(col("tf").cast("double")), 9).cast(DecimalType(18, 9))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_toks"), count(lit(1)).as("n_distinct"), sum(term).cast("double").as("s_tlnt"))
        .select(col("doc_id"), col("n_toks"), col("n_distinct"),
          round(log(col("n_toks").cast("double")) - col("s_tlnt") / col("n_toks").cast("double"), 6).as("entropy_nats"))
    }
    for (i <- 1 to 3) {
      time(s"entropy orderBy #$i")(entropyBase.orderBy(col("doc_id")).write.format("noop").mode("overwrite").save())
      time(s"entropy no-sort #$i")(entropyBase.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
