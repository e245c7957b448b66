package graft
import org.apache.spark.sql.functions._
object FkProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/repo/target/testdata/sf3"
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    operators.Scale.ensureBucketsLanded(spark, dir)
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[fk] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val (ordT, liT) = operators.Scale.bucketTableNames(dir)
    time("warm")(spark.table(liT).count())
    time("li bucket scan")(spark.table(liT).count())
    time("li + 2 bcast joins + agg") {
      val part = broadcast(Tables.part(spark, dir)
        .select(col("p_partkey")).distinct())
      val supp = broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey")).distinct())
      spark.table(liT)
        .join(part, col("l_partkey") === col("p_partkey"), "left")
        .join(supp, col("l_suppkey") === col("s_suppkey"), "left")
        .agg(count(lit(1)), count(when(col("p_partkey").isNull, 1)),
          count(when(col("s_suppkey").isNull, 1))).count() }
    time("li SMJ orders + agg") {
      spark.table(liT).select(col("l_orderkey"))
        .join(spark.table(ordT).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)), count(when(col("o_orderkey").isNull, 1)))
        .count() }
    time("li FULL chain (3 edges)") {
      val part = broadcast(Tables.part(spark, dir)
        .select(col("p_partkey")).distinct())
      val supp = broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey")).distinct())
      spark.table(liT)
        .join(part, col("l_partkey") === col("p_partkey"), "left")
        .join(supp, col("l_suppkey") === col("s_suppkey"), "left")
        .join(spark.table(ordT).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)), count(when(col("p_partkey").isNull, 1)),
          count(when(col("s_suppkey").isNull, 1)),
          count(when(col("o_orderkey").isNull, 1))).count() }
    time("other 4 child tables") {
      Seq(("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"))
        .map { case (c, ck, p, pk) =>
          Tables(spark, dir, c).join(broadcast(Tables(spark, dir, p)
            .select(col(pk)).distinct()), col(ck) === col(pk), "left")
            .agg(count(lit(1)), count(when(col(pk).isNull, 1)))
            .count() }.sum }
    time("full fkAudit")(operators.Etl.fkAudit(spark, dir).count())
    spark.stop()
  }
}
