package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Scale-pattern block (SURVEY §2H): the §4 shuffle-management techniques
  * as runnable, oracle-checked operators — bucketing for co-located
  * fact-fact joins, salting for skewed keys, sketches for unbounded
  * distincts. Each produces the same answer as its naive form (that IS
  * the point); the plan shape is what changes, and PlanSpec asserts it.
  */
object Scale {

  private def dec2(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** Bucketed co-located join: both fact tables written bucketed by the
    * join key, then joined WITHOUT a shuffle — at 100 TB this is the
    * difference between re-exchanging petabytes per query and a local
    * sort-merge per bucket. The bucket count (8 here) scales with the
    * cluster; the write is the one-time landing cost. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
      s.sparkContext.applicationId.replaceAll("[^0-9a-zA-Z]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$tag"
    def landBucketed(df: DataFrame, table: String, key: String): String = {
      val name = s"graft_${table}_$tag"
      df.write.mode("overwrite")
        .option("path", s"$base/$table")
        .bucketBy(8, key).sortBy(key)
        .saveAsTable(name)
      name
    }
    val ord = landBucketed(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus")),
      "orders", "o_orderkey")
    val li = landBucketed(
      Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_extendedprice")),
      "lineitem", "l_orderkey")
    s.table(li).join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast("double")
          .as("sum_price"))
  }

  /** Salted equi-join: the fact side's hot keys are spread over S salt
    * partitions (content-hash salt — deterministic, no RNG), the dim
    * side is replicated S×, and the join runs on (key, salt) — the
    * hand-rolled form of what AQE's skew-join split does at runtime, for
    * paths where AQE can't see the skew. Result is exactly the plain
    * inner join's (spec + oracle verified).
    *
    * @param saltOn fact columns hashed into the salt (any stable subset)
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int,
      saltOn: Seq[String]): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltOn.map(col): _*), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
      col(factKey) === col(dimKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Salted-join operator over the star schema (oracle-checked equal to
    * the plain join). */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
    saltedEquiJoin(fact, dim, "l_orderkey", "o_orderkey", 8,
      Seq("l_orderkey", "l_extendedprice", "l_quantity"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast("double")
          .as("sum_price"))
  }

  /** Sketch distinct for unbounded-cardinality keys: HLL++ instead of the
    * exact distinct that would shuffle every distinct value. Values are
    * approximate → rows-only; the spec bounds the relative error. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02)
        .as("approx_customers"),
        count(lit(1)).as("n_orders"))
  }

  /** Sketch quantiles for unbounded value streams: percentile_approx
    * (KLL-style) instead of q13's exact interpolated percentile, whose
    * full sort-per-group doesn't survive unbounded groups. Values are
    * approximate → rows-only; the spec brackets them between generous
    * exact-percentile bounds. */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
          .as("approx_median_qty"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000))
          .as("approx_p95_price"),
        count(lit(1)).as("n_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_bucketed_join" -> (bucketedJoin _),
    "q18_salted_join" -> (saltedJoin _),
    "q19_approx_distinct" -> (approxDistinct _),
    "q20_approx_percentiles" -> (approxPercentiles _))

  val oracles: Map[String, String] = Map(
    "q17_bucketed_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem, orders WHERE l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "q18_salted_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus""".stripMargin)
}
