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

  /** Catalog names + paths for the bucketed fact landings — derived
    * from `dir` alone (the `Tables.landingDir` contract) so the names
    * are stable across calls and sessions on one host.
    *
    * CONTRACT — one writer process per corpus dir: like every shared
    * landing under `Tables.landingDir`, the name and path are
    * deliberately NOT application-scoped (that is what lets a later
    * session reuse an earlier session's landing instead of re-writing
    * it), and the `landOnce` memo that serializes the write is
    * JVM-local. Two JVMs racing `saveAsTable(overwrite)` on the same
    * dir would corrupt the landing — the deployment contract (driver
    * runs bench/verify sequentially; a cluster uses a real catalog
    * with locking) is single-process-per-dir, same as the parquet
    * landings themselves. */
  private[graft] def bucketTableNames(dir: String): (String, String) = {
    val tag = dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
      f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
    (s"graft_orders_$tag", s"graft_lineitem_$tag")
  }

  /** Land-once memo for the bucketed fact tables (keyed on session +
    * dir + both source fingerprints — the kmeans landing discipline).
    * Before r14 every bucketedJoin call re-wrote BOTH bucketed tables
    * inside the query — at sf3 the two writes were 9.0s around a join
    * that itself runs exchange-free in under a second. Bucketing a fact
    * table is a ONE-TIME landing cost amortized over every co-located
    * join that follows (that is the entire point of bucketing at
    * 100 TB); the query now pays it once per corpus and the bench times
    * it as its own `landing_buckets` line. Bucket count 32 = the local
    * core count, so the exchange-free join keeps every core busy (8
    * buckets capped the join at 8-way parallelism — 3.5s at sf3 for an
    * 18M-row SMJ); on a cluster size it to executor-cores as usual. */
  private val bucketsLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String, String), scala.concurrent.Future[Unit]]
  private[graft] def ensureBucketsLanded(s: SparkSession,
      dir: String): Unit = {
    val (ordName, liName) = bucketTableNames(dir)
    graft.Tables.landOnce(bucketsLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "orders"),
        graft.Tables.fingerprint(s, dir, "lineitem"))) {
      val base = graft.Tables.landingDir("buckets", dir)
      def landBucketed(df: DataFrame, table: String, name: String,
          key: String): Unit =
        // repartition onto the BUCKET hash before the write: without
        // it every input task writes a file per bucket it touches
        // (measured 2657 files for the sf3 lineitem landing — each
        // consumer then paid ~2s of file-open overhead per scan);
        // hash-partitioned to numPartitions == numBuckets, each task
        // holds exactly one bucket and the landing is 32 files. The
        // one extra exchange is landing-time cost, amortized over
        // every bucketed consumer (q4/q17/fk_audit/...).
        df.repartition(32, col(key)).write.mode("overwrite")
          .option("path", s"$base/$table")
          .bucketBy(32, key).sortBy(key)
          .saveAsTable(name)
      // o_orderpriority / o_orderdate / l_shipdate ride along for the
      // orderkey-join consumers (q4's semi-join condition); columnar
      // pruning keeps narrower consumers at their own columns
      // o_custkey rides along for q3's customer probe (r18) — columnar
      // pruning keeps narrower consumers at their own columns
      landBucketed(
        Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          col("o_orderdate"), col("o_custkey")),
        "orders", ordName, "o_orderkey")
      // l_partkey / l_suppkey ride along for etl_fk_audit: the audit's
      // lineitem dim edges fold into this landing's scan (one lineitem
      // pass for all three edges), and parquet column pruning keeps
      // q17's join scan at its two columns regardless
      // l_discount rides along for q3's revenue term (r18)
      landBucketed(
        Tables.lineitem(s, dir).select(col("l_orderkey"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"),
          col("l_suppkey"), col("l_shipdate")),
        "lineitem", liName, "l_orderkey")
    }
  }

  /** Test hook (the DocArtifacts.clearMemo discipline). */
  private[graft] def clearBucketsMemo(): Unit = bucketsLanded.clear()

  /** Bucketed co-located join: both fact tables written bucketed by the
    * join key (once — [[ensureBucketsLanded]]), then joined WITHOUT a
    * shuffle — at 100 TB this is the difference between re-exchanging
    * petabytes per query and a local sort-merge per bucket. The bucket
    * count (32 here, the local core count) scales with the cluster;
    * the write is the one-time landing cost. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    ensureBucketsLanded(s, dir)
    val (ord, li) = bucketTableNames(dir)
    // MERGE hint: the landings are bucketed AND sorted with one file
    // per bucket, so the SMJ runs exchange-free and sort-free; without
    // it AQE's size estimate converts to a BHJ that driver-collects
    // the orders side (the etl_fk_audit lesson — 3.2s vs 0.4s at sf3)
    s.table(li).join(s.table(ord).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
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

  /** θ-exponent for the deterministic hash sketches: sample the lowest
    * 2⁻ᵗ fraction of the 52-bit md5 space, with t sized from the
    * table's own row count so ~2¹³ rows survive at any scale (the
    * planesFor discipline: the sketch tightens as the table grows; a
    * small table is sampled at θ = 1, i.e. exactly). Bit-length-based —
    * length(bin(n)) − 1 — so BOTH engines derive the identical t with
    * no logarithm. n comes from `Tables.rowCount` (parquet footer
    * metadata, the catalog statistic both engines can also re-derive
    * with COUNT(*)), so t is a plan-time literal: no per-query count
    * job, no broadcast of a one-row table. */
  private def thetaExp(nRows: Long): Int =
    if (nRows <= 0) 0
    else math.max(0, 63 - java.lang.Long.numberOfLeadingZeros(nRows) - 13)

  /** Sketch distinct for unbounded-cardinality keys — a fixed-threshold
    * THETA sketch (the DataSketches theta idea with θ = 2⁻ᵗ pinned by
    * table size): a value is sampled iff the top 52 bits of
    * md5(value) fall below θ·2⁵², and the distinct count ≈ 2ᵗ × the
    * exact distinct count of the sampled values. Deterministic
    * (content-hash thresholding — no RNG, no merge-order dependence)
    * and INTEGER-exact (the estimate is a left shift), so unlike the
    * opaque HLL++ register blob this replaces, both engines re-derive
    * the estimate bit for bit → full hash oracle (formerly rows-only).
    * Scale: only ~θ of the DISTINCT values cross the exchange — the
    * sketch property the exact distinct lacks. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val t = thetaExp(Tables.rowCount(s, dir, "orders"))
    val u52 = graft.functions.HashExprs.md5SliceLong(
      col("o_custkey").cast("string"), 1, 13)
    ord
      .withColumn("__keep", u52 < lit(4503599627370496L >> t))
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(when(col("__keep"), col("o_custkey"))).as("__d"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"),
        expr(s"shiftleft(__d, $t)").as("approx_customers"),
        col("n_orders"))
  }

  /** Sketch quantiles for unbounded value streams — deterministic
    * hash-threshold sampling (θ = 2⁻ᵗ of the row-key md5 space, t from
    * table size as in `approxDistinct`) followed by the EXACT
    * interpolated percentile of the sample: quantile error is
    * O(1/√(nθ)) while the per-group percentile state holds only the
    * sampled slice (θ scales down with the table, so the slice is
    * roughly constant-size at any scale; the EXACT path is q13's
    * counting-sort plan, Ranking.groupedPercentiles — this op is the
    * one-scan sketch answer). The sample membership and the
    * interpolation arithmetic
    * are both engine-portable (q13 proves percentile ↔ quantile_cont
    * bit-parity), so the formerly rows-only KLL sketch becomes a full
    * hash check. The row key hashes the integer join keys only —
    * doubles never stringify, so both engines see identical keys. */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val t = thetaExp(Tables.rowCount(s, dir, "lineitem"))
    val key = concat_ws(":", col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"))
    val u52 = graft.functions.HashExprs.md5SliceLong(key, 1, 13)
    li
      .withColumn("__keep", u52 < lit(4503599627370496L >> t))
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(when(col("__keep"), col("l_quantity")),
          lit(0.5)), 6).as("approx_median_qty"),
        round(percentile(when(col("__keep"), col("l_extendedprice")),
          lit(0.95)), 6).as("approx_p95_price"),
        count(when(col("__keep"), 1)).as("n_sampled"),
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
        |GROUP BY o_orderstatus""".stripMargin,
    // the theta sketch re-derived exactly: identical md5 threshold,
    // identical bit-length t, integer-shift estimate
    "q19_approx_distinct" ->
      """WITH n AS (
        |  SELECT GREATEST(0, length(bin(COUNT(*))) - 1 - 13) AS t
        |  FROM orders)
        |SELECT o_orderstatus,
        |  (COUNT(DISTINCT CASE WHEN
        |      CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13)
        |        AS BIGINT) < (4503599627370496 >> t)
        |      THEN o_custkey END) << MAX(t)) AS approx_customers,
        |  COUNT(*) AS n_orders
        |FROM orders, n GROUP BY o_orderstatus""".stripMargin,
    // identical hash-threshold sample, exact interpolated percentile
    // (quantile_cont ↔ percentile bit-parity per q13)
    "q20_approx_percentiles" ->
      """WITH n AS (
        |  SELECT GREATEST(0, length(bin(COUNT(*))) - 1 - 13) AS t
        |  FROM lineitem),
        |k AS (
        |  SELECT l_returnflag, l_quantity, l_extendedprice,
        |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |        CAST(l_partkey AS VARCHAR) || ':' ||
        |        CAST(l_suppkey AS VARCHAR)), 1, 13) AS BIGINT)
        |      < (4503599627370496 >> t) AS keep
        |  FROM lineitem, n)
        |SELECT l_returnflag,
        |  ROUND(quantile_cont(CASE WHEN keep THEN l_quantity END, 0.5), 6)
        |    AS approx_median_qty,
        |  ROUND(quantile_cont(CASE WHEN keep THEN l_extendedprice END,
        |    0.95), 6) AS approx_p95_price,
        |  COUNT(CASE WHEN keep THEN 1 END) AS n_sampled,
        |  COUNT(*) AS n_rows
        |FROM k GROUP BY l_returnflag""".stripMargin)
}
