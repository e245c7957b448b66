package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.Tables

/** Relational analytics block (SURVEY §2B) — the SQL-analytics surface the
  * reference delegates to DuckDB (reference README.md:8,15 "Analyze data
  * with DuckDB", local_analytics module), re-expressed as Catalyst plans
  * over the landed star schema.
  *
  * Oracle-compat conventions (SURVEY §5): money/quantity aggregates are
  * accumulated as fixed-scale decimals so sums are bit-exact regardless of
  * partition/accumulation order at any scale; every top-k has an explicit
  * tie-break key.
  */
object Relational {

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** All money inputs are exact 2-decimal values, so every money expression
    * is computed decimal-first: one deterministic double→DECIMAL(…,2) cast
    * at the scan, then exact decimal arithmetic — sums are bit-identical in
    * any engine at any accumulation order (SURVEY §5). */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Long-pack radix for the q2/q24 single-pass argmin/argmax. */
  private val packBase = 10000000000L

  /** Pack (cents, slot) into one long for a codegen'd hash-aggregate
    * argmin/argmax — GUARDED: inputs outside the pack envelope raise a
    * named error instead of silently corrupting the winner. The
    * envelope is cents in [0, Long.MaxValue/1e10] = [0, 9.2e8 cents]
    * (~$9.2M — TPC-H extendedprice caps ~$110k at any SF) and slot in
    * [0, 1e10). The guard is one codegen'd branch per row, free next
    * to the aggregate's own hashing; non-TPC-H data that exceeds the
    * envelope gets this error, not a wrong answer. */
  private def packedOrFail(op: String, cents: Column,
      slot: Column): Column = {
    val maxCents = Long.MaxValue / packBase
    when(cents < 0 || cents > maxCents ||
        slot < 0 || slot >= packBase,
      raise_error(concat(
        lit(s"graft $op: packed-argmin overflow — cents="),
        cents.cast("string"), lit(", slot="), slot.cast("string"),
        lit(s"; the long pack requires 0 <= cents <= $maxCents" +
          s" (~$$9.2M) and 0 <= slot < $packBase"))))
      .otherwise(cents * packBase + slot)
  }

  /** Final-output convention: money math stays exact-decimal internally
    * (accumulation-order-independent sums), then ONE deterministic
    * decimal→double cast on the output column. Engines render decimals
    * differently downstream (exact trailing-zero strings vs float64), so a
    * decimal must never appear in a query's final schema; the single cast
    * of an exact decimal is identical in both engines — UP TO 16
    * significant digits. Beyond that the conversion itself can diverge:
    * DuckDB converts the scaled int128 to double and then divides by
    * 10^scale (two roundings), while Spark/BigDecimal round once — at
    * sf1, q1's scale-6 sum_charge (17 digits) differed in the last ulp.
    * Corpus-scale money sums must therefore round the exact decimal
    * back to 2dp BEFORE the cast (`outd2`), which keeps the scaled
    * integer under 2^53 for any plausible total and makes the
    * conversion exact in both engines. */
  private def outd(c: Column): Column = c.cast("double")

  /** outd for UNBOUNDED money sums (see above): exact-decimal half-up
    * round to 2dp (ROUND(x, 2) in the oracle — same rule on the same
    * exact decimal), then the cast — conversion-exact at any total
    * below ~2^53/100 ≈ 90 trillion. */
  private def outd2(c: Column): Column = round(c, 2).cast("double")

  /** ep·(1−disc) as an exact scale-4 decimal. */
  private def discPrice(ep: Column, disc: Column): Column =
    dec2(ep) * (lit(1) - disc.cast(DecimalType(4, 2)))

  /** TPC-H Q1 shape: grouped multi-aggregate full scan of the fat fact. At
    * 100 TB this is one shuffle of ~6 grouped rows per map partition
    * (partial agg does all the work); the scan prunes to 7 columns. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val grouped = li.filter(col("l_shipdate") <= ts("2000-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
    // Two-regime sums on the catalog row count (the q14 discipline:
    // footer metadata, no job). Within 5e7 fact rows every measure
    // rides EXACT LONG fixed-point units — qty/base in 1e-2, the
    // scale-4 disc_price in 1e-4, the scale-6 charge in 1e-6; each
    // per-row unit value is the integral unscaled value of the exact
    // decimal (≤ 1.2e11 for charge at TPC-H's ~$110k price cap), so
    // 5e7 rows keep every sum under 2^63 (6e18, a 1.5× margin even
    // with every row at the price cap; real sums sit ~30× lower) — at
    // long-
    // add codegen cost instead of four boxed decimal(28,2)/(33,4)/
    // (36,6) accumulators (the decimal Sum buffer is non-compact past
    // 18 digits). The unit sums convert back through an EXACT decimal
    // division (scale-6 quotient ≥ the true scale, so no rounding)
    // and the same round/cast tail as the decimal form — bit-identical
    // output. Past 5e7 rows the decimal plan takes over unchanged.
    def backTo2(unitSum: Column, unit: Int): Column =
      (unitSum.cast(DecimalType(38, 0)) / lit(unit)).cast("double")
    def backTo2Rounded(unitSum: Column, unit: Int): Column =
      round(unitSum.cast(DecimalType(38, 0)) / lit(unit), 2).cast("double")
    if (Tables.rowCount(s, dir, "lineitem") <= 50L * 1000 * 1000) {
      // cents extraction WITHOUT the per-row BigDecimal cast — the
      // shared Money helper: fast floor(v·100+0.5) path iff the
      // positive-≤1e9 contract PROVABLY holds per footer statistics
      // (no job), else the exact decimal extraction per row (still the
      // long-unit plan). Contract + proof live in functions.Money.
      val fastOk = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax").forall(
        graft.functions.Money.fastPathHolds(s, dir, "lineitem", _))
      def cents(c: Column): Column = graft.functions.Money.cents(c, fastOk)
      val qty2 = cents(col("l_quantity"))
      val bp2 = cents(col("l_extendedprice"))
      // exact decimal products in integer units: dec2(ep)·(1−dec2(d))
      // has unscaled value ep_cents·(100−d_cents) at scale 4, and the
      // charge's extra ·(1+tax) factor appends ·(100+tax_cents) at
      // scale 6 — integer arithmetic, bit-identical to the decimal form
      val dp4 = bp2 * (lit(100L) - cents(col("l_discount")))
      val ch6 = dp4 * (lit(100L) + cents(col("l_tax")))
      grouped.agg(
        backTo2(sum(qty2), 100).as("sum_qty"),
        backTo2(sum(bp2), 100).as("sum_base_price"),
        backTo2Rounded(sum(dp4), 10000).as("sum_disc_price"),
        backTo2Rounded(sum(ch6), 1000000).as("sum_charge"),
        count(lit(1)).as("count_order"))
    } else grouped.agg(
        outd(sum(dec2(col("l_quantity")))).as("sum_qty"),
        outd(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        outd2(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
          .as("sum_disc_price"),
        outd2(sum(discPrice(col("l_extendedprice"), col("l_discount"))
          * (lit(1) + col("l_tax").cast(DecimalType(4, 2))))).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    * Both fact sides ride the shared orderkey bucket landing (the
    * q4/q17/etl_fk_audit landing, r18): the orders⋈lineitem join is a
    * ZERO-exchange co-located SMJ, and because l_orderkey is in the
    * group keys the aggregate inherits the bucket partitioning too —
    * no data-sized exchange anywhere; the only movement is the
    * broadcast customer probe and the 10-row TakeOrdered. At 100 TB
    * the one-time bucketed landing replaces re-shuffling both fact
    * tables per query (guide §2.1). */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    Scale.ensureBucketsLanded(s, dir)
    val (ordT, liT) = Scale.bucketTableNames(dir)
    val cutoff = ts("1998-01-01")
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = s.table(ordT).filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = s.table(liT).filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(outd(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way star join, region-filtered. The region
    * restriction is pushed to BOTH dim sides before any fact work
    * (guide §3 join-graph pruning): the final chain forces
    * s_nationkey ∈ ASIA and c_nationkey = s_nationkey, so customers
    * and suppliers outside the region can never survive — pre-joining
    * nation⋈region (5 rows) into each dim drops ~4/5 of both
    * broadcasts AND of every intermediate row they admit, row-set
    * provably unchanged. Join order (ord⋈cust)⋈li: the region cut
    * lands before the only data-sized shuffle, so the orders⋈lineitem
    * join carries 1/5 of the build rows the tail-filter form paid;
    * n_name rides the supplier broadcast so the old nation/region
    * tail joins disappear (7 joins → 4). */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val asianNat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(asianNat.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(asianNat),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01"))
    val li = Tables.lineitem(s, dir)
    li.join(ord.join(broadcast(cust),
          col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(outd(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 shape: selective-predicate single-table aggregate — the
    * pure-pushdown benchmark (all three predicates reach the parquet scan). */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(outd(sum(dec2(col("l_extendedprice")) * col("l_discount").cast(DecimalType(4, 2))))
        .as("revenue"))
  }

  /** Join + agg + deterministic top-k: biggest customers by order volume. */
  def q7TopkCustomers(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    ord.groupBy(col("o_custkey"))
      .agg(outd(sum(dec2(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Window functions: top-3 customers per nation by account balance.
    * Single shuffle on the partition key; rank + running sum share it. */
  def q8WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("running_bal",
        outd(sum(dec2(col("c_acctbal")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("rn"), col("running_bal"))
  }

  /** Hierarchical ROLLUP region→nation over customer accounts. */
  def q9Rollup(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        outd(sum(dec2(col("c_acctbal")))).as("sum_bal"))
  }

  /** TPC-H Q2 shape: correlated min-per-group — for every part, the
    * supplier offering its lowest observed price, deterministic tie-break
    * on suppkey. The min is pre-aggregated per (part, supplier) with
    * map-side combine, then a second map-side-combinable `min(struct)`
    * argmax per part picks the winner — struct ordering is
    * lexicographic (cost, then suppkey), exactly the tie-break, with no
    * per-partition sort: the q24 discipline. (The previous window-rank
    * form paid a full shuffle+sort over the (part, supplier) table;
    * never a correlated re-aggregation per outer row either way.) */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    // Single-pass PACKED argmin (r15): min over raw rows of
    // price_cents·1e10 + suppkey picks (min extendedprice, lowest
    // suppkey at it) per part — the same winner as the old two-level
    // plan (per-supplier MIN cost, then struct-min with the suppkey
    // tie-break), because the winning cost is the global row minimum
    // either way and the pack orders ties by suppkey. One codegen'd
    // hash aggregate over lineitem replaces two exchanges plus a
    // SortAggregate struct-min (struct buffers are not hash-aggregable,
    // so the old outer agg paid a per-row interpreted comparison).
    // Bounds GUARDED by packedOrFail: extendedprice <= 9.2e8 cents
    // (~$9.2M; TPC-H caps it ~$110k) and suppkey < 1e10 keep the pack
    // inside a long — out-of-envelope data raises the named error.
    // min_cost = cents/100.0 is the correctly rounded double of the
    // exact value — bit-identical to the oracle's decimal→double cast.
    val base = packBase
    // cents via the shared Money extraction (r19): the footer-gated
    // fast path drops the per-row double→BigDecimal→long round-trip
    // the decimal cast paid on every lineitem row; packedOrFail's own
    // envelope guard still rejects out-of-range cents either way
    val centsOk =
      graft.functions.Money.fastPathHolds(s, dir, "lineitem",
        "l_extendedprice")
    val best = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(min(packedOrFail("q2_min_cost_supplier",
        graft.functions.Money.cents(col("l_extendedprice"), centsOk),
        col("l_suppkey"))).as("packed"))
      .select(col("l_partkey"),
        expr(s"packed div ${base}L").as("cost_cents"),
        pmod(col("packed"), lit(base)).as("l_suppkey"))
    // part/supplier grow ~linearly with SF (SURVEY §4): no forced
    // broadcast — AQE picks BHJ from size stats while they fit and a
    // shuffle join once they don't
    best
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        (col("cost_cents").cast("double") / 100.0).as("min_cost"))
      .orderBy(col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q4 shape: EXISTS with a cross-table predicate — orders with at
    * least one line shipped more than 90 days after the order date,
    * counted per priority. A left-semi join carries the mixed-side
    * condition and no DISTINCT; both sides ride the shared orderkey
    * bucket landing (the q17/etl_fk_audit landing), so the semi-join is
    * a ZERO-exchange co-located SMJ — at 100 TB the one-time bucketed
    * landing replaces re-shuffling both fact tables per query. */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    Scale.ensureBucketsLanded(s, dir)
    val (ordT, liT) = Scale.bucketTableNames(dir)
    s.table(ordT)
      .join(s.table(liT).select(col("l_orderkey"), col("l_shipdate"))
          .hint("merge"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Multi-column distinct counting per order status. Exact distinct on
    * bounded-cardinality keys only (SURVEY §4); the unbounded analogue is
    * approx_count_distinct, exercised in specs. */
  def q10DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
  }

  /** Left-semi (EXISTS): customers having at least one big order. */
  def q11SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** Left-anti (NOT EXISTS): customers with no big order — the complement
    * of q11's semi-join, so both legs of the EXISTS pair are exercised. */
  def q12AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
  }

  /** Exact interpolated quantiles per return flag (median, p95), rounded to
    * 6 dp for cross-engine double parity. */
  def q13Percentiles(s: SparkSession, dir: String): DataFrame = {
    // distributed exact percentiles (Ranking.groupedPercentilesWide):
    // the `percentile` AGGREGATE holds a per-group value→count map in
    // one reduce task — parallelism caps at |groups| and the buffer is
    // unbounded at corpus scale. Both measures ride ONE counting-sort
    // pipeline as COLUMNS of the un-melted scan (the r15 melted form
    // exploded lineitem 2× into every one of the three passes —
    // measured ~8.6s at sf3 on exactly that).
    Ranking.groupedPercentilesWide(
      Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice")),
      Seq("l_returnflag"), Seq(
        "l_quantity" -> Seq("median_qty" -> 0.5, "p95_qty" -> 0.95),
        "l_extendedprice" -> Seq("median_price" -> 0.5)),
      nBuckets = Ranking.bucketsFor(
        Tables.rowCount(s, dir, "lineitem"), 64),
      // r19: boundary min/max from footer statistics (driver-side, no
      // job — the rowCount posture) retires the pass-1 scan; exactness
      // never depends on boundaries, and the footer values ARE the
      // scan aggregate's values where stats are trusted
      minMaxOf = m => Tables.columnMinMax(s, dir, "lineitem", m))
      .groupBy(col("l_returnflag"))
      .agg(
        round(min(when(col("name") === "median_qty", col("pv"))), 6)
          .as("median_qty"),
        round(min(when(col("name") === "p95_qty", col("pv"))), 6)
          .as("p95_qty"),
        round(min(when(col("name") === "median_price", col("pv"))), 6)
          .as("median_price"))
  }

  /** TPC-H Q14 shape: conditional-aggregation ratio (promo revenue share)
    * per ship year. Sums are exact decimals; the single ratio division is
    * done in double and rounded in both engines. */
  def q14ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // the join only fetches ONE BIT of the part row: project the dim to
    // (key, is-promo) before the broadcast — the hash relation shrinks
    // from the full 9-column part row (strings included) to key+bool,
    // and the per-row probe copies nothing it won't aggregate
    val promo = Tables.part(s, dir).select(col("p_partkey"),
      col("p_type").startsWith("PROMO").as("__promo"))
    val joined = li
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("ship_year"))
    // Two-regime sums on the catalog row count (parquet footers, no
    // job). Within 2e9 fact rows the 4dp revenue rides EXACT LONG
    // 4dp-units — discPrice is a scale-4 decimal, so ×10⁴ is integral
    // and the long sum is the identical integer the decimal sum holds
    // (per-row ≤ 1.1e9 units, 2e9 rows ≤ 2.2e18 < 2⁶³: a 4× margin),
    // at codegen'd long-add cost instead of per-row BigDecimal adds
    // (the decimal(30,4) accumulator is boxed — measured ~2× the whole
    // op at sf3). Past 2e9 rows the decimal plan takes over unchanged —
    // same expressions, unbounded precision.
    if (Tables.rowCount(s, dir, "lineitem") <= 2L * 1000 * 1000 * 1000) {
      val dp4 = (discPrice(col("l_extendedprice"), col("l_discount"))
        * 10000).cast("long")
      joined.agg(
        round(lit(100.0) *
          coalesce(sum(when(col("__promo"), dp4)), lit(0L)).cast("double")
          / sum(dp4).cast("double"), 4).as("promo_ratio"),
        count(lit(1)).as("n_items"))
    } else {
      val dp = discPrice(col("l_extendedprice"), col("l_discount"))
        .cast(DecimalType(30, 4))
      joined.agg(
        round(lit(100.0) *
          // no `.otherwise(0)`: sum skips nulls, so non-promo rows cost
          // no decimal add at all (dp is BigDecimal-backed past
          // precision 18 — the adds are the measurable term here); the
          // coalesce keeps the all-null group at the oracle's ELSE-0
          coalesce(sum(when(col("__promo"), dp)).cast("double"),
            lit(0.0)) /
          sum(dp).cast("double"), 4).as("promo_ratio"),
        count(lit(1)).as("n_items"))
    }
  }

  /** TPC-H Q15 shape: scalar-subquery comparison against a global max —
    * the top supplier(s) by quarterly revenue. The one-row max side is
    * broadcast; no driver-side collect. */
  def q15CorrelatedScalar(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(outd(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q19 shape: disjunction-of-conjunctions predicate spanning both
    * join sides. The per-table halves of each disjunct (brand/size on
    * part, quantity on lineitem) must still reach their scans as ORed
    * pushdown filters — the plan-level point of the shape. part grows
    * with SF, so no forced broadcast: AQE decides from size stats. */
  def q21DisjunctivePushdown(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val pt = Tables.part(s, dir)
    val cond =
      (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
        col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 15))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(outd(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Full-outer reconciliation (the data-quality join the landing layer
    * runs after ingest): customer spend vs order records joined FULL
    * OUTER per nation bucket, classifying rows as matched / customer
    * without orders / orphaned order. Outer joins null-fill — every
    * derived column is coalesced so the output carries no engine-variant
    * null renderings. */
  def q22OuterReconcile(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val ords = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).as("revenue_dec"))
    cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull,
          "matched")
          .when(col("o_custkey").isNull, "customer_no_orders")
          .otherwise(lit("orphan_order")).as("reconcile_status"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        // stays DECIMAL through the re-aggregation: summing the widened
        // doubles would be accumulation-order-dependent
        coalesce(col("revenue_dec"), lit(0).cast(DecimalType(18, 2)))
          .as("revenue_dec"))
      .groupBy(col("reconcile_status"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_orders")).as("total_orders"),
        outd(sum(col("revenue_dec"))).as("total_revenue"))
      .orderBy(col("reconcile_status"))
  }

  /** Revenue decile analysis — "which slice of customers drives the
    * spend": customers ntile(10)-bucketed by total order revenue
    * (deterministic tie-break), each decile reporting its revenue share
    * of the whole. Decimal sums end to end; the share ratio is the one
    * double, rounded identically in both engines.
    *
    * A literal `ntile(10) OVER (ORDER BY …)` is a single-task global
    * window over every customer — so the decile is derived instead from
    * an exact two-pass bucket rank (percentile range buckets on the
    * negated revenue, offsets, within-bucket row_number; see Ranking).
    * The per-customer aggregate ends in a shuffle, so ReuseExchange
    * feeds all ranking branches and the grand total from ONE scan. */
  /** TPC-H Q13 shape — customer order-count distribution INCLUDING the
    * zero-order customers an inner join silently drops: LEFT join dim →
    * fact, per-customer count (counting the nullable fact key, so
    * no-match rows count 0), then the bounded histogram. Both
    * aggregates are map-side combinable; the join shuffles on custkey
    * (fact-sized) and the histogram key space is bounded by the max
    * orders-per-customer. The classic "are inactive accounts real"
    * marketing readout. */
  /** Running market-segment revenue share — the cumulative share-shift
    * chart an account team reads: per (order month × segment), monthly
    * and cumulative exact-decimal revenue and the segment's running
    * share of the cumulative total. The month×segment grid is a
    * BOUNDED aggregate (calendar × 5 segments), so the cumulative
    * windows ride it for free; the share is the single float division,
    * identically ordered in both engines. One customer-keyed join
    * (dimension broadcast at any fact scale). */
  def q27RunningShare(s: SparkSession, dir: String): DataFrame =
    q27Of(Tables.orders(s, dir), Tables.customer(s, dir),
      smallDomain =
        Tables.rowCount(s, dir, "orders") <= Ranking.smallWindowRows)

  /** Two-regime cumulative (r19, verdict item 7). Under the footer
    * gate the all-segment running total rides the original global
    * range window — the month×segment grid is bounded and the extra
    * stages of the partitioned form measured +0.4s of pure constants
    * at sf0.1 (stash-paired 0.58 → 1.02s). Past the gate — a fact
    * table big enough that a years-long month domain is plausible —
    * the cumulative switches to a YEAR-partitioned range window plus
    * per-year offsets from a bounded broadcast self-join; decimal
    * addition is associative, so regrouping the same terms is exact
    * (WindowHardeningSpec pins both regimes equal across year
    * boundaries). */
  private[graft] def q27Of(orders: DataFrame, customer: DataFrame,
      smallDomain: Boolean): DataFrame = {
    val monthly = orders
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(date_trunc("month", col("o_orderdate"))
        .cast("date").as("month"), col("c_mktsegment"))
      .agg(sum(dec2(col("o_totalprice"))).as("month_rev_dec"))
    val wSeg = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("month"))
    val totaled =
      if (smallDomain) {
        val wAll = Window.orderBy(col("month"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        monthly.withColumn("cum_total_dec",
          sum(col("month_rev_dec")).over(wAll))
      } else {
        val wYear = Window.partitionBy(year(col("month")))
          .orderBy(col("month"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val yearTot = monthly.groupBy(year(col("month")).as("__y"))
          .agg(sum(col("month_rev_dec")).as("__yt"))
        val yearOff = yearTot.as("a")
          .join(yearTot.as("b"), col("b.__y") < col("a.__y"))
          .groupBy(col("a.__y").as("__y"))
          .agg(sum(col("b.__yt")).as("__off"))
        monthly
          .withColumn("__ycum", sum(col("month_rev_dec")).over(wYear))
          .join(broadcast(yearOff), year(col("month")) === col("__y"),
            "left")
          .withColumn("cum_total_dec",
            col("__ycum") + coalesce(col("__off"),
              lit(0).cast(DecimalType(18, 2))))
      }
    totaled
      .withColumn("cum_rev_dec", sum(col("month_rev_dec")).over(wSeg))
      .select(col("month"), col("c_mktsegment"),
        outd(col("month_rev_dec")).as("month_revenue"),
        outd(col("cum_rev_dec")).as("cum_revenue"),
        round(outd(col("cum_rev_dec")) / outd(col("cum_total_dec")), 6)
          .as("cum_share"))
      .orderBy(col("month"), col("c_mktsegment"))
  }

  def q26CustDistribution(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  def q23RevenueDeciles(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("revenue_dec"))
    val total = perCust.agg(sum(col("revenue_dec")).as("total_dec"))
    val nb = Ranking.bucketsFor(Tables.rowCount(s, dir, "customer"), 64)
    val bucketed = Ranking.withValueBucket(perCust,
      negate(col("revenue_dec")), "__bkt", nb)
    Ranking.bucketedRowNumber(bucketed, Nil, "__bkt", nb,
        Seq(col("revenue_dec").desc, col("o_custkey")), "__rn",
        totalName = Some("__n"))
      .withColumn("decile",
        Ranking.ntileFromRank(col("__rn"), col("__n"), 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("revenue_dec")).as("dec_rev"))
      .crossJoin(broadcast(total))
      .select(col("decile"), col("n_customers"),
        outd(col("dec_rev")).as("decile_revenue"),
        round(col("dec_rev").cast("double") /
          nullif(col("total_dec").cast("double"), lit(0.0)), 6)
          .as("revenue_share"))
      .orderBy(col("decile"))
  }

  /** CUBE multi-granularity aggregate over the part catalog. */
  def q16GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .cube(col("p_brand"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        outd(sum(dec2(col("p_retailprice")))).as("sum_price"))
  }

  /** Nested-aggregate argmax (TPC-H Q20/Q2-adjacent shape): each part's
    * LEADING supplier by shipped quantity, with its share of the part
    * total — the correlated "max over THIS part's suppliers" subquery
    * decorrelated by construction: per-(part, supplier) sums feed two
    * per-part re-aggregations (total, and the argmax as one
    * max(struct(qty, −suppkey)) — tie goes to the LOWEST suppkey with
    * no window and no sort, map-side combinable). Both re-aggregates
    * derive from the same pre-aggregation, so its exchange is reused;
    * the supplier dim broadcasts. */
  def q24NestedAgg(s: SparkSession, dir: String): DataFrame = {
    // PACKED argmax (r15): per-(part, supplier) quantity sums ride LONG
    // cents so BOTH aggregation levels stay codegen'd hash aggregates —
    // the old max(struct(qty, -suppkey)) forced a SortAggregate
    // (struct buffers are not hash-aggregable) with per-row interpreted
    // struct comparison. The winner is qty_cents·1e10 + (1e10−1−supp):
    // max picks the highest qty and, on cents ties, the LOWEST suppkey
    // — exactly the old struct order. Bounds GUARDED by packedOrFail:
    // a pair's qty <= 9.2e8 cents (quantity ≤ 50/row, O(1-10) rows per
    // pair at any SF) and suppkey < 1e10 keep the pack inside a long —
    // out-of-envelope data raises the named error, never a bad winner.
    // The emitted decimals are reconstructed EXACTLY from cents
    // (cents/100 at scale 2 is exact), so top_qty/part_qty/share go
    // through the same decimal→double arithmetic as before — the
    // oracle is unchanged.
    val base = packBase
    // per-row cents via the shared footer-gated Money extraction (r19,
    // the q2 discipline); the qc SUM keeps the long-cents plan either way
    val qtyOk = graft.functions.Money.fastPathHolds(s, dir, "lineitem",
      "l_quantity")
    val perSupp = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(graft.functions.Money.cents(col("l_quantity"), qtyOk))
        .as("qc"))
    val perPart = perSupp.groupBy(col("l_partkey"))
      .agg(sum(col("qc")).as("part_qc"),
        count(lit(1)).as("n_suppliers"),
        max(packedOrFail("q24_nested_agg", col("qc"),
          lit(base - 1) - col("l_suppkey"))).as("packed"))
    def qtyDec(cents: Column): Column =
      (cents.cast(DecimalType(20, 0)) / 100).cast(DecimalType(18, 2))
    val topQc = expr(s"packed div ${base}L")
    val topSupp = lit(base - 1) - pmod(col("packed"), lit(base))
    perPart
      .join(broadcast(Tables.supplier(s, dir)),
        topSupp === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"),
        col("n_suppliers"),
        outd(qtyDec(topQc)).as("top_qty"),
        outd(qtyDec(col("part_qc"))).as("part_qty"),
        round(qtyDec(topQc).cast("double")
          / qtyDec(col("part_qc")).cast("double"), 6).as("share"))
      .orderBy(col("p_partkey"))
  }

  /** Time-interval RANGE window — per order, the same customer's trailing
    * 30-day spend and order count (the rolling customer-velocity feature
    * fraud/credit models read). A RANGE frame over a day index, not a ROWS
    * frame: the window is defined by calendar distance, so gap days and
    * same-day ties are both handled exactly (all peer rows of a date are
    * in frame — deterministic under any row order). Partitioned by
    * customer: at 100 TB the window state is one customer's orders, never
    * a global sort. */
  def q25IntervalWindow(s: SparkSession, dir: String): DataFrame = {
    val dayIdx = datediff(col("o_orderdate").cast("date"),
      lit("1995-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayIdx)
      .rangeBetween(-30, 0)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        dec2(col("o_totalprice")).as("price_dec"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        outd(sum(col("price_dec")).over(w)).as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** Registry: SURVEY §2B name → operator. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_interval_window" -> (q25IntervalWindow _),
    "q24_nested_agg" -> (q24NestedAgg _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_topk_customers" -> (q7TopkCustomers _),
    "q8_window_rank" -> (q8WindowRank _),
    "q9_rollup" -> (q9Rollup _),
    "q10_distinct_agg" -> (q10DistinctAgg _),
    "q11_semi_join" -> (q11SemiJoin _),
    "q12_anti_join" -> (q12AntiJoin _),
    "q13_percentiles" -> (q13Percentiles _),
    "q14_conditional_agg" -> (q14ConditionalAgg _),
    "q15_correlated_scalar" -> (q15CorrelatedScalar _),
    "q16_grouping_sets" -> (q16GroupingSets _),
    "q21_disjunctive_pushdown" -> (q21DisjunctivePushdown _),
    "q22_outer_reconcile" -> (q22OuterReconcile _),
    "q23_revenue_deciles" -> (q23RevenueDeciles _),
    "q26_cust_distribution" -> (q26CustDistribution _),
    "q27_running_share" -> (q27RunningShare _))

  /** DuckDB oracles, column-name- and type-aligned with the plans above. */
  val oracles: Map[String, String] = Map(
    // bounded month×segment grid; cumulative decimal sums exact, the
    // share is the single identically-ordered float division
    "q27_running_share" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    c_mktsegment,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS month_rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT month, c_mktsegment,
        |  CAST(month_rev AS DOUBLE) AS month_revenue,
        |  CAST(SUM(month_rev) OVER (PARTITION BY c_mktsegment
        |    ORDER BY month) AS DOUBLE) AS cum_revenue,
        |  ROUND(CAST(SUM(month_rev) OVER (PARTITION BY c_mktsegment
        |      ORDER BY month) AS DOUBLE)
        |    / CAST(SUM(month_rev) OVER (ORDER BY month) AS DOUBLE), 6)
        |    AS cum_share
        |FROM m ORDER BY month, c_mktsegment""".stripMargin,
    "q26_cust_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q25_interval_window" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS spend_30d,
        |  COUNT(*) OVER w AS n_orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q24_nested_agg" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |pt AS (
        |  SELECT l_partkey, SUM(supp_qty) AS part_qty,
        |    COUNT(*) AS n_suppliers,
        |    MAX(supp_qty) AS top_qty
        |  FROM ps GROUP BY l_partkey),
        |top AS (
        |  SELECT p.l_partkey, MIN(l_suppkey) AS top_supp
        |  FROM ps JOIN pt p USING (l_partkey)
        |  WHERE supp_qty = top_qty GROUP BY p.l_partkey)
        |SELECT pt.l_partkey AS p_partkey, s.s_name, n_suppliers,
        |  CAST(top_qty AS DOUBLE) AS top_qty,
        |  CAST(part_qty AS DOUBLE) AS part_qty,
        |  ROUND(CAST(top_qty AS DOUBLE) / CAST(part_qty AS DOUBLE), 6)
        |    AS share
        |FROM pt JOIN top USING (l_partkey)
        |JOIN supplier s ON top.top_supp = s.s_suppkey
        |ORDER BY p_partkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH costs AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |best AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY l_partkey ORDER BY cost, l_suppkey) AS rn
        |  FROM costs)
        |SELECT p_partkey, p_name, s_name, CAST(cost AS DOUBLE) AS min_cost
        |FROM best, part, supplier
        |WHERE rn = 1 AND l_partkey = p_partkey AND l_suppkey = s_suppkey
        |ORDER BY p_partkey LIMIT 100""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_topk_customers" ->
      """SELECT c_custkey, c_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_orders
        |FROM orders, customer WHERE o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q8_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal, rn, running_bal FROM (
        |  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
        |    row_number() OVER w AS rn,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |) WHERE rn <= 3""".stripMargin,
    "q9_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer, nation, region
        |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
        |COUNT(DISTINCT o_orderpriority) AS n_priorities, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q11_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q13_percentiles" ->
      """SELECT l_returnflag,
        |ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |ROUND(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
        |ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q14_conditional_agg" ->
      // integer-exact: the scale-4 revenue is summed as exact 4dp-unit
      // integers on BOTH sides (the ×10⁴ cancels in the ratio), so the
      // two engines cast the IDENTICAL integers to double — no
      // engine-variant decimal→double pre-rounding in the quotient
      """SELECT year(l_shipdate) AS ship_year,
        |ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)
        |    ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS DOUBLE), 4) AS promo_ratio,
        |COUNT(*) AS n_items
        |FROM lineitem, part WHERE l_partkey = p_partkey
        |GROUP BY year(l_shipdate)""".stripMargin,
    "q15_correlated_scalar" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue FROM supplier, rev
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_disjunctive_pushdown" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |     (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |  OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |  OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))""".stripMargin,
    "q23_revenue_deciles" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec
        |  FROM orders GROUP BY o_custkey),
        |tot AS (SELECT SUM(revenue_dec) AS total_dec FROM per),
        |tiled AS (
        |  SELECT o_custkey, revenue_dec,
        |    ntile(10) OVER (ORDER BY revenue_dec DESC, o_custkey) AS decile
        |  FROM per),
        |agg AS (
        |  SELECT decile, COUNT(*) AS n_customers,
        |    SUM(revenue_dec) AS dec_rev
        |  FROM tiled GROUP BY decile)
        |SELECT CAST(decile AS INT) AS decile, n_customers,
        |  CAST(dec_rev AS DOUBLE) AS decile_revenue,
        |  ROUND(CAST(dec_rev AS DOUBLE) / NULLIF(CAST(total_dec AS DOUBLE), 0.0), 6)
        |    AS revenue_share
        |FROM agg, tot ORDER BY decile""".stripMargin,
    "q22_outer_reconcile" ->
      """WITH ords AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec
        |  FROM orders GROUP BY o_custkey),
        |recon AS (
        |  SELECT
        |    CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
        |      THEN 'matched'
        |      WHEN o_custkey IS NULL THEN 'customer_no_orders'
        |      ELSE 'orphan_order' END AS reconcile_status,
        |    COALESCE(n_orders, 0) AS n_orders,
        |    COALESCE(revenue_dec, CAST(0 AS DECIMAL(18,2))) AS revenue_dec
        |  FROM customer FULL OUTER JOIN ords ON c_custkey = o_custkey)
        |SELECT reconcile_status, COUNT(*) AS n_keys,
        |  CAST(SUM(n_orders) AS BIGINT) AS total_orders,
        |  CAST(SUM(revenue_dec) AS DOUBLE) AS total_revenue
        |FROM recon GROUP BY reconcile_status
        |ORDER BY reconcile_status""".stripMargin,
    "q16_grouping_sets" ->
      """SELECT p_brand, p_size, COUNT(*) AS n_parts,
        |COUNT(DISTINCT p_type) AS n_types,
        |CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY CUBE(p_brand, p_size)""".stripMargin)
}
