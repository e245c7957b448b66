package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions (SURVEY §6): the scale properties — pushdown,
  * pruning, broadcast choice, no accidental cross products — are part of
  * each operator's contract, not an afterthought.
  */
class PlanSpec extends SparkSpec {

  test("q6: the shipdate range predicates reach the parquet scan") {
    val p = plan(operators.Relational.q6ForecastRevenue(spark, sfTiny))
    // the range bounds themselves must be pushed — an empty-but-labeled
    // PushedFilters list or IsNotNull alone is a pushdown regression
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(800))
    assert(p.contains("LessThan(l_shipdate"), p.take(800))
  }

  test("q1: scan prunes to the referenced columns only") {
    val p = plan(operators.Relational.q1PricingSummary(spark, sfTiny))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_partkey"),
      s"unused column read: $readSchema")
    assert(!readSchema.contains("l_orderkey"),
      s"unused column read: $readSchema")
  }

  test("q5: dimension joins are broadcast") {
    val p = plan(operators.Relational.q5LocalSupplier(spark, sfTiny))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("whole-stage codegen covers the q1 aggregate") {
    val df = operators.Relational.q1PricingSummary(spark, sfTiny)
    df.collect() // AQE materializes codegen stages only at execution
    val p = df.queryExecution.executedPlan.toString
    // "*(N)" prefixes mark WholeStageCodegen stages in executed plans
    assert(p.contains("*(1)"), p.take(600))
  }

  test("dedup joins are hash joins on bucket keys, never cartesian") {
    for (op <- Seq(operators.Dedup.ngramJaccard _,
        operators.Dedup.minhashLsh _, operators.Dedup.simhash _,
        operators.Dedup.embeddingCosine _)) {
      val p = plan(op(spark, sfTiny))
      assert(!p.contains("CartesianProduct"), p.take(400))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
    }
  }

  test("txt_pack and dedup_incremental: hash joins only, never cartesian") {
    for (op <- Seq(operators.Text.pack _, operators.Dedup.incremental _)) {
      val p = plan(op(spark, sfTiny))
      assert(!p.contains("CartesianProduct"), p.take(400))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
    }
  }

  test("bucketed join: no exchange feeds the join (co-located buckets)") {
    // at tiny SF AQE would broadcast the join and never exercise the
    // bucket layout — disable broadcast to force the sort-merge path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = operators.Scale.bucketedJoin(spark, sfTiny)
      df.collect()
      // AQE's toString appends the pre-optimization "Initial Plan" —
      // examine only the final executed section
      val full = df.queryExecution.executedPlan.toString
      val p = full.split("== Initial Plan ==")(0)
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0,
        s"bucketed join must be a sort-merge join: ${p.take(400)}")
      // the join must read co-bucketed tables without re-exchange; the
      // only allowed exchange is the final aggregation's, ABOVE the join
      val below = p.substring(joinIdx)
      assert(!below.contains("Exchange hashpartitioning"), below.take(600))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q21: disjunctive predicate halves reach BOTH scans") {
    // plan strings truncate scan metadata at 100 chars by default, which
    // cuts the OR clauses out of the assertion's view
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val df = operators.Relational.q21DisjunctivePushdown(spark, sfTiny)
      df.collect()
      val scans = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val liScan = scans.find(_.contains("lineitem")).getOrElse("")
      val ptScan = scans.find(_.contains("part.parquet")).getOrElse("")
      assert(liScan.contains("l_quantity") && liScan.contains("OR"),
        s"quantity OR-filter must reach the lineitem scan: ${liScan.take(300)}")
      assert(ptScan.contains("p_brand") && ptScan.contains("OR"),
        s"brand/size OR-filter must reach the part scan: ${ptScan.take(300)}")
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }

  test("dau/wau: explode-7 equi-join plan has no BNLJ or cartesian") {
    val df = operators.Events.dauWau(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"dau/wau must stay equi-join only: ${p.take(500)}")
  }

  test("salted join equals the plain join result") {
    val salted = operators.Scale.saltedJoin(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    val plain = graft.Tables.lineitem(spark, sfTiny)
      .join(graft.Tables.orders(spark, sfTiny)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("approx distinct within 5% of exact") {
    val rows = operators.Scale.approxDistinct(spark, sfTiny)
      .join(graft.Tables.orders(spark, sfTiny)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("exact")), "o_orderstatus")
      .select(col("approx_customers"), col("exact")).collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
    }
  }

  test("events ops reuse one user_id exchange (single shuffle)") {
    // count on the EXECUTED plan (formatted explain renders exchanges as
    // "+- Exchange (3)", which a startsWith counter never matched)
    val df = operators.Events.sessionize(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    // one partitioning by user_id feeds lag, running-sum and the final agg
    // (AQE's toString shows the final + initial plan: ≤2 lines total)
    assert(exchanges >= 1 && exchanges <= 2,
      s"$exchanges exchanges:\n${p.take(800)}")
  }
}
