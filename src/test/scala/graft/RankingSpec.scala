package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import operators.Ranking

/** Equivalence checks for the distributed two-pass ranking core: the
  * bucketed plans must reproduce the single-task window answers exactly
  * (the windows here run on tiny test data where single-task is fine —
  * production plans never use them, PlanAudit asserts that). */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // heavy ties on v, two skewed groups on g
  private val rows = (1L to 400L).map { i =>
    (if (rnd.nextInt(10) < 8) "big" else "small", rnd.nextInt(12), i)
  }

  test("groupedPercentiles equals the percentile aggregate bit-for-bit") {
    // two measures with different ranges + heavy ties + a skewed group,
    // odd and even group sizes (integer and fractional rank positions)
    val df = rows.toDF("g", "v", "id")
      .select(col("g"), explode(array(
        struct(lit("small_vals").as("m"), col("v").cast("double").as("v")),
        struct(lit("wide_vals").as("m"),
          (col("id") * 37 % 991).cast("double").as("v")))).as("x"))
      .select(col("g"), col("x.m").as("m"), col("x.v").as("v"))
    val got = Ranking.groupedPercentiles(df, Seq("g"), Map(
        "small_vals" -> Seq("p50s" -> 0.5, "p95s" -> 0.95),
        "wide_vals" -> Seq("p50w" -> 0.5, "p07w" -> 0.07)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val agg = df.groupBy(col("g"), col("m"))
      .agg(percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.95)).as("p95"),
        percentile(col("v"), lit(0.07)).as("p07"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for (g <- Seq("big", "small")) {
      assert(got((g, "p50s")) == agg((g, "small_vals"))._1)
      assert(got((g, "p95s")) == agg((g, "small_vals"))._2)
      assert(got((g, "p50w")) == agg((g, "wide_vals"))._1)
      assert(got((g, "p07w")) == agg((g, "wide_vals"))._3)
    }
  }

  test("groupedPercentilesWide equals the percentile aggregate AND the " +
      "melted form bit-for-bit") {
    // the same two measures as the melted test, un-melted: separate
    // columns of one row — the wide pipeline (contingency histogram,
    // pre-filtered refinement explode) must land the identical doubles
    val wide = rows.toDF("g", "v", "id")
      .select(col("g"), col("v").cast("double").as("small_vals"),
        (col("id") * 37 % 991).cast("double").as("wide_vals"))
    val got = Ranking.groupedPercentilesWide(wide, Seq("g"), Seq(
        "small_vals" -> Seq("p50s" -> 0.5, "p95s" -> 0.95),
        "wide_vals" -> Seq("p50w" -> 0.5, "p07w" -> 0.07)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got.size == 8)
    val agg = wide.groupBy(col("g"))
      .agg(percentile(col("small_vals"), lit(0.5)).as("p50s"),
        percentile(col("small_vals"), lit(0.95)).as("p95s"),
        percentile(col("wide_vals"), lit(0.5)).as("p50w"),
        percentile(col("wide_vals"), lit(0.07)).as("p07w"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    for (g <- Seq("big", "small")) {
      assert(got((g, "p50s")) == agg(g)._1)
      assert(got((g, "p95s")) == agg(g)._2)
      assert(got((g, "p50w")) == agg(g)._3)
      assert(got((g, "p07w")) == agg(g)._4)
    }
    // and nulls in one measure are ignored per-measure (the aggregate's
    // rule), not dropped row-wise
    val withNulls = wide.withColumn("small_vals",
      when(col("wide_vals") < 100, lit(null)).otherwise(col("small_vals")))
    val gotN = Ranking.groupedPercentilesWide(withNulls, Seq("g"), Seq(
        "small_vals" -> Seq("p50s" -> 0.5),
        "wide_vals" -> Seq("p50w" -> 0.5)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val aggN = withNulls.groupBy(col("g"))
      .agg(percentile(col("small_vals"), lit(0.5)).as("p50s"),
        percentile(col("wide_vals"), lit(0.5)).as("p50w"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    for (g <- Seq("big", "small")) {
      assert(gotN((g, "p50s")) == aggN(g)._1)
      assert(gotN((g, "p50w")) == aggN(g)._2)
    }
  }

  test("groupedPercentiles stays exact for a measure the boundary " +
      "sample misses (one-bucket fallback)") {
    // 3 rows of a rare measure among 2000 of a common one: the 5%
    // boundary sample almost surely holds no rare rows, so the rare
    // measure rides the left-join fallback (all rows in bucket 0) —
    // exactness must not depend on which path it takes
    val df = ((1 to 2000).map(i => ("g1", "common", (i * 13 % 997).toDouble))
        ++ Seq(("g1", "rare", 5.0), ("g1", "rare", 1.0), ("g1", "rare", 9.0)))
      .toDF("g", "m", "v")
    val got = Ranking.groupedPercentiles(df, Seq("g"), Map(
        "common" -> Seq("p50c" -> 0.5),
        "rare" -> Seq("p50r" -> 0.5, "p99r" -> 0.99)))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val agg = df.groupBy(col("m"))
      .agg(percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.99)).as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got("p50c") == agg("common")._1)
    assert(got("p50r") == agg("rare")._1)
    assert(got("p99r") == agg("rare")._2)
  }

  test("groupedPercentiles is exact on an input downstream of an " +
      "AQE-coalesced shuffle (boundary pinning)") {
    // the latent r11 hazard: a seeded sample is only deterministic for
    // identical input partitioning, and the bucket function is
    // re-evaluated in pass 2 and pass 3 — so a shuffle-rooted input
    // whose partitioning AQE may re-plan between passes could get
    // DIFFERENT boundaries per pass unless they are pinned to one
    // driver-side evaluation. The input here sits on a groupBy shuffle
    // (AQE coalesces its 32 partitions) rather than a scan.
    val df = rows.toDF("g", "v", "id")
      .groupBy(col("g"), col("id")).agg(max(col("v")).as("v0"))
      .select(col("g"), lit("m0").as("m"), col("v0").cast("double").as("v"))
    val got = Ranking.groupedPercentiles(df, Seq("g"), Map(
        "m0" -> Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val agg = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.25)).as("p25"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (g <- Seq("big", "small")) {
      assert(got((g, "p25")) == agg(g)._1)
      assert(got((g, "p50")) == agg(g)._2)
      assert(got((g, "p90")) == agg(g)._3)
    }
  }

  test("value-bucket global row_number equals the global window") {
    val df = rows.toDF("g", "v", "id")
    val got = Ranking.bucketedRowNumber(
      Ranking.withValueBucket(df, col("v"), "__bkt", 8),
      Nil, "__bkt", 8, Seq(col("v"), col("id")), "rn",
      totalName = Some("n"))
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(got.select(col("id"), col("rn")).collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap ==
      want.select(col("id"), col("rn")).collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap)
    assert(got.select(col("n")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(400L))
  }

  test("grouped hex-prefix row_number equals the per-group window") {
    val df = rows.toDF("g", "v", "id")
      .withColumn("hk", md5(concat(col("id"))))
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("hk")))
    val got = Ranking.bucketedRowNumber(df, Seq("g"), "__bkt", 256,
      Seq(col("hk"), col("id")), "rn", totalName = Some("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("hk"), col("id"))
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("g"))))
    val key = (r: org.apache.spark.sql.Row) =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))
    assert(got.select(col("id"), col("rn"), col("n")).collect()
      .map(key).toMap ==
      want.select(col("id"), col("rn"), col("n")).collect()
        .map(key).toMap)
  }

  test("ntileFromRank equals the window ntile across n and k") {
    for (n <- Seq(1, 2, 3, 7, 37, 100); k <- Seq(1, 2, 4, 7, 10)) {
      val df = (1 to n).toDF("id")
      val got = df
        .withColumn("rn", col("id").cast("long"))
        .withColumn("t", Ranking.ntileFromRank(col("rn"),
          lit(n.toLong), k))
        .select(col("id"), col("t"))
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("id"))))
        .select(col("id"), col("t"))
      val g = got.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val w = want.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(g == w, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("derived bucket counts: floor at small n, linear region, cap") {
    // floor keeps small-sf plans identical to the legacy fixed counts
    assert(Ranking.bucketsFor(0L, 256) == 256)
    assert(Ranking.bucketsFor(50000L, 64) == 64)
    assert(Ranking.bucketsFor(256L * 262144L, 256) == 256)
    // linear region: ~256k expected rows per bucket
    assert(Ranking.bucketsFor(1000L * 262144L, 256) == 1000)
    // cap bounds the broadcast aux table
    assert(Ranking.bucketsFor(Long.MaxValue / 4, 256) == 65536)
    // hex width covers bucketsFor's count at the same n
    for (n <- Seq(0L, 50000L, 66L * 1000 * 1000, 2L * 1000 * 1000 * 1000,
        Long.MaxValue / 4)) {
      val chars = Ranking.hexCharsFor(n)
      assert((1 << (4 * chars)) >= Ranking.bucketsFor(n, 2),
        s"hex domain too small at n=$n")
      assert(chars >= 2 && chars <= 4)
    }
  }

  test("empty input and null sort values behave") {
    val empty = Seq.empty[(Int, Long)].toDF("v", "id")
    assert(Ranking.bucketedRowNumber(
      Ranking.withValueBucket(empty, col("v"), "__bkt", 8),
      Nil, "__bkt", 8, Seq(col("v"), col("id")), "rn").count() == 0)
    // nulls: bucket 0, ranked first (NULLS FIRST ascending default)
    val withNulls = Seq((Some(5), 1L), (None, 2L), (Some(1), 3L), (None, 4L))
      .toDF("v", "id")
    val r = Ranking.bucketedRowNumber(
      Ranking.withValueBucket(withNulls, col("v"), "__bkt", 4),
      Nil, "__bkt", 4, Seq(col("v"), col("id")), "rn")
      .select(col("id"), col("rn")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(2L -> 1L, 4L -> 2L, 3L -> 3L, 1L -> 4L), s"got $r")
  }
}
