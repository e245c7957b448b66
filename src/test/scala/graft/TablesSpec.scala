package graft

/** The catalog plan memo (Tables.apply): within a session the same
  * (dir, table) serves the SAME analyzed plan — footer schema inference
  * runs once, not once per operator — and the memo invalidates on the
  * content fingerprint, so a rewritten table re-infers instead of
  * serving a plan over the old bytes (same discipline as the
  * landed-artifact memos). */
class TablesSpec extends SparkSpec {

  test("table plan memo serves one plan per session per content " +
      "fingerprint") {
    val a = Tables.customer(spark, sfTiny)
    val b = Tables.customer(spark, sfTiny)
    assert(a eq b,
      "two loads of an unchanged table must share the memoized plan " +
        "(schema re-inference measured ~55ms/call — 190 ops cannot " +
        "each pay it)")
  }

  test("table plan memo invalidates when the table's bytes change") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tblspec")
    val dir = tmp.toString
    def land(rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("r_regionkey", "r_name").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/region.parquet")
    }
    land(Seq((0L, "ALPHA"), (1L, "BETA")))
    val first = Tables.region(spark, dir)
    assert(first.count() == 2)
    assert(Tables.region(spark, dir) eq first, "unchanged bytes: memo hit")
    // rewrite with different content — fingerprint (count:bytes:mtime)
    // must change and the memo must re-infer, not serve the old plan
    Thread.sleep(5) // mtime granularity guard
    land(Seq((0L, "ALPHA"), (1L, "BETA"), (2L, "GAMMA")))
    val second = Tables.region(spark, dir)
    assert(!(second eq first), "rewritten bytes: memo must invalidate")
    assert(second.count() == 3,
      "post-rewrite plan must read the new file set")
  }

  test("rowCount answers from parquet footers and matches count(), " +
      "re-counting on rewrite") {
    for (t <- Seq("orders", "lineitem", "documents"))
      assert(Tables.rowCount(spark, sfTiny, t) ==
        Tables(spark, sfTiny, t).count(),
        s"footer row count for $t must equal a full count")
    val tmp = java.nio.file.Files.createTempDirectory("graft_rowcnt")
    val dir = tmp.toString
    import spark.implicits._
    def land(n: Int): Unit =
      (1 to n).map(i => (i.toLong, s"r$i")).toDF("r_regionkey", "r_name")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
    land(4)
    assert(Tables.rowCount(spark, dir, "region") == 4L)
    Thread.sleep(5)
    land(7)
    assert(Tables.rowCount(spark, dir, "region") == 7L,
      "rewritten table must re-count (fingerprint-keyed memo)")
    assert(Tables.rowCount(spark, dir, "absent_table") == 0L)
  }

  test("spreadScan widens a one-split scan and leaves a wide scan " +
      "alone, without materializing df.rdd") {
    val slots = spark.sparkContext.defaultParallelism
    val docs = Tables.documents(spark, sfTiny) // single small file
    val spread = Tables.spreadScan(spark,
      s"$sfTiny/documents.parquet", docs)
    assert(spread.rdd.getNumPartitions == slots,
      "a sub-split-count scan must spread to the slot count")
    // a path whose listing already exceeds the slot count: no-op
    val tmp = java.nio.file.Files.createTempDirectory("graft_spread")
    val wide = s"$tmp/wide.parquet"
    docs.repartition(slots * 2).write.mode("overwrite").parquet(wide)
    val df = spark.read.parquet(wide)
    assert(Tables.spreadScan(spark, wide, df) eq df,
      "a scan with enough splits must pass through untouched")
  }

  test("missing required columns still fail fast through the memo") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tblspec2")
    val dir = tmp.toString
    import spark.implicits._
    Seq((1L, "x")).toDF("r_regionkey", "wrong_col")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalArgumentException](Tables.region(spark, dir))
    assert(e.getMessage.contains("r_name"),
      "the schema check must name the missing column")
  }
}
