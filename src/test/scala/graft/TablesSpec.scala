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
