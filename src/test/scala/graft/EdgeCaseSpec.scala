package graft

import org.apache.spark.sql.functions._

/** Degenerate-input regression: Spark 4's ANSI mode turns division by
  * zero into a query abort, so empty documents and zero-norm vectors
  * must null out, not crash. Drives the real operators against a
  * synthetic table dir containing exactly those rows. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge").toString
    Seq(
      (0L, "", "en", "src0"),
      (1L, "a normal little document with several words", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    Seq(
      (0L, Array.fill(64)(0.0f), 1),
      (1L, Array.tabulate(64)(_.toFloat / 64f), 1),
      (2L, Array.tabulate(64)(i => 1f - i.toFloat / 64f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("empty document: quality ratios null out instead of ANSI abort") {
    val rows = operators.Text.qualityScore(spark, edgeDir)
      .orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("punct_ratio")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("digit_ratio")))
    assert(!rows(1).isNullAt(rows(1).fieldIndex("punct_ratio")))
  }

  test("zero-norm vector: cosine ops skip it instead of ANSI abort") {
    val pairs = operators.Dedup.embeddingCosine(spark, edgeDir).collect()
    // the zero vector's cosines null out and are filtered; the two real
    // vectors still score and survive the threshold
    assert(pairs.nonEmpty, "real-vector pair must still be scored")
    assert(pairs.forall(r => !r.isNullAt(r.fieldIndex("cosine"))))
    assert(pairs.forall(r => r.getLong(r.fieldIndex("vec_a")) != 0L &&
      r.getLong(r.fieldIndex("vec_b")) != 0L))
  }

  test("zero-norm vector: normalize/quantize audit nulls out, no abort") {
    val rows = operators.Similarity.embNormalize(spark, edgeDir)
      .orderBy("vec_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(rows(0).fieldIndex("norm")) == 0.0)
    assert(rows(0).isNullAt(rows(0).fieldIndex("sum_q_err")))
    assert(!rows(1).isNullAt(rows(1).fieldIndex("sum_q_err")))
  }

  test("no near-dup pairs: cluster assignment returns empty, no abort") {
    assert(operators.Dedup.cluster(spark, edgeDir).count() == 0)
  }

  test("empty document flows through tfidf without aborting") {
    // "" tokenizes to a single empty token; it must score, not crash
    val df = operators.Text.tfidfTopk(spark, edgeDir)
    assert(df.filter(col("doc_id") === 0L).count() >= 1)
  }

  test("empty document flows through token, fingerprint and split ops") {
    assert(operators.Text.tokenCount(spark, edgeDir).count() == 2)
    assert(operators.Text.fingerprint(spark, edgeDir).count() == 2)
    assert(operators.Sampling.hashSplit(spark, edgeDir)
      .agg(sum("n_docs")).first().getLong(0) == 2)
  }

  test("a ZERO-ROW documents table lands artifacts and flows through " +
      "the artifact consumers without aborting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge0")
      .toString
    Tables.documents(spark, edgeDir).limit(0)
      .write.parquet(s"$dir/documents.parquet")
    operators.DocArtifacts.clearMemo()
    assert(Tables.rowCount(spark, dir, "documents") == 0L)
    // landing an empty corpus must produce empty (schema-carrying)
    // artifacts, and every consumer must return empty, not crash —
    // percentile bounds over zero rows, prefix sums over zero buckets,
    // span aggregates over zero shingles all degenerate here
    assert(operators.DocArtifacts.stats(spark, dir).count() == 0)
    assert(operators.Corpus.tokenBudgetTrim(spark, dir).count() == 0)
    assert(operators.Text.novelty(spark, dir).count() == 0)
    assert(operators.Text.boilerplateScrub(spark, dir).count() == 0)
    assert(operators.Text.boilerplateNgrams(spark, dir).count() == 0)
    assert(operators.Dedup.sourceOverlap(spark, dir).count() == 0)
    assert(operators.Corpus.clean(spark, dir).count() == 0)
  }

  test("a ZERO-ROW embeddings table lands empty moment tables and the " +
      "stats consumers return empty, not crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge0e")
      .toString
    Tables.embeddings(spark, edgeDir).limit(0)
      .write.parquet(s"$dir/embeddings.parquet")
    operators.Similarity.clearMomentsMemo()
    // the fold sees only empty partitions → zero partial rows → the
    // landed tables must still carry their schemas, and the d-row
    // broadcast joins degenerate to empty results (pcaProject is NOT
    // exercised: an eigensolve over an empty covariance is a caller
    // error by contract — there is no d)
    assert(operators.Similarity.dimStats(spark, dir).count() == 0)
    assert(operators.Similarity.covariance(spark, dir).count() == 0)
  }

  test("a ZERO-ROW events table: the sessionize sentinel probe " +
      "short-circuits to empty instead of an NPE") {
    // max(ts) over zero rows is NULL — the streaming sessionizer's
    // sentinel-position probe must not .getLong it (the events flavor
    // of the zero-row edge; the documents flavor is covered above)
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_ev")
      .toString
    graft.Tables(spark, sfTiny, "events").limit(0)
      .write.parquet(s"$dir/events.parquet")
    assert(streaming.Streams.sessionize(spark, dir).count() == 0)
  }

  test("packed-argmin envelope: an out-of-bounds extendedprice raises " +
      "the named overflow error instead of a silently wrong winner") {
    // q2/q24 pack (cents, suppkey) into one long; the envelope is
    // cents <= Long.MaxValue/1e10 (~$9.2M). Feed a $10M row through
    // the REAL q2 operator on a poisoned copy of the tiny tables.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_pack").toString
    for (t <- Seq("part", "supplier"))
      graft.Tables(spark, sfTiny, t).write.parquet(s"$dir/$t.parquet")
    val li = graft.Tables(spark, sfTiny, "lineitem")
    li.withColumn("l_extendedprice",
        when(col("l_orderkey") === li.select(min("l_orderkey"))
          .first().getLong(0), lit(1.0e7))
          .otherwise(col("l_extendedprice")))
      .write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[Exception] {
      operators.Relational.q2MinCostSupplier(spark, dir).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("packed-argmin overflow")),
      s"expected the named overflow error, got: $e")
    // and the unpoisoned tables still pass through the guard untouched
    assert(operators.Relational.q2MinCostSupplier(spark, sfTiny)
      .count() > 0)
  }
}
