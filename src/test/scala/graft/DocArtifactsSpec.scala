package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns._
import graft.operators.DocArtifacts

/** The shared per-doc artifact landing: byte-parity with the inline
  * expressions it replaced (the consumers' hash oracles depend on it),
  * plus the fingerprint re-landing discipline. */
class DocArtifactsSpec extends SparkSpec {

  test("landed artifacts equal the inline token/shingle/stat " +
      "expressions byte for byte") {
    DocArtifacts.clearMemo()
    val docs = Tables.documents(spark, sfTiny)

    // toks (carries source so token-level consumers never join back
    // to documents — corpus_dsir_weights)
    val gotToks = DocArtifacts.toks(spark, sfTiny)
      .select(col("doc_id"), col("source"), col("toks"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val wantToks = docs
      .select(col("doc_id"), col("source"), tokens(col("text")))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    assert(gotToks.toSeq == wantToks.toSeq)

    // stats scalars
    val stop = array(DocArtifacts.stopwords.map(lit): _*)
    val gotStats = DocArtifacts.stats(spark, sfTiny)
      .select(col("doc_id"), col("n_tokens"), col("q_hits"), col("h"))
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val wantStats = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).cast("long"),
        size(filter(col("toks"), x => array_contains(stop, x)))
          .cast("long"),
        md5(col("text")))
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(gotStats.toSeq == wantStats.toSeq)

    // exploded 3-gram shingles (distinct per doc, exploded)
    val gotSh3 = DocArtifacts.shingles3(spark, sfTiny)
      .select(col("doc_id"), col("shingle"))
      .orderBy(col("doc_id"), col("shingle")).collect().map(_.toSeq)
    val wantSh3 = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        explode(wordShingles(col("toks"), 3)).as("shingle"))
      .orderBy(col("doc_id"), col("shingle")).collect().map(_.toSeq)
    assert(gotSh3.toSeq == wantSh3.toSeq)

    // q_bucket is contiguous w.r.t. the quality order: bucket ids must
    // be non-decreasing when rows are sorted by q_sort
    val qb = DocArtifacts.stats(spark, sfTiny)
      .orderBy(col("q_sort")).select(col("q_bucket"))
      .collect().map(_.getInt(0))
    assert(qb.sameElements(qb.sorted),
      "q_bucket must be monotone along q_sort (contiguity)")
    assert(qb.forall(b => b >= 0 && b < 256))
  }

  test("landing memo re-lands when the documents table is rewritten") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_docart")
    val dir = tmp.toString
    def land(n: Int): Unit =
      Tables.documents(spark, sfTiny).limit(n)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    land(10)
    assert(DocArtifacts.stats(spark, dir).count() == 10)
    Thread.sleep(5) // mtime granularity guard
    land(20)
    assert(DocArtifacts.stats(spark, dir).count() == 20,
      "rewritten documents must re-land (fingerprint-keyed memo)")
  }
}
