package graft

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary pipeline: schema contract and deterministic stub features") {
    val df = operators.Multimodal.binaryPipeline(spark, sfTiny)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "feature", "byte_sums"))
    val r1 = df.orderBy("doc_id").first()
    val r2 = operators.Multimodal.binaryPipeline(spark, sfTiny)
      .orderBy("doc_id").first()
    assert(r1 == r2, "stub decode must be deterministic")
    assert(r1.getSeq[Float](3).length == 8)
    // n_bytes matches the payload the codec saw
    val bad = df.join(Tables.documents(spark, sfTiny), "doc_id")
      .filter(col("n_bytes") =!= length(col("text"))).count()
    assert(bad == 0)
  }

  test("resize: quarter-ish output, sums bounded by byte range") {
    val r = operators.Multimodal.resize(spark, sfTiny)
    assert(r.count() == Tables.documents(spark, sfTiny).count())
    assert(r.filter(col("n_bytes_out") > col("n_bytes_in")).count() == 0)
    // factor-2 block pooling over a 16-wide grid: output cells ≈ in/4
    // (+ partial-row/column slack)
    assert(r.filter(col("n_bytes_out") * 4 >
      col("n_bytes_in") + lit(32)).count() == 0)
    assert(r.filter(col("resized_sum") > col("n_bytes_out") * 255)
      .count() == 0, "a pooled byte stays within [0, 255]")
    assert(r.filter(col("n_bytes_out") < 1).count() == 0)
  }

  test("frame sample: every 5th second inclusive of zero and duration") {
    val df = operators.Multimodal.frameSample(spark, sfTiny)
    val byDoc = df.groupBy("doc_id", "duration_s")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    val bad = byDoc.filter(
      col("n") =!= (col("duration_s") / 5).cast("int") + 1 ||
        col("mx") > col("duration_s")).count()
    assert(bad == 0)
  }
}
