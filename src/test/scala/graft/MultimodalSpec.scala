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

  test("audio window: frame grid matches the hop formula; a sampled " +
      "doc's frames recompute exactly") {
    val a = operators.Multimodal.audioWindow(spark, sfTiny)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(a.filter(col("peak") > 255 || col("peak") < 0).count() == 0)
    assert(a.filter(col("energy") > 256L * 255L ||
      col("energy") < col("peak")).count() == 0)
    // per-doc frame count == the window/hop formula over n_chars (ASCII:
    // byte length == char length); short docs emit zero frames
    val counts = a.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("mx"))
    val expected = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("n_chars"),
        when(col("n_chars") < 256, 0L)
          .otherwise(floor((col("n_chars") - 256) / 128) + 1).as("want"))
    val j = expected.join(counts, Seq("doc_id"), "left")
    assert(j.filter(coalesce(col("n"), lit(0L)) =!= col("want"))
      .count() == 0, "frame counts must match the hop formula")
    // byte-exact recompute for one real document
    val doc = Tables.documents(spark, sfTiny)
      .filter(col("n_chars") >= 300).orderBy(col("doc_id").desc)
      .select(col("doc_id"), col("text")).head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val want = (0 to (bytes.length - 256) / 128).map { k =>
      val slice = bytes.slice(k * 128, k * 128 + 256).map(_ & 0xff)
      (k, slice.map(_.toLong).sum, slice.max)
    }
    val got = a.filter(col("doc_id") === doc.getLong(0))
      .orderBy(col("frame_idx"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == want, s"doc ${doc.getLong(0)}: got ${got.take(3)} " +
      s"want ${want.take(3)}")
    a.unpersist()
  }
}
