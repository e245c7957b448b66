package graft

import org.apache.spark.sql.functions._

/** Web-corpus curation family (SURVEY §2J) + incremental quantizer
  * semantics at sf0.001/sf0.01 — the properties the hash oracle can't
  * state (rule-level canonicalization claims, cross-variant collapse,
  * gate booleans). */
class WebSpec extends SparkSpec {

  private val sfSmall = "/root/testdata/sf0.01"

  test("canonicalization: every rule fires — scheme/case/www/port/" +
      "trailing-slash/tracking-params all collapse") {
    val c = operators.Web.urlCanonicalize(spark, sfSmall)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no canonical form retains any surface noise
    assert(c.filter(col("canonical_url").rlike(
      "^(https?|HTTP)://|:443|:80|\\?.*utm_|\\?.*gclid|/$")).count() == 0,
      "canonical urls must be scheme-, port-, tracking- and slash-free")
    assert(c.filter(col("canonical_url").startsWith("www.")).count() == 0)
    assert(c.filter(col("canonical_url") =!=
      lower(col("canonical_url"))).count() == 0,
      "canonical urls are lowercase")
    // the three surface variants of one logical page collapse: every
    // doc's canonical equals host+path (params here are all tracking)
    assert(c.filter(col("canonical_url") =!=
      concat(col("host"), col("path"))).count() == 0)
    // registrable domain: co.uk hosts keep three labels, others two
    val uk = c.filter(col("host").endsWith(".co.uk"))
    assert(uk.count() > 0, "the synthetic corpus must cover co.uk")
    assert(uk.filter(size(split(col("domain"), "\\.")) =!= 3).count() == 0)
    assert(c.filter(!col("host").endsWith(".co.uk"))
      .filter(size(split(col("domain"), "\\.")) =!= 2).count() == 0)
    c.unpersist()
  }

  test("url dedup: groups are real cross-variant collisions and the " +
      "kept doc is the group minimum") {
    val c = operators.Web.urlCanonicalize(spark, sfSmall)
    val d = operators.Web.urlDedup(spark, sfSmall)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(d.count() > 0, "the synthetic corpus must contain url dups")
    // keep_doc_id is the min doc_id of its canonical group
    val bad = d.join(c, Seq("canonical_url"))
      .groupBy(col("canonical_url"), col("keep_doc_id"))
      .agg(min(col("doc_id")).as("true_min"))
      .filter(col("keep_doc_id") =!= col("true_min"))
    assert(bad.count() == 0)
    d.unpersist()
  }

  test("robots filter: exactly the ads/private path segments are " +
      "disallowed, everything else is allowed") {
    val r = operators.Web.robotsFilter(spark, sfSmall)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(r.filter(!col("allowed") &&
      !col("path").startsWith("/ads") &&
      !col("path").startsWith("/private")).count() == 0)
    assert(r.filter(col("allowed") &&
      (col("path").startsWith("/ads") ||
        col("path").startsWith("/private"))).count() == 0)
    // one verdict per document — the rule table must never fan out
    assert(r.count() ==
      Tables.documents(spark, sfSmall).count())
    r.unpersist()
  }

  test("license mix: shares sum to 1 and every domain maps to exactly " +
      "one license") {
    val m = operators.Web.licenseMix(spark, sfSmall).collect()
    val share = m.map(_.getAs[Double]("corpus_share")).sum
    assert(math.abs(share - 1.0) < 1e-4, s"shares sum to $share")
    val nDocs = m.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sfSmall).count(),
      "every doc carries exactly one license tag")
  }

  test("incremental kmeans: batch is the md5-nibble slice, corpus rows " +
      "cover every cluster, retrain fires only on drift > 1.2x") {
    val inc = operators.Similarity.kmeansIncremental(spark, sfSmall)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = operators.Similarity.quantizerK(spark, sfSmall)
    assert(inc.count() == k, "one row per landed cluster")
    // batch totals match the deterministic slice
    val batchTotal = inc.agg(sum(col("n_batch"))).head.getLong(0)
    val expected = Tables.embeddings(spark, sfSmall)
      .filter(graft.functions.HashExprs.md5SliceLong(
        col("vec_id").cast("string"), 32, 1) === 7L).count()
    assert(batchTotal == expected)
    assert(expected > 0, "the nibble slice must be non-empty")
    // gate coherence: retrain == (drift_ratio > 1.2) wherever defined
    // (away from the 6dp rounding boundary — retrain gates on the
    // unrounded ratio, the emitted ratio is rounded)
    assert(inc.filter(col("drift_ratio").isNotNull &&
      abs(col("drift_ratio") - 1.2) > 1e-5 &&
      (col("retrain") =!= (col("drift_ratio") > 1.2))).count() == 0)
    assert(inc.filter(col("drift_ratio").isNull &&
      col("retrain")).count() == 0,
      "clusters with no batch rows never demand a retrain")
    inc.unpersist()
  }
}
