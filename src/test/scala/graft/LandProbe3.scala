package graft

import org.apache.spark.sql.functions._

/** Throwaway r18 probe 3: decompose the stats-landing bucketed plan. */
object LandProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import graft.functions.TextFns._
    val stop = array(operators.DocArtifacts.stopwords.map(lit): _*)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warmup")(Tables.documents(s, dir).count())
    val base = t("base checkpoint") {
      Tables.spreadScan(s, s"$dir/documents.parquet",
          Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), col("n_chars"),
          tokens(col("text")).as("toks"), md5(col("text")).as("h"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
            .as("norm_h"))
        .localCheckpoint()
    }
    val scalar = base.select(col("doc_id"), col("source"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), x => array_contains(stop, x)))
          .cast("long").as("q_hits"),
        col("h"), col("norm_h"))
      .withColumn("q_sort", -col("q_hits") * lit(16777216L) +
        conv(substring(col("h"), 1, 6), 16, 10).cast("long"))
    val nB = operators.Ranking.bucketsFor(
      Tables.rowCount(s, dir, "documents"), 256)
    println(s"[probe] nBuckets = $nB")
    t("scalar noop")(noop(scalar))
    val bucketed = operators.Ranking.withValueBucket(
      scalar, col("q_sort"), "q_bucket", nB)
    t("withValueBucket noop")(noop(bucketed))
    t("withValueBucket noop 2nd")(noop(bucketed))
    val full = operators.Ranking.bucketedPrefixSum(
      bucketed, "q_bucket", nB,
      Seq(col("q_sort"), col("h"), col("doc_id")),
      col("n_tokens"), "cum_excl", group = Seq("source"),
      totalName = Some("tokens_total"))
    t("bucketedPrefixSum noop")(noop(full))
    t("bucketedPrefixSum noop 2nd")(noop(full))
    t("stats write")(full.write.mode("overwrite")
      .parquet("/tmp/graft_probe_land/stats2"))
    s.stop()
  }
}
