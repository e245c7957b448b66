package graft

import org.apache.spark.sql.functions._

/** Throwaway r18 probe: time the doc-artifacts landing stages
  * sequentially (the production path runs them concurrently) to see
  * where the wall time lives. Not part of any suite. */
object LandProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import graft.functions.TextFns._
    val stop = array(operators.DocArtifacts.stopwords.map(lit): _*)
    val base = t("base tokenize+checkpoint") {
      Tables.spreadScan(s, s"$dir/documents.parquet",
          Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), col("n_chars"),
          tokens(col("text")).as("toks"), md5(col("text")).as("h"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
            .as("norm_h"))
        .localCheckpoint()
    }
    val tmp = "/tmp/graft_probe_land"
    t("toks write") {
      base.select(col("doc_id"), col("source"), col("toks"))
        .write.mode("overwrite").parquet(s"$tmp/toks")
    }
    val scalar = base.select(col("doc_id"), col("source"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), x => array_contains(stop, x)))
          .cast("long").as("q_hits"),
        col("h"), col("norm_h"))
      .withColumn("q_sort", -col("q_hits") * lit(16777216L) +
        conv(substring(col("h"), 1, 6), 16, 10).cast("long"))
    t("stats write (bucketed)") {
      operators.Ranking.bucketedPrefixSum(
          operators.Ranking.withValueBucket(scalar, col("q_sort"),
            "q_bucket", operators.Ranking.bucketsFor(
              Tables.rowCount(s, dir, "documents"), 256)),
          "q_bucket", operators.Ranking.bucketsFor(
            Tables.rowCount(s, dir, "documents"), 256),
          Seq(col("q_sort"), col("h"), col("doc_id")),
          col("n_tokens"), "cum_excl", group = Seq("source"),
          totalName = Some("tokens_total"))
        .write.mode("overwrite").parquet(s"$tmp/stats")
    }
    t("sh3 write") {
      base.select(col("doc_id"), col("source"),
          explode(wordShingles(col("toks"), 3)).as("shingle"))
        .write.mode("overwrite").parquet(s"$tmp/sh3")
    }
    t("sh8 write") {
      base.select(col("doc_id"),
          explode(wordShingles(col("toks"), 8)).as("span"))
        .write.mode("overwrite").parquet(s"$tmp/sh8")
    }
    t("doctf write") {
      base.select(col("doc_id"), col("source"),
          explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("source"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"$tmp/doctf")
    }
    t("srctf write") {
      s.read.parquet(s"$tmp/doctf")
        .groupBy(col("source"), col("tok"))
        .agg(sum(col("tf")).as("n"))
        .write.mode("overwrite").parquet(s"$tmp/srctf")
    }
    t("bigrams write") {
      import s.implicits._
      base.select(col("toks")).as[Seq[String]]
        .mapPartitions { it =>
          val m = new java.util.HashMap[String, Long]
          it.foreach { toks =>
            var i = 0
            while (i < toks.length - 1) {
              m.merge(toks(i) + " " + toks(i + 1), 1L, Long.box(_) + _)
              i += 1
            }
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
        }
        .toDF("bigram", "n")
        .groupBy(col("bigram")).agg(sum(col("n")).as("n"))
        .write.mode("overwrite").parquet(s"$tmp/bigrams")
    }
    s.stop()
  }
}
