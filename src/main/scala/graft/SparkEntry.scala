package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Corpus, Dedup, Etl, Events, Multimodal, Relational, Sampling, Scale, Similarity, Text, Web}
import graft.sources.{CsvLanding, JsonLanding}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Etl.queries ++
      Dedup.queries ++ Similarity.queries ++ Text.queries ++
      Multimodal.queries ++ Streams.queries ++ JsonLanding.queries ++
      CsvLanding.queries ++ Scale.queries ++ AsOf.queries ++
      Sampling.queries ++ Corpus.queries ++ Web.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Etl.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Text.oracles ++
      Multimodal.oracles ++ Streams.oracles ++ JsonLanding.oracles ++
      CsvLanding.oracles ++ Scale.oracles ++ AsOf.oracles ++
      Sampling.oracles ++ Corpus.oracles ++ Web.oracles

  /** `oracleSql` with the `__SFDIR__` landed-artifact token resolved for
    * a concrete sf dir: oracles that verify landed artifacts (simhash
    * fingerprints, k-means centroids) embed the landing path, which is
    * derived from the sf dir under verification — the same slug rule the
    * landing ops use (Dedup.simhashFpDir / Similarity.kmeansCentDir).
    * Verify and Bench both dump THIS, so the DuckDB side always reads
    * the artifacts the run being checked actually produced. */
  def oracleSqlFor(sfDir: String): Map[String, String] = {
    val slug = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    val h = f"${scala.util.hashing.MurmurHash3.stringHash(sfDir)}%08x"
    oracleSql.map { case (k, v) =>
      k -> v.replace("__SFDIR__", slug).replace("__SFHASH__", h) }
  }
}
