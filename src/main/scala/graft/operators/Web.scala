package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Web-corpus curation (SURVEY §2J): the URL/domain layer every
  * crawl-derived training corpus passes through BEFORE content-level
  * dedup — canonicalize URLs, drop exact re-crawls, profile domains,
  * apply robots/license policy (the C4 / RefinedWeb pre-filter stage;
  * reference scope: the curation surface its pipeline feeds,
  * lambda_function.py:245-311's standardize step being the per-record
  * analogue).
  *
  * The bundled `documents` table carries no url column, so the ops run
  * over a DETERMINISTIC synthetic url derived from (doc_id, source,
  * lang) — the same expression in Spark and the DuckDB oracle, exercising
  * every canonicalization rule (scheme/case/www/port/trailing-slash/
  * tracking-params) and colliding across variants so the dedup has real
  * work. The operator bodies never look at how the url was made: point
  * [[canonicalized]] at a real url column and the family runs unchanged.
  *
  * Scale shape: everything here is per-row string work + ONE
  * groupBy/join on a url- or domain-shaped key — linear, never doc×doc;
  * rule tables are bounded literals (broadcast side). At 100 TB the
  * canonical-url groupBy is the same shuffle as dedup_exact's md5 key.
  */
object Web {

  /** Deterministic synthetic url for the test corpus: three surface
    * variants (doc_id % 3) of one logical page so canonicalization has
    * real collisions — scheme case, WWW case, :443/:80 ports, trailing
    * slash, utm_/ref/gclid tracking params. Page identity =
    * (source, tld, path segment, lang, page number), all derived from
    * (doc_id, source, lang). */
  private[graft] def urlExpr: Column = {
    val page = col("doc_id") % 40
    val seg = element_at(
      array(lit("ads"), lit("articles"), lit("blog"), lit("private"),
        lit("docs")),
      (col("doc_id") % 5 + 1).cast("int"))
    val tld = element_at(
      array(lit("org"), lit("com"), lit("net"), lit("co.uk")),
      (col("doc_id") % 4 + 1).cast("int"))
    val domain = concat(col("source"), lit("-press."), tld)
    val path = concat(lit("/"), seg, lit("/"), col("lang"),
      lit("/page"), page)
    when(col("doc_id") % 3 === 0,
      concat(lit("https://www."), domain, lit(":443"), path,
        lit("?utm_source=feed&ref=home")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("HTTP://"), upper(concat(lit("www."), domain)), path,
          lit("/")))
      .otherwise(
        concat(lit("https://"), domain, path, lit("?gclid=g"), page,
          lit("&utm_campaign=x")))
  }

  /** SQL fragment producing the identical url per (doc_id, source,
    * lang) row — kept textually parallel to [[urlExpr]]. */
  private val urlSql: String =
    """CASE CAST(doc_id % 3 AS INT)
      |  WHEN 0 THEN 'https://www.' || source || '-press.' ||
      |    list_extract(['org','com','net','co.uk'],
      |      CAST(doc_id % 4 AS INT) + 1) || ':443/' ||
      |    list_extract(['ads','articles','blog','private','docs'],
      |      CAST(doc_id % 5 AS INT) + 1) || '/' || lang || '/page' ||
      |    CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&ref=home'
      |  WHEN 1 THEN 'HTTP://' || upper('www.' || source || '-press.' ||
      |    list_extract(['org','com','net','co.uk'],
      |      CAST(doc_id % 4 AS INT) + 1)) || '/' ||
      |    list_extract(['ads','articles','blog','private','docs'],
      |      CAST(doc_id % 5 AS INT) + 1) || '/' || lang || '/page' ||
      |    CAST(doc_id % 40 AS VARCHAR) || '/'
      |  ELSE 'https://' || source || '-press.' ||
      |    list_extract(['org','com','net','co.uk'],
      |      CAST(doc_id % 4 AS INT) + 1) || '/' ||
      |    list_extract(['ads','articles','blog','private','docs'],
      |      CAST(doc_id % 5 AS INT) + 1) || '/' || lang || '/page' ||
      |    CAST(doc_id % 40 AS VARCHAR) || '?gclid=g' ||
      |    CAST(doc_id % 40 AS VARCHAR) || '&utm_campaign=x'
      |END""".stripMargin

  /** Canonicalization rules, applied to a `url` column — the standard
    * crawl-dedup normal form: drop scheme, lowercase host, strip one
    * leading www., strip default ports (:80/:443), strip the path's
    * trailing slash, drop tracking params (utm_*, ref, fbclid, gclid),
    * sort surviving params. Canonical form is host + path [+ ?params]
    * — scheme-free, because http/https re-crawls of one page are the
    * single most common exact-dup source. */
  private[graft] def canonicalized(docs: DataFrame): DataFrame = {
    val noScheme = regexp_replace(col("url"), "^[A-Za-z]+://", "")
    val hostPort = lower(regexp_extract(noScheme, "^([^/]+)", 1))
    val host = regexp_replace(
      regexp_replace(hostPort, ":(443|80)$", ""), "^www\\.", "")
    val pathQuery = regexp_replace(noScheme, "^[^/]+", "")
    val rawPath = regexp_extract(pathQuery, "^([^?]*)", 1)
    val path = regexp_replace(rawPath, "/$", "")
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|ref|fbclid|gclid)=")))
    // registrable domain: last two labels, or three under a listed
    // multi-label public suffix (the mechanism; the full PSL is a
    // config table in production)
    val reg3 = regexp_extract(host, "([^.]+\\.(?:co\\.uk|ac\\.uk))$", 1)
    val reg2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    docs
      .withColumn("host", host)
      .withColumn("domain",
        when(reg3 =!= "", reg3)
          .otherwise(when(reg2 =!= "", reg2).otherwise(col("host"))))
      .withColumn("path", path)
      .withColumn("canonical_url",
        concat(col("host"), col("path"),
          when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
            .otherwise(lit(""))))
  }

  /** The same canonicalization as a SQL CTE body over a `u` relation
    * carrying (doc_id, url, lang, n_chars). */
  private val canonicalSql: String =
    """SELECT doc_id, url, lang, n_chars,
      |  regexp_replace(regexp_replace(
      |      lower(regexp_extract(regexp_replace(url, '^[A-Za-z]+://', ''),
      |        '^([^/]+)', 1)),
      |      ':(443|80)$', ''), '^www\.', '') AS host,
      |  CASE WHEN regexp_extract(regexp_replace(regexp_replace(
      |        lower(regexp_extract(regexp_replace(url, '^[A-Za-z]+://',
      |          ''), '^([^/]+)', 1)), ':(443|80)$', ''), '^www\.', ''),
      |      '([^.]+\.(?:co\.uk|ac\.uk))$', 1) <> ''
      |    THEN regexp_extract(regexp_replace(regexp_replace(
      |        lower(regexp_extract(regexp_replace(url, '^[A-Za-z]+://',
      |          ''), '^([^/]+)', 1)), ':(443|80)$', ''), '^www\.', ''),
      |      '([^.]+\.(?:co\.uk|ac\.uk))$', 1)
      |    ELSE regexp_extract(regexp_replace(regexp_replace(
      |        lower(regexp_extract(regexp_replace(url, '^[A-Za-z]+://',
      |          ''), '^([^/]+)', 1)), ':(443|80)$', ''), '^www\.', ''),
      |      '([^.]+\.[^.]+)$', 1)
      |  END AS domain,
      |  regexp_replace(regexp_extract(regexp_replace(
      |    regexp_replace(url, '^[A-Za-z]+://', ''), '^[^/]+', ''),
      |    '^([^?]*)', 1), '/$', '') AS path,
      |  regexp_replace(regexp_extract(regexp_replace(
      |      regexp_replace(url, '^[A-Za-z]+://', ''), '^[^/]+', ''),
      |      '^([^?]*)', 1), '/$', '') ||
      |    CASE WHEN len(list_sort(list_filter(string_split(
      |        regexp_extract(regexp_replace(regexp_replace(url,
      |          '^[A-Za-z]+://', ''), '^[^/]+', ''), '\?(.*)$', 1), '&'),
      |        x -> x <> '' AND NOT regexp_matches(x,
      |          '^(utm_[^=]*|ref|fbclid|gclid)=')))) > 0
      |      THEN '?' || array_to_string(list_sort(list_filter(
      |        string_split(regexp_extract(regexp_replace(regexp_replace(
      |          url, '^[A-Za-z]+://', ''), '^[^/]+', ''), '\?(.*)$', 1),
      |          '&'),
      |        x -> x <> '' AND NOT regexp_matches(x,
      |          '^(utm_[^=]*|ref|fbclid|gclid)='))), '&')
      |      ELSE '' END AS canonical_url""".stripMargin

  /** Shared SQL prefix: synthesize urls, canonicalize. The canonical
    * CTE's host column feeds the canonical_url, so the SQL must prepend
    * host to path+params — done here because canonicalSql's
    * canonical_url column above covers only path+params. */
  private val webCte: String =
    s"""WITH u AS (SELECT doc_id, lang, n_chars, $urlSql AS url
      |  FROM documents),
      |c0 AS ($canonicalSql FROM u),
      |c AS (SELECT doc_id, url, lang, n_chars, host, domain, path,
      |  host || canonical_url AS canonical_url FROM c0)""".stripMargin

  /** Documents with url + canonical columns — the family's shared scan. */
  private def canon(s: SparkSession, dir: String): DataFrame =
    canonicalized(Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        urlExpr.as("url")))

  /** URL canonicalization report: per document the raw url and its
    * canonical form, host, registrable domain and path — the
    * normalization step itself, emitted so downstream systems (and the
    * oracle) can audit every rule. One scan, no shuffle. */
  def urlCanonicalize(s: SparkSession, dir: String): DataFrame =
    canon(s, dir).select(col("doc_id"), col("url"), col("host"),
      col("domain"), col("path"), col("canonical_url"))

  /** Exact URL-level dedup — the first stage of crawl dedup (cheaper
    * than any content hash: re-crawls and tracking-param variants of
    * one page collapse on the canonical url BEFORE text ever loads).
    * Emits the duplicate groups: canonical url, the kept (minimum)
    * doc_id, and the copy count. One groupBy on the canonical key —
    * dedup_exact's shuffle shape. */
  def urlDedup(s: SparkSession, dir: String): DataFrame =
    canon(s, dir)
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)

  /** Per-domain corpus profile — the C4/RefinedWeb domain table that
    * drives source weighting and blocklists: docs, distinct canonical
    * pages, languages, chars, and corpus share per registrable domain.
    * One groupBy on the domain key; the corpus total is a plan-time
    * literal off parquet footer metadata (the thetaExp discipline). */
  def domainStats(s: SparkSession, dir: String): DataFrame = {
    val total = Tables.rowCount(s, dir, "documents")
    canon(s, dir)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_pages"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("corpus_share",
        round(col("n_docs") * lit(1.0) / lit(total.toDouble), 6))
  }

  /** Robots-policy path rules: the bounded disallow list a crawler
    * distills from robots.txt (broadcast side of the filter). */
  private val robotsRules: Seq[(String, String)] = Seq(
    "/ads" -> "disallow-ads",
    "/private" -> "disallow-private")

  /** Robots/policy filter: each document's canonical path checked
    * against the bounded disallow-prefix table — the pre-training
    * compliance gate. Emits every doc with its verdict (allowed +
    * matching rule), so the downstream join keeps or drops by one
    * boolean. The rule table broadcasts (bounded literal); prefix match
    * is a broadcast nested-loop join, linear in docs. Rule prefixes are
    * disjoint first segments, so at most one rule matches a path. */
  def robotsFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rules = broadcast(robotsRules.toDF("rule_prefix", "rule"))
    canon(s, dir)
      .join(rules, col("path").startsWith(col("rule_prefix")), "left")
      .select(col("doc_id"), col("domain"), col("path"),
        col("rule").isNull.as("allowed"), col("rule"))
  }

  /** License rules by domain suffix: the bounded license registry
    * (broadcast side) a curator maintains per TLD/registrar agreement. */
  private val licenseRules: Seq[(String, String)] = Seq(
    ".org" -> "cc-by",
    ".com" -> "all-rights-reserved",
    ".net" -> "cc-by-sa",
    ".co.uk" -> "ogl")

  /** License mix report: documents tagged by the bounded domain-suffix
    * license table (broadcast nested-loop, suffixes mutually exclusive
    * here — .co.uk checked before .uk would be in a real PSL-ordered
    * registry), aggregated to the per-license corpus composition that
    * decides whether a corpus is shippable. */
  def licenseMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val total = Tables.rowCount(s, dir, "documents")
    val rules = broadcast(licenseRules.toDF("suffix", "license"))
    canon(s, dir)
      .join(rules, col("domain").endsWith(col("suffix")), "left")
      .withColumn("license", coalesce(col("license"), lit("unknown")))
      .groupBy(col("license"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("domain")).as("n_domains"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("corpus_share",
        round(col("n_docs") * lit(1.0) / lit(total.toDouble), 6))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "web_url_canonicalize" -> (urlCanonicalize _),
    "web_url_dedup" -> (urlDedup _),
    "web_domain_stats" -> (domainStats _),
    "web_robots_filter" -> (robotsFilter _),
    "web_license_mix" -> (licenseMix _))

  val oracles: Map[String, String] = Map(
    "web_url_canonicalize" ->
      s"""$webCte
        |SELECT doc_id, url, host, domain, path, canonical_url FROM c"""
        .stripMargin,
    "web_url_dedup" ->
      s"""$webCte
        |SELECT canonical_url, MIN(doc_id) AS keep_doc_id,
        |  COUNT(*) AS n_copies
        |FROM c GROUP BY canonical_url HAVING COUNT(*) >= 2""".stripMargin,
    "web_domain_stats" ->
      s"""$webCte
        |SELECT domain, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT canonical_url) AS n_pages,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) /
        |    (SELECT COUNT(*) FROM documents), 6) AS corpus_share
        |FROM c GROUP BY domain""".stripMargin,
    "web_robots_filter" ->
      s"""$webCte,
        |r AS (SELECT * FROM (VALUES ('/ads', 'disallow-ads'),
        |  ('/private', 'disallow-private')) AS t(rule_prefix, rule))
        |SELECT doc_id, domain, path, rule IS NULL AS allowed, rule
        |FROM c LEFT JOIN r ON starts_with(path, rule_prefix)"""
        .stripMargin,
    "web_license_mix" ->
      s"""$webCte,
        |r AS (SELECT * FROM (VALUES ('.org', 'cc-by'),
        |  ('.com', 'all-rights-reserved'), ('.net', 'cc-by-sa'),
        |  ('.co.uk', 'ogl')) AS t(suffix, license)),
        |tagged AS (SELECT c.*, COALESCE(r.license, 'unknown') AS license
        |  FROM c LEFT JOIN r ON ends_with(c.domain, r.suffix))
        |SELECT license, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT domain) AS n_domains,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) /
        |    (SELECT COUNT(*) FROM documents), 6) AS corpus_share
        |FROM tagged GROUP BY license""".stripMargin)
}
