package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._

/** Shared per-document derived artifacts (SURVEY §5 landed-artifact
  * discipline): ONE tokenize pass over the corpus lands the four tables
  * every token/shingle consumer re-derived for itself before r10 —
  *
  *   - `toks`  (doc_id, source, toks):       the whitespace token array
  *   - `stats` (doc_id, source, n_chars, n_tokens, q_hits, h,
  *              q_sort, q_bucket):           per-doc scalars (token
  *              count, stopword hits, md5) plus the corpus quality-rank
  *              position: `q_sort` is the one integer carrying
  *              (quality DESC, md5-prefix ASC) and `q_bucket` its
  *              256-quantile bucket — contiguous w.r.t. the quality
  *              order, so any quality-ordered scan (budget trims,
  *              quality-pruned exports) rides the two-pass bucket plan
  *              without re-deriving boundaries
  *   - `sh3`   (doc_id, source, shingle):    distinct word-3-grams
  *   - `sh8`   (doc_id, span):               distinct word-8-grams
  *   - `doctf` (doc_id, source, tok, tf):    per-doc term frequencies
  *              (the unigram substrate — entropy, hapax, Zipf,
  *              vocab coverage, BPE pairs, the unigram LM score)
  *
  * Consumers (txt_novelty, txt_boilerplate_ngrams, txt_boilerplate_scrub,
  * dedup_source_overlap, corpus_token_budget_trim, and the tuning
  * landing's token stage) each previously re-tokenized the corpus and
  * re-exploded their shingles — five corpus-sized string passes where one
  * suffices. At 100 TB this is the difference between one tokenize job
  * feeding N consumers off columnar storage and N tokenize jobs; locally
  * it was every remaining >2×-of-baseline throughput op in the r9 bench.
  *
  * The landing follows the `ensureTuningLanded` discipline
  * (Dedup.scala): memoized per (session, dir, content-fingerprint) so a
  * regenerated documents table re-lands instead of serving stale
  * artifacts; LANDED (not cached) because Verify/Bench clearCache()
  * between ops; `localCheckpoint` as the collapse barrier so Catalyst
  * cannot inline the tokenize into each of the four writes.
  *
  * Every value is the byte-identical expression the consumers inlined
  * before (same `tokens`/`wordShingles` builders), so downstream results
  * — and therefore the unchanged DuckDB oracles — hash-match exactly.
  */
object DocArtifacts {

  /** Landing dirs — the `Tables.landingDir` contract: computable from
    * `dir` alone so static oracle SQL can name them. */
  private[graft] def toksDir(dir: String): String =
    Tables.landingDir("doctoks", dir)
  private[graft] def statsDir(dir: String): String =
    Tables.landingDir("docstats", dir)
  private[graft] def sh3Dir(dir: String): String =
    Tables.landingDir("docsh3", dir)
  private[graft] def sh8Dir(dir: String): String =
    Tables.landingDir("docsh8", dir)
  private[graft] def doctfDir(dir: String): String =
    Tables.landingDir("doctf", dir)
  private[graft] def bigramsDir(dir: String): String =
    Tables.landingDir("docbigrams", dir)
  private[graft] def srctfDir(dir: String): String =
    Tables.landingDir("docsrctf", dir)

  /** The stopword registry behind `q_hits` — the quality proxy
    * corpus_token_budget_trim ranks on (kept here so the landed stat and
    * the op's oracle share one definition). */
  private[graft] val stopwords = Seq("the", "a", "of", "and", "to", "in")

  private val artifactsLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook: force the next consumer to re-run the landing pipeline
    * (StressSpec times the full tokenize→land stage, not the memo hit). */
  private[graft] def clearMemo(): Unit = artifactsLanded.clear()

  private[graft] def ensureLanded(s: SparkSession, dir: String): Unit = {
    Tables.landOnce(artifactsLanded,
      (System.identityHashCode(s.sparkContext), dir,
        Tables.fingerprint(s, dir, "documents"))) {
        val stop = array(stopwords.map(lit): _*)
        // spread: per-doc tokenize/shingle CPU behind one parquet split
        // (Tables.spread scaladoc); checkpoint: collapse barrier — four
        // writes reference `toks`, and without the barrier each one
        // would re-run the tokenize (the corpus_contamination lesson)
        val base = Tables.spreadScan(s, s"$dir/documents.parquet",
            Tables.documents(s, dir))
          .select(col("doc_id"), col("source"), col("n_chars"),
            tokens(col("text")).as("toks"), md5(col("text")).as("h"),
            // normalized-content hash (case-fold, trim, whitespace
            // collapse — the dedup_exact_norm definition) rides the
            // same text scan: the exact-dedup trio (dedup_exact_norm /
            // dedup_stats / dedup_incremental) each re-paid a full
            // regex+md5 corpus pass for it before r15
            md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
              .as("norm_h"))
          .localCheckpoint()
        val scalar = base.select(col("doc_id"), col("source"),
            col("n_chars"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(filter(col("toks"), x => array_contains(stop, x)))
              .cast("long").as("q_hits"),
            col("h"), col("norm_h"))
          // quality-order position: one integer carrying (quality DESC,
          // md5-prefix ASC) — monotone along the curation trim order
          .withColumn("q_sort", -col("q_hits") * lit(16777216L) +
            conv(substring(col("h"), 1, 6), 16, 10).cast("long"))
        // the four writes share the checkpointed base and distinct
        // output dirs: run them as CONCURRENT actions (cluster form: one
        // fair-scheduler pool) — wall time is the widest write, not the
        // sum of four job submissions
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val writes = Seq(
          // `source` rides along (columnar: readers that don't select
          // it never touch the pages) so token-level consumers that
          // group by source (corpus_dsir_weights) need no join back to
          // the documents table — the alternative was a data-sized
          // broadcast of a (doc_id, source) projection, a driver-memory
          // hazard at corpus scale
          Future(base.select(col("doc_id"), col("source"), col("toks"))
            .write.mode("overwrite").parquet(toksDir(dir))),
          // the stats landing ALSO carries the per-source quality-order
          // cumulative token mass (`cum_excl`, exclusive) and the
          // per-source token total — the quality-ordered manifest a
          // curation pipeline cuts token budgets against. Landing it
          // here rides the same two-pass bucket plan the bucket column
          // already needs, so every budget consumer
          // (corpus_token_budget_trim today; any budget sweep tomorrow)
          // is one scan + rollup instead of re-running the 4-stage
          // prefix sum per query.
          Future {
            val nDocs = Tables.rowCount(s, dir, "documents")
            val bucketed = Ranking.withValueBucket(scalar, col("q_sort"),
              "q_bucket", Ranking.bucketsFor(nDocs, 256))
            // two-regime on the footer count (the q1/q14 discipline):
            // within smallWindowRows the per-source direct window (one
            // exchange + sort, worst task = nDocs rows) replaces the
            // bucket plan's three extra stages; the values and the
            // landed schema are identical either way (q_bucket still
            // rides from withValueBucket)
            val stats =
              if (nDocs <= Ranking.smallWindowRows)
                Ranking.directPrefixSum(bucketed,
                  Seq(col("q_sort"), col("h"), col("doc_id")),
                  col("n_tokens"), "cum_excl", group = Seq("source"),
                  totalName = Some("tokens_total"))
              else Ranking.bucketedPrefixSum(bucketed,
                "q_bucket", Ranking.bucketsFor(nDocs, 256),
                Seq(col("q_sort"), col("h"), col("doc_id")),
                col("n_tokens"), "cum_excl", group = Seq("source"),
                totalName = Some("tokens_total"))
            stats.write.mode("overwrite").parquet(statsDir(dir))
          },
          Future(base.select(col("doc_id"), col("source"),
              explode(wordShingles(col("toks"), 3)).as("shingle"))
            .write.mode("overwrite").parquet(sh3Dir(dir))),
          Future(base.select(col("doc_id"),
              explode(wordShingles(col("toks"), 8)).as("span"))
            .write.mode("overwrite").parquet(sh8Dir(dir))),
          // per-doc term frequencies (doc_id, source, tok, tf) — the
          // unigram substrate six consumers re-derived per query before
          // r15 (entropy, hapax, zipf, vocab-coverage, BPE pairs, the
          // unigram-LM score + its ccnet consumer). A doc's rows live
          // in one scan partition, so the map-side partial agg already
          // FINISHES each (doc, tok) count — the landing's one exchange
          // carries type rows (≈60% of tokens), not token instances,
          // and every consumer afterwards reads columnar type counts
          // instead of re-exploding raw token streams.
          Future {
            base.select(col("doc_id"), col("source"),
                explode(col("toks")).as("tok"))
              .groupBy(col("doc_id"), col("source"), col("tok"))
              .agg(count(lit(1)).as("tf"))
              .write.mode("overwrite").parquet(doctfDir(dir))
            // (source, type) totals — VOCABULARY-sized, derived from the
            // just-landed doctf bytes (columnar type rows, never token
            // instances). Consumers that only need corpus/source type
            // counts (hapax/TTR, vocab coverage, the unigram-LM
            // vocabulary side) read this tiny table instead of
            // re-aggregating the corpus-sized doctf per query.
            s.read.parquet(doctfDir(dir))
              .groupBy(col("source"), col("tok"))
              .agg(sum(col("tf")).as("n"))
              .write.mode("overwrite").parquet(srctfDir(dir))
          },
          // corpus bigram counts (bigram, n) — the distinct-bigram
          // table, vocab²-bounded, landed once for every bigram
          // consumer (ngram stats top-k, the bigram-LM score) instead
          // of each paying the corpus-sized counting pass per query.
          // Folded through a bounded-memory per-partition hash-map
          // kernel: instances collapse to partial (bigram, n) counts in
          // place, and the map DRAINS to the output iterator past 4M
          // entries before more input is consumed — the batches are
          // yielded lazily (a chained fill/drain iterator, never an
          // accumulating buffer), so executor heap is bounded by the
          // flush cap plus one in-flight batch even on a corpus whose
          // per-partition distinct-bigram count is huge — partial
          // counts re-merge exactly in the one combining shuffle.
          Future {
            import s.implicits._
            base.select(col("toks")).as[Seq[String]]
              .mapPartitions { it =>
                new Iterator[(String, Long)] {
                  private val m = new java.util.HashMap[String, Long]
                  private var drain: java.util.Iterator[
                    java.util.Map.Entry[String, Long]] =
                    java.util.Collections.emptyIterator()
                  // consume input until the map passes the cap (or the
                  // partition ends), then expose the batch for draining
                  private def refill(): Unit = {
                    m.clear()
                    while (it.hasNext && m.size <= 4000000) {
                      val toks = it.next()
                      var i = 0
                      while (i < toks.length - 1) {
                        m.merge(toks(i) + " " + toks(i + 1), 1L,
                          Long.box(_) + _)
                        i += 1
                      }
                    }
                    drain = m.entrySet().iterator()
                  }
                  def hasNext: Boolean =
                    drain.hasNext || {
                      it.hasNext && { refill(); drain.hasNext }
                    }
                  def next(): (String, Long) = {
                    if (!hasNext) throw new NoSuchElementException
                    val kv = drain.next()
                    (kv.getKey, kv.getValue)
                  }
                }
              }
              .toDF("bigram", "n")
              .groupBy(col("bigram"))
              .agg(sum(col("n")).as("n"))
              .write.mode("overwrite").parquet(bigramsDir(dir))
          })
        Await.result(Future.sequence(writes),
          scala.concurrent.duration.Duration.Inf)
        ()
      }
  }

  /** Landed (doc_id, source, toks) token arrays. */
  private[graft] def toks(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(toksDir(dir))
  }

  /** Landed per-doc scalar stats. */
  private[graft] def stats(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(statsDir(dir))
  }

  /** Landed exploded distinct word-3-gram shingles. */
  private[graft] def shingles3(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(sh3Dir(dir))
  }

  /** Landed exploded distinct word-8-gram spans. */
  private[graft] def shingles8(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(sh8Dir(dir))
  }

  /** Landed per-doc term frequencies (doc_id, source, tok, tf). */
  private[graft] def doctf(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(doctfDir(dir))
  }

  /** Landed per-source type totals (source, tok, n) — vocabulary-sized. */
  private[graft] def srctf(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(srctfDir(dir))
  }

  /** Landed corpus bigram counts (bigram, n) — vocab²-bounded. */
  private[graft] def bigrams(s: SparkSession, dir: String): DataFrame = {
    ensureLanded(s, dir)
    s.read.parquet(bigramsDir(dir))
  }
}
