package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.TextFns._
import graft.functions.RollingHash.rollingHash

/** Text-analysis block (SURVEY §2F) — the LLM-training-data quality
  * operators over `documents`. All per-row work is expression-only
  * (codegen); the only shuffles are the final aggregations.
  */
object Text {

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Pseudo language profiles over the corpus vocabulary: disjoint
    * function-word sets per language. Real-world language ID swaps these
    * lists for actual stopword/character-n-gram profiles — the argmax
    * machinery is identical. */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "nicht", "merge", "sort", "hash", "batch"),
    "en" -> Seq("the", "a", "of", "join", "query", "fast", "table"),
    "es" -> Seq("el", "la", "que", "scan", "filter", "row", "column"),
    "fr" -> Seq("le", "les", "une", "group", "window", "stream", "value"),
    "zh" -> Seq("data", "key", "line", "part", "small", "slow", "customer"))

  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(tokens(t)).as("n_ws_tokens"),
      size(regexp_extract_all(t, lit(BpePattern), lit(0))).as("n_bpe_tokens"),
      length(t).as("n_chars_calc"))
  }

  /** Quality scoring: the length/punctuation/stopword/digit signals a
    * pre-training filter thresholds on. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val toks = col("toks") // materialized below: tokenization runs once
    val stop = array(Seq("the", "a", "of", "and", "to", "in").map(lit): _*)
    // nullif guards: an empty doc must yield null ratios, not a
    // DIVIDE_BY_ZERO abort under ANSI mode
    val len = nullif(length(col("text")).cast("double"), lit(0.0))
    val nTok = nullif(size(toks).cast("double"), lit(0.0))
    Tables.documents(s, dir)
      .withColumn("toks", tokens(t))
      .select(
      col("doc_id"),
      length(t).as("len_chars"),
      round(size(regexp_extract_all(t, lit("[\\.,!\\?;:]"), lit(0)))
        .cast("double") / len, 6).as("punct_ratio"),
      round(size(regexp_extract_all(t, lit("[0-9]"), lit(0)))
        .cast("double") / len, 6).as("digit_ratio"),
      round(size(filter(toks, x => array_contains(stop, x)))
        .cast("double") / nTok, 6).as("stopword_ratio"),
      round((length(t).cast("double") - nTok + lit(1.0)) / nTok, 6)
        .as("mean_word_len"))
  }

  /** Profile-scored language ID: per-language stopword hit counts, argmax
    * with lexicographic tie-break. One projection, no shuffle; all five
    * profiles scored in a single native pass (ProfileScores). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    // "scores" is materialized as its own column so the expression runs
    // once per row, not once per downstream reference
    val scores: Seq[(String, Column)] =
      LangProfiles.zipWithIndex.map { case ((lang, _), i) =>
        lang -> element_at(col("scores"), i + 1)
      }
    // argmax via a sorted struct array: highest score first, then language
    // name ascending — deterministic in both engines.
    val best = scores.map { case (lang, sc) =>
      struct((-sc).as("neg"), lit(lang).as("lang"))
    }
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("scores", graft.functions.ProfileScores.profileScores(
        col("toks"), LangProfiles.map(_._2)))
      .select(
        (col("doc_id") +:
          scores.map { case (l, c) => c.as(s"s_$l") }) :+
          element_at(array_sort(array(best: _*)), 1).getField("lang")
            .as("pred_lang"): _*)
  }

  /** Language-ID evaluation — the confusion matrix of the `langId`
    * heuristic against the labeled `lang` column, with per-label shares
    * (row-normalized recall): the QA artifact that decides whether a
    * cheap classifier is good enough to route a corpus (here it
    * measurably is NOT — the pseudo profiles hit ~22% on the synthetic
    * labels, which is exactly what this op exists to surface).
    * Prediction is the same single-pass ProfileScores projection as
    * `langId`; the matrix is one fully map-side-combinable aggregate
    * onto a ≤|langs|² key space, constant-size shuffle at any corpus
    * size; label totals ride a broadcast of the bounded matrix itself. */
  def langidEval(s: SparkSession, dir: String): DataFrame = {
    val scores: Seq[(String, Column)] =
      LangProfiles.zipWithIndex.map { case ((lang, _), i) =>
        lang -> element_at(col("scores"), i + 1)
      }
    val best = scores.map { case (lang, sc) =>
      struct((-sc).as("neg"), lit(lang).as("lang"))
    }
    val cells = Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("scores", graft.functions.ProfileScores.profileScores(
        col("toks"), LangProfiles.map(_._2)))
      .select(col("lang").as("label_lang"),
        element_at(array_sort(array(best: _*)), 1).getField("lang")
          .as("pred_lang"))
      .groupBy(col("label_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy(col("label_lang"))
      .agg(sum(col("n_docs")).as("n_label"))
    cells.join(broadcast(totals), "label_lang")
      .select(col("label_lang"), col("pred_lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_label").cast("double"),
          6).as("share"))
      .orderBy(col("label_lang"), col("pred_lang"))
  }

  /** Document fingerprint via the native RollingHash codegen expression.
    * Oracle-checked (formerly rows-only): the hash is plain wrapping
    * 64-bit polynomial math over the bytes (h ← h·1000003 + byte), so
    * DuckDB re-derives it with a HUGEINT list_reduce mod 2⁶⁴ over the
    * codepoints — valid byte-for-byte because the corpus is ASCII (the
    * oracle re-deriving per-codepoint would hash-mismatch loudly, never
    * silently, if a multi-byte char ever appeared). */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir).select(
      col("doc_id"),
      rollingHash(col("text")).as("fingerprint"),
      rollingHash(substring(col("text"), 1, 64)).as("prefix_fingerprint"))
  }

  /** Unigram log-probability quality score — the LM-score proxy a
    * pre-training filter thresholds on: mean log corpus-frequency of a
    * doc's tokens. Per-token log terms are rounded then summed as exact
    * decimals, so the per-doc score is identical under any accumulation
    * order and across engines (a raw double sum would be
    * shuffle-order-nondeterministic). Corpus stats side is a broadcast. */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    // both sides fold the LANDED per-doc tf table (doctf): the
    // vocabulary side is one type-row aggregate, and the per-doc mean
    // weights each type's 6dp-decimal log term by its exact integer tf
    // — term-for-term the same exact decimal sum as the r14
    // per-instance fold (tf · (k·10⁻⁶) is an exact decimal; Σ and the
    // ×10⁶ → long scale are unchanged), at type-row cost instead of
    // token-instance cost and with no per-query tokenize. (The r10→r11
    // inline-tokenize measurement predates the doctf landing: counts
    // now come pre-folded off columnar storage, which beats both forms
    // it compared.)
    val tf = DocArtifacts.doctf(s, dir)
      .select(col("doc_id"), col("tok"), col("tf"))
    // vocabulary totals off the landed (source, tok, n) table — a
    // vocabulary-sized rollup, not a corpus-sized doctf re-aggregate
    val freqs = DocArtifacts.srctf(s, dir)
      .groupBy(col("tok")).agg(sum(col("n")).as("tok_n"))
    val totals = freqs.agg(sum(col("tok_n")).as("corpus_n"))
    val term = round(log(col("tok_n").cast("double")
      / col("corpus_n").cast("double")), 6).cast(DecimalType(18, 6))
    // broadcast-fold regime (the bigramLogprob shape): within the
    // row+byte-bounded broadcast cap (boundedTermMap) the per-type
    // logprob terms — SAME Column expressions, identical rounding —
    // collect as exact 6dp-micros longs and a kernel folds each doc's
    // token array against the map with zero corpus-sized exchanges
    // (Σ per-instance lp6 ≡ Σ tf·lp6; long sums are exact and
    // order-free). Past either cap the type-row join plan below takes
    // over unchanged.
    val termRows = freqs.crossJoin(totals)
      .select(col("tok"), (term * lit(1000000L)).cast("long").as("lp6"))
      .limit(termRowCap + 1).collect()
    val termMap = boundedTermMap(termRows)
    if (termMap.isDefined) {
      import s.implicits._
      val bc = s.sparkContext.broadcast(termMap.get)
      Tables.spreadScan(s, DocArtifacts.toksDir(dir),
          DocArtifacts.toks(s, dir).select(col("doc_id"), col("toks")))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val t = bc.value
          it.flatMap { case (id, toks) =>
            if (toks.isEmpty) None
            else {
              var s6 = 0L
              var i = 0
              while (i < toks.length) {
                // same landed tokens built the map — a miss must throw
                s6 += t.get(toks(i))
                i += 1
              }
              Some((id, toks.length.toLong, s6))
            }
          }
        }
        .toDF("doc_id", "n_toks", "__s6")
        .select(col("doc_id"), col("n_toks"),
          mean4FromMicros(col("__s6"), col("n_toks")).as("mean_logprob"))
    } else
      tf.join(broadcast(freqs.crossJoin(totals)), "tok")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_toks"),
          (sum(col("tf") * term) * lit(1000000L)).cast("long").as("__s6"))
        .select(col("doc_id"), col("n_toks"),
          mean4FromMicros(col("__s6"), col("n_toks")).as("mean_logprob"))
  }

  /** Broadcast-term regime bounds (unigram/bigram LM scores). The r16
    * cap was 2M ROWS — row-counted, not byte-counted: 2M string-keyed
    * rows are plausibly several hundred MB as a driver array plus again
    * per executor as a broadcast HashMap (invisible at local[32],
    * an OOM candidate on tightly-sized executors). The collect is now
    * bounded at 200k rows (~tens of MB worst case) AND the accumulated
    * KEY BYTES are checked while the map builds — either bound trips
    * the op into its exchange plan, which computes the identical
    * result at any vocabulary size. */
  private[graft] val termRowCap = 200000
  private[graft] val termKeyByteCap = 32L * 1024 * 1024

  /** Build the broadcast term map iff the collected rows fit BOTH caps
    * (row count and accumulated key bytes); None → exchange regime. */
  private[graft] def boundedTermMap(rows: Array[org.apache.spark.sql.Row])
      : Option[java.util.HashMap[String, java.lang.Long]] = {
    if (rows.length > termRowCap) return None
    val m = new java.util.HashMap[String, java.lang.Long](rows.length * 2)
    var bytes = 0L
    var i = 0
    while (i < rows.length) {
      val k = rows(i).getString(0)
      bytes += 2L * k.length + 48L // UTF-16 chars + entry overhead
      if (bytes > termKeyByteCap) return None
      m.put(k, rows(i).getLong(1))
      i += 1
    }
    Some(m)
  }

  /** Half-up 4dp mean of an exact 6dp-decimal sum, in INTEGER
    * arithmetic: `s6` is the sum scaled to micros (exact long), `n` the
    * term count; the result is round_half_up(s6 / (100·n)) / 10⁴ — the
    * true rational mean rounded at 4dp, then the canonical double.
    *
    * Why not `round(sumDouble / n, 4)`: when the exact mean lands ON a
    * 4dp half-boundary (sum −115.8159 over 34 terms IS exactly
    * −3.40635), the double quotient falls one ulp below the boundary,
    * and the engines then disagree — Spark rounds the binary expansion
    * (→ −3.4063) while DuckDB rounds the shortest decimal repr
    * (→ −3.4064). Exposed by the sf1 sweep; integer half-up is
    * boundary-exact and engine-independent. The inner quotient is
    * computed as (t − t mod d)/d on longs — both operands of the final
    * `/` are exact in double (< 2⁵³), so no double-division rounding
    * can cross an integer. */
  private def mean4FromMicros(s6: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = n * lit(100L)
    def floorDiv(t: org.apache.spark.sql.Column) =
      (t - pmod(t, d)) / d
    (when(s6 >= 0, floorDiv(s6 + n * lit(50L)))
      .otherwise(-floorDiv(-s6 + n * lit(50L)))
      .cast("double") / lit(10000.0))
  }

  /** Bigram-LM quality score — the next step up from `unigramLogprob`
    * on the LM-filter ladder: per doc, the mean log conditional
    * probability log P(w2|w1) = log(c(w1 w2) / c(w1 ·)) under the
    * corpus's own bigram counts (no smoothing needed — every scored
    * bigram is by construction in the counts). Repetitive/templated
    * text scores near 0, incoherent token soup scores very negative —
    * the complement of `repetition`'s surface ratios.
    *
    * Scale shape: the bigram COUNT table is corpus-sized, so unlike
    * `unigramLogprob`'s vocabulary broadcast it is joined back to the
    * exploded stream with a shuffle equi-join on the bigram key —
    * linear at any corpus size. Both corpus-sized shuffles (count +
    * join-back) key on xxhash64 of the token PAIR, never the strings:
    * 8-byte fixed keys shuffle/sort ~2× cheaper than the 16+-byte
    * bigram strings they replace, and no bigram string is ever
    * materialized (two element_at lookups feed the hash directly).
    * Only the PREFIX totals (vocabulary-sized, keyed by the
    * first-token hash) ride a broadcast. A 64-bit collision would
    * merge two bigrams' counts — at 2⁻⁶⁴ pair probability that is
    * ~10⁻⁷ even for a 10⁸-distinct-bigram corpus, and the hash never
    * leaves the plan (output columns are unchanged), so the DuckDB
    * oracle still recomputes from the raw strings. Log terms are
    * 6dp-rounded then summed as exact decimals so the per-doc mean is
    * identical under any accumulation order. */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Two-regime plan keyed on the DISTINCT-bigram count (the
    // fkAudit/sourceOverlap discipline). Within the broadcast caps, the
    // op runs with ZERO corpus-sized exchanges: the LANDED
    // distinct-bigram table ([[bigramCounts]] — the counting pass is
    // landing-time work now, shared with ngramStats) supplies the
    // per-bigram logprob terms — computed with the SAME Column
    // expressions as the exchange plan, so rounding is bit-identical —
    // which collect into a broadcast map of exact 6dp-micros longs
    // under the row+byte bounds of [[boundedTermMap]] (a limit-pushdown
    // read of a landed columnar table: nothing corpus-sized runs before
    // the gate decides, and nothing is discarded past the caps), and a
    // fold kernel scores each doc's bigrams against it (long sums are
    // exact and order-free, identical to the decimal-sum aggregate).
    // The r15 form repartitioned ~37M exploded instance rows onto the
    // bigram hash and re-joined them (measured 3.9-4.5s at sf3; the
    // kernels run ~1s). Past either cap — real web corpora, where the
    // bigram vocabulary outgrows a broadcast — the exchange plan below
    // takes over unchanged.
    val b = bigramCounts(s, dir)
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
    val p = b.groupBy(col("prefix")).agg(sum(col("n")).as("np"))
    val termDf = b.join(broadcast(p), "prefix")
      .select(col("bigram"),
        (round(log(col("n").cast("double") / col("np").cast("double")), 6)
          .cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")
          .as("lp6"))
    val termRows = termDf.limit(termRowCap + 1).collect()
    val termMap = boundedTermMap(termRows)
    if (termMap.isDefined) {
      val bc = s.sparkContext.broadcast(termMap.get)
      Tables.spreadScan(s, DocArtifacts.toksDir(dir),
          DocArtifacts.toks(s, dir).select(col("doc_id"), col("toks")))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val t = bc.value
          it.flatMap { case (id, toks) =>
            if (toks.length < 2) None
            else {
              var s6 = 0L
              var i = 0
              while (i < toks.length - 1) {
                // built from the same landed tokens — a miss is a
                // consistency bug and must throw, not zero out
                s6 += t.get(toks(i) + " " + toks(i + 1))
                i += 1
              }
              Some((id, (toks.length - 1).toLong, s6))
            }
          }
        }
        .toDF("doc_id", "n_bigrams", "__s6")
        .select(col("doc_id"), col("n_bigrams"),
          mean4FromMicros(col("__s6"), col("n_bigrams"))
            .as("mean_logprob"))
    } else {
      // exchange regime: one corpus-sized repartition on the bigram
      // hash feeds BOTH the count aggregate and the per-doc join-back
      // (reused exchange; the groupBy and the join are co-partitioned)
      val w = col("toks")
      val idxs = when(size(w) >= 2, sequence(lit(1), size(w) - 1))
        .otherwise(array().cast("array<int>"))
      val exploded: DataFrame = DocArtifacts.toks(s, dir)
        .select(col("doc_id"), col("toks"), explode(idxs).as("i"))
        .select(col("doc_id"),
          xxhash64(element_at(w, col("i")),
            element_at(w, col("i") + 1)).as("h"),
          xxhash64(element_at(w, col("i"))).as("h1"))
        .repartition(col("h"))
      val bh = exploded.groupBy(col("h"))
        .agg(count(lit(1)).as("n"), min(col("h1")).as("h1"))
      val ph = bh.groupBy(col("h1")).agg(sum(col("n")).as("np"))
      val term = bh.join(broadcast(ph), "h1")
        .select(col("h"),
          round(log(col("n").cast("double") / col("np").cast("double")), 6)
            .cast(DecimalType(18, 6)).as("lp"))
      exploded.select(col("doc_id"), col("h")).join(term, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("lp")) * lit(1000000L)).cast("long").as("__s6"))
        .select(col("doc_id"), col("n_bigrams"),
          mean4FromMicros(col("__s6"), col("n_bigrams"))
            .as("mean_logprob"))
    }
  }

  /** Document chunking: fixed 32-token windows with 8-token overlap
    * (stride 24) — the unit-of-work shaping for embedding/training jobs.
    * Pure projection + explode; chunk boundaries derive from token
    * positions only, so chunking is deterministic and re-runnable. */
  def chunk(s: SparkSession, dir: String): DataFrame = {
    val window = 32
    val stride = 24
    val toks = col("toks")
    val starts = when(size(toks) >= 1,
      sequence(lit(1), size(toks), lit(stride)))
      .otherwise(array().cast("array<int>"))
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        posexplode(transform(starts, st =>
          concat_ws(" ", slice(toks, st, lit(window)))))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_chunk_tokens",
        size(split(col("chunk_text"), " ")))
  }

  /** Per-doc top-3 TF-IDF terms — keyword extraction, the classic
    * two-level corpus statistic: tf per (doc, term) and df per term are
    * both map-side-combinable aggregates; the df table is broadcast (its
    * size is the VOCABULARY, not the corpus — if the vocabulary itself
    * outgrows broadcast, drop the broadcast hint and let AQE pick the
    * shuffle join). Ranking uses the rounded score with a term tie-break
    * so ordering is reproducible across engines. */
  def tfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    // doc count from footer metadata (Tables.rowCount) — the catalog
    // statistic, not a count job
    val nDocs = Tables.rowCount(s, dir, "documents").toDouble
    // per-doc term frequencies straight from the LANDED doctf table
    // (guide §2.4 — remove the pass outright): the previous form
    // re-exploded the token arrays TWICE (once under tf, once under
    // the df subtree — Catalyst does not share the aggregate across
    // the self-join), re-paying the corpus-sized explode+count both
    // times; doctf already holds exactly that aggregate, columnar
    val tf = DocArtifacts.doctf(s, dir)
      .select(col("doc_id"), col("tok").as("term"), col("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .withColumn("tfidf", round(col("tf").cast("double") *
        log(lit(nDocs) / col("df").cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"),
        col("rank"))
  }

  /** Corpus bigram statistics: top-50 by frequency. Explode → partial agg
    * → one shuffle over the (bounded) bigram key space. */
  def ngramStats(s: SparkSession, dir: String): DataFrame = {
    // top-k over the LANDED distinct-bigram table (vocab²-bounded; the
    // per-partition counting kernel that folds ~37M bigram instances
    // into it is landing-time work now — DocArtifacts.bigrams — shared
    // with the bigram-LM score instead of re-paid per query). The
    // orderBy+limit is a TakeOrderedAndProject over the small landed
    // table: no corpus-sized anything at query time.
    bigramCounts(s, dir)
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)
  }

  /** Exact corpus bigram counts — the LANDED distinct-bigram table
    * (DocArtifacts.bigrams: vocab²-bounded, one bounded-memory kernel
    * pass + one combining shuffle paid once at landing time). Every
    * bigram consumer (ngram stats, the bigram-LM score) reads these
    * columnar counts instead of re-folding the corpus per query. */
  private def bigramCounts(s: SparkSession, dir: String): DataFrame =
    DocArtifacts.bigrams(s, dir)

  /** Within-doc repetition signals — the duplicate-token /
    * duplicate-bigram fractions a pre-training quality filter
    * thresholds on (boilerplate and spam are repetition-heavy).
    * Expression-only: every ratio derives from array_distinct sizes
    * per row, so the op is a pure projection with NO shuffle at any
    * corpus size — repetition of a doc never needs another doc. */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val w = col("toks")
    val bigrams = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val nTok = nullif(size(w).cast("double"), lit(0.0))
    val nBg = nullif(size(col("bgs")).cast("double"), lit(0.0))
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("bgs", bigrams)
      .select(col("doc_id"),
        size(w).as("n_toks"),
        size(array_distinct(w)).as("n_distinct_toks"),
        round(lit(1.0) - size(array_distinct(w)).cast("double") / nTok, 6)
          .as("dup_tok_ratio"),
        size(col("bgs")).as("n_bigrams"),
        size(array_distinct(col("bgs"))).as("n_distinct_bigrams"),
        round(lit(1.0) -
          size(array_distinct(col("bgs"))).cast("double") / nBg, 6)
          .as("dup_bigram_ratio"))
  }

  /** Token-length histogram per source — the length-distribution
    * telemetry behind truncation/packing decisions. Bucket = number of
    * binary digits of the token count (exact integer math — floor(log2)
    * via floating point is engine-dependent at powers of two), so the
    * groupBy key space is bounded (sources × ~20 buckets) and the agg
    * is fully map-side combinable. */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("source"), size(tokens(col("text"))).as("n_toks"))
      .withColumn("bucket", length(bin(col("n_toks").cast("long"))))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_toks")).as("min_toks"),
        max(col("n_toks")).as("max_toks"),
        sum(col("n_toks").cast("long")).as("sum_toks"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Sequence packing — the step after `txt_chunk` in every training-data
    * pipeline: chunks are concatenated in a deterministic content-hash
    * order and split into fixed token-budget training sequences
    * (concat-and-split packing). Every sequence except the last holds
    * EXACTLY `SeqBudget` tokens — a chunk that straddles a boundary is
    * emitted once per sequence with its token span split (`is_split`),
    * so packing efficiency is 1 and no sequence ever exceeds the budget.
    *
    * Scale shape: chunk sizes derive arithmetically from per-doc token
    * counts (window 32 / stride 24, same grid as `txt_chunk` — no chunk
    * text is materialized); the global running total over the hash order
    * is `Ranking.bucketedPrefixSum` on derived hex-prefix buckets — counts →
    * offsets → bucket-partitioned window, never a single-task global
    * cumsum. Budget is a power of two so sequence ids are exact bit
    * shifts, not float division. */
  def pack(s: SparkSession, dir: String): DataFrame = {
    val window = 32
    val stride = 24
    val budget = 256 // tokens per training sequence; 2^8 → shiftright(8)
    // chunk rows ≈ ceil(n_toks/stride) per doc — a small multiple of
    // the doc count; 4× headroom folds it into the derived prefix width
    val hc = Ranking.hexCharsFor(
      4L * graft.Tables.rowCount(s, dir, "documents"))
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).as("n_toks"))
      .filter(col("n_toks") >= 1)
      .select(col("doc_id"), col("n_toks"),
        explode(sequence(lit(0L),
          ((col("n_toks") - 1) / lit(stride)).cast("long"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(window),
          col("n_toks") - lit(stride) * col("chunk_idx")).cast("long")
          .as("t"))
      .withColumn("hk", md5(concat(lit("pack:"),
        col("doc_id").cast("string"), lit(":"),
        col("chunk_idx").cast("string"))))
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("hk"), hc))
    val cum = Ranking.bucketedPrefixSum(chunks, "__bkt", 1 << (4 * hc),
      Seq(col("hk"), col("doc_id"), col("chunk_idx")), col("t"), "cb")
    cum
      .withColumn("seq_first", shiftright(col("cb"), 8))
      .withColumn("seq_last", shiftright(col("cb") + col("t") - 1, 8))
      .select(col("doc_id"), col("chunk_idx"), col("t"), col("cb"),
        (col("seq_first") =!= col("seq_last")).as("is_split"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        (greatest(col("cb"), col("seq_id") * budget)
          - col("seq_id") * budget).cast("int").as("offset_in_seq"),
        (least(col("cb") + col("t"), (col("seq_id") + 1) * budget)
          - greatest(col("cb"), col("seq_id") * budget)).cast("int")
          .as("seg_tokens"),
        col("is_split"))
  }

  /** PII-style redaction over the semi-structured event payloads: mask
    * every digit run (the stand-in for emails/phones/ids in this
    * synthetic corpus — the op is the regex-scrub shape a real pipeline
    * points at PII patterns) and report per-record match telemetry.
    * Pure projection: codegen regex, no shuffle at all. */
  def redact(s: SparkSession, dir: String): DataFrame = {
    val p = col("props")
    Tables.events(s, dir).select(
      col("event_id"),
      regexp_replace(p, "[0-9]+", "#").as("props_redacted"),
      size(regexp_extract_all(p, lit("[0-9]+"), lit(0)))
        .as("n_redactions"),
      (length(p) - length(regexp_replace(p, "[0-9]", "")))
        .as("n_digit_chars"))
  }

  /** CCNet-style quality tiering: within each language, rank documents
    * by unigram LM score (best first) and cut into head / middle / tail
    * terciles — the standard quality-bucketing step before mixing
    * pre-training data. Ranking is exact but never single-task: docs get
    * approx-percentile value buckets on the (negated) score, then
    * two-pass bucket ranking within (lang, bucket); ntileFromRank turns
    * the exact rank into ANSI ntile(3), matching DuckDB's ntile. The
    * score is unigramLogprob's decimal-summed mean (order-independent),
    * so the ordering — and therefore every bucket label — is
    * cross-engine exact under doc_id tie-breaks. */
  def ccnetBucket(s: SparkSession, dir: String): DataFrame = {
    // materialize the scored table ONCE (contamination-audit discipline):
    // the percentile-bounds pass, the bucket-count pass and the ranked
    // pass would each otherwise recompute the exploded token join —
    // measured 8s → 2s at sf0.1. One row per doc, cut lineage.
    val scored = unigramLogprob(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id")
      .localCheckpoint()
    val nb = Ranking.bucketsFor(
      graft.Tables.rowCount(s, dir, "documents"), 64)
    val bucketed = Ranking.withValueBucket(scored,
      -col("mean_logprob"), "__bkt", nb)
    val tile = Ranking.ntileFromRank(col("rn"), col("n_lang"), 3)
    Ranking.bucketedRowNumber(bucketed, Seq("lang"), "__bkt", nb,
        Seq(col("mean_logprob").desc, col("doc_id")), "rn",
        totalName = Some("n_lang"),
        smallRows = Some(graft.Tables.rowCount(s, dir, "documents")))
      .select(col("doc_id"), col("lang"), col("mean_logprob"),
        when(tile === 1, "head").when(tile === 2, "middle")
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Cross-doc duplicated-span (boilerplate) detection — the
    * exact-substring dedup signal of Lee et al.'s "Deduplicating Training
    * Data Makes Language Models Better": word-8-gram spans appearing in
    * ≥ 3 distinct documents, with how many docs carry them and the first
    * offender. Spans are distinct per doc (wordShingles), so one
    * explode + count is the distinct-doc count — a single fully
    * map-side-combinable shuffle keyed by span; linear in corpus tokens,
    * never doc×doc. The ≥3 floor keeps the output the curated
    * boilerplate list, not the n-gram table. Reads the LANDED exploded
    * span table (DocArtifacts), so the op itself is one combinable
    * aggregate over columnar storage. */
  def boilerplateNgrams(s: SparkSession, dir: String): DataFrame = {
    DocArtifacts.shingles8(s, dir)
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc_id"))
      .filter(col("n_docs") >= 3)
  }

  /** Zipf fit — the power-law audit of the token distribution: a
    * least-squares line through (ln rank, ln frequency) over the top-100
    * types. Natural text sits near slope −1; a flat slope means
    * synthetic/degenerate vocabulary, a cliff means boilerplate — the
    * one-row corpus-health number next to the vocabulary-coverage curve.
    *
    * Scale shape: type counts are one combinable aggregate; the top-100
    * is a distributed TopK (`orderBy.limit`, deterministic tie-break),
    * and the rank window runs over that LIMIT-bounded table — 100 rows
    * in one task by construction, at any corpus size (the audit's
    * bounded-global-window allowance). The regression sums follow the
    * unigram-logprob discipline (ln terms 9dp-rounded → exact decimal
    * sums), so the fit is accumulation-order-independent and
    * cross-engine exact. */
  def zipfFit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // type counts fold the LANDED per-doc tf table (vocab-sized
    // exchange over type rows; no per-query tokenize/explode)
    val top = DocArtifacts.doctf(s, dir)
      .groupBy(col("tok")).agg(sum(col("tf")).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(100)
    val w = Window.orderBy(col("n").desc, col("tok"))
    val lx = log(col("rank"))
    val ly = log(col("n"))
    def dsum(c: org.apache.spark.sql.Column, p: Int) =
      sum(round(c, 9).cast(DecimalType(p, 9))).cast("double")
    val fitted = top.withColumn("rank", row_number().over(w))
      .agg(count(lit(1)).as("mcnt"),
        dsum(lx, 18).as("sx"), dsum(ly, 18).as("sy"),
        dsum(lx * ly, 28).as("sxy"), dsum(lx * lx, 28).as("sxx"))
    val m = col("mcnt").cast("double")
    val slope = (m * col("sxy") - col("sx") * col("sy")) /
      (m * col("sxx") - col("sx") * col("sx"))
    fitted.select(col("mcnt").as("n_points"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / m, 6).as("intercept"))
  }

  /** Lexical-diversity audit per source — hapax share and type/token
    * ratio, the standard degenerate-text detectors (a source whose
    * hapax share collapses is template/boilerplate; one whose TTR
    * collapses is repetition). Two map-side-combinable aggregation
    * levels: (source, type) counts, then per-source rollup — key space
    * is sources × vocabulary, never corpus rows; no window, no join. */
  def hapaxRatio(s: SparkSession, dir: String): DataFrame =
    // rides the LANDED (source, type) totals — a vocabulary-sized scan
    // and rollup; the corpus-sized doctf aggregate lives in the landing
    DocArtifacts.srctf(s, dir)
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6)
          .as("hapax_ratio"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
          .as("type_token_ratio"))
      .orderBy(col("source"))

  /** Boilerplate scrub — the ACTION step after `txt_boilerplate_ngrams`
    * detects cross-doc duplicated spans (the Lee et al. exact-substring
    * dedup applied): every token covered by a word-8-gram appearing in
    * ≥ 3 distinct documents is masked out, and the doc is reassembled
    * from the surviving tokens, with the masked-token count and ratio —
    * the transform a C4-style cleaning pipeline actually ships.
    *
    * Scale shape: positional 8-grams explode linearly in corpus tokens
    * and hit-test against the curated span list with one string-keyed
    * equi-join (the list is the ≥3-doc aggregate, orders of magnitude
    * smaller than the corpus; AQE broadcasts it when it fits). Covered
    * positions explode ×8 off the hits only, dedupe on (doc, position),
    * and fold back into one bounded-by-doc-length array per doc — no
    * step is ever pairwise in documents.
    *
    * Reads the LANDED artifacts (DocArtifacts): token arrays from the
    * toks table, the span list as one aggregate over the landed sh8
    * table. The positional explode — the expensive stage — runs only on
    * docs that carry ≥1 curated span (semi-join of landed sh8 against
    * the span list): a doc with no boilerplate 8-gram cannot have a
    * covered position, so the prefilter is exact, and at 100 TB it cuts
    * the explode to the contaminated slice of the corpus. */
  def boilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = DocArtifacts.toks(s, dir)
    val sh8 = DocArtifacts.shingles8(s, dir)
    // ≥3-doc span list: the curated boilerplate list, small in any
    // real corpus. Within the broadcast caps (rows + accumulated span
    // bytes — the boundedTermMap discipline scaled for 8-gram strings)
    // the whole hit-test/coverage/reassembly runs as ONE kernel pass
    // over the landed toks: each task slides an 8-token window against
    // the broadcast span SET, marks covered positions in a bitset, and
    // emits the finished row — zero positional explodes, zero joins,
    // zero (doc, pos) distinct (the r16 join plan materialized ~30M
    // positional-gram rows and measured 5.4s at sf3; the kernel is
    // ~2s). Past either cap — a corpus whose boilerplate list itself
    // outgrows a broadcast — the join plan below takes over unchanged.
    val spanRows = sh8
      .groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .select(col("span"))
      .limit(termRowCap + 1).collect()
    val fits = spanRows.length <= termRowCap && {
      var bytes = 0L
      var i = 0
      while (i < spanRows.length && bytes <= termKeyByteCap) {
        bytes += 2L * spanRows(i).getString(0).length + 48L; i += 1
      }
      bytes <= termKeyByteCap
    }
    if (fits) {
      import s.implicits._
      val set = new java.util.HashSet[String](spanRows.length * 2)
      spanRows.foreach(r => set.add(r.getString(0)))
      val bc = s.sparkContext.broadcast(set)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_masked",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("masked_ratio",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("scrubbed_text",
          org.apache.spark.sql.types.StringType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      Tables.spreadScan(s, DocArtifacts.toksDir(dir),
          docs.select(col("doc_id"), col("toks")))
        .mapPartitions { rows =>
          val spans = bc.value
          rows.map { r =>
            val id = r.getLong(0)
            val toks = r.getSeq[String](1)
            val n = toks.length
            val covered = new Array[Boolean](n)
            if (n >= 8 && !spans.isEmpty) {
              val sb = new java.lang.StringBuilder
              var i = 0
              while (i <= n - 8) {
                sb.setLength(0)
                var o = 0
                while (o < 8) {
                  if (o > 0) sb.append(' ')
                  sb.append(toks(i + o)); o += 1
                }
                if (spans.contains(sb.toString)) {
                  var c = i
                  while (c < i + 8) { covered(c) = true; c += 1 }
                }
                i += 1
              }
            }
            var masked = 0
            val out = new java.lang.StringBuilder
            var j = 0
            while (j < n) {
              if (covered(j)) masked += 1
              else {
                if (out.length > 0) out.append(' ')
                out.append(toks(j))
              }
              j += 1
            }
            // round(x, 6) replicated digit-for-digit (the entropy
            // kernel rationale): BigDecimal.valueOf = shortest repr,
            // HALF_UP — identical to Spark's Round on a double
            val ratio =
              if (n == 0) java.lang.Double.valueOf(Double.NaN) // 0/0
              else java.lang.Double.valueOf(java.math.BigDecimal
                .valueOf(masked.toDouble / n.toDouble)
                .setScale(6, java.math.RoundingMode.HALF_UP)
                .doubleValue)
            org.apache.spark.sql.Row(id, n, masked, ratio, out.toString)
          }
        }(enc)
    } else {
      val spans = sh8
        .groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 3)
        .select(col("span"))
        .localCheckpoint()
      val hitDocs = sh8.join(spans, Seq("span"), "left_semi")
        .select(col("doc_id")).distinct()
      val gramAt = (i: org.apache.spark.sql.Column) =>
        concat_ws(" ", (0 until 8).map(o =>
          element_at(col("toks"), i + lit(o))): _*)
      val posGrams = docs.join(hitDocs, Seq("doc_id"), "left_semi")
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("toks")) - lit(7)),
            i => struct(i.as("i"), gramAt(i).as("g")))).as("x"))
        .select(col("doc_id"), col("x.i").as("i"), col("x.g").as("g"))
      val cov = posGrams.join(spans, posGrams("g") === spans("span"))
        .select(col("doc_id"), explode(sequence(col("i"), col("i") + 7))
          .as("cp"))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_set(col("cp"))).as("cps"))
      docs.join(cov, Seq("doc_id"), "left")
        .withColumn("cps",
          coalesce(col("cps"), array().cast("array<int>")))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          size(col("cps")).as("n_masked"),
          round(size(col("cps")).cast("double")
            / size(col("toks")).cast("double"), 6).as("masked_ratio"),
          array_join(transform(
            filter(sequence(lit(1), size(col("toks"))),
              i => !array_contains(col("cps"), i)),
            i => element_at(col("toks"), i)), " ").as("scrubbed_text"))
    }
  }

  /** Per-doc token Shannon entropy — the diversity/degenerate-text
    * signal a quality filter thresholds alongside repetition ratios
    * (low entropy = keyboard-mash or looped boilerplate). Written as
    * H = ln(n) − (Σ tf·ln tf)/n so the per-type term needs no per-doc
    * total: tf·ln(tf) terms are 9dp-rounded then summed as exact
    * decimals (the unigram-logprob discipline) — accumulation-order-
    * independent, cross-engine exact, and both aggregations ((doc,
    * token) counts, then per-doc) are map-side combinable with no
    * window anywhere. Linear in corpus tokens. */
  def entropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Kernel plan (r17): a doc's entropy needs only the doc's OWN type
    // counts, so the per-doc tf's fold in a mapPartitions kernel over
    // the landed toks table — NO shuffle at any corpus size (the r16
    // form aggregated the doctf table: a corpus-sized (doc, type)-row
    // exchange for per-doc state that never needed to leave its row;
    // an expression-HOF run-length draft measured 66s at sf3 — the
    // nested array lambdas re-evaluate their inputs per reference —
    // so this is the codec/argmin kernel seam instead, ~0.5s).
    // Exactness: per-type nanos replicate the round(tf·ln tf, 9) →
    // decimal(18,9) Column chain digit-for-digit — Spark's Round on a
    // double is BigDecimal.valueOf(d).setScale(9, HALF_UP) (shortest
    // decimal repr, same as here), and a 9dp decimal ≤ 17 significant
    // digits round-trips the double exactly, so movePointRight(9) is
    // the identical integer grid; longs sum exact and order-free
    // (≡ the decimal sum). The long accumulator bounds the doc at
    // n·ln(n) ≤ 9.2e9 ≈ a 4e8-token single document — far past any
    // real document. tf values repeat heavily, so nanos are memoized
    // per partition. The nano-sum → double step is ONE correctly-
    // rounded conversion (BigDecimal.valueOf(s9, 9).doubleValue — the
    // oracle's decimal(18,9)→double cast exactly), not long→double
    // then /1e9, whose first rounding already loses bits past 2⁵³
    // nanos (~an n·ln(tf) mass of a 0.5–1M-token doc) and could then
    // flip round(…,6) on a half-way boundary.
    import s.implicits._
    Tables.spreadScan(s, DocArtifacts.toksDir(dir),
        DocArtifacts.toks(s, dir).select(col("doc_id"), col("toks")))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val nanosOf = new java.util.HashMap[Int, java.lang.Long]
        def nanos(tf: Int): Long = {
          val hit = nanosOf.get(tf)
          if (hit != null) hit.longValue
          else {
            val v = java.math.BigDecimal
              .valueOf(tf.toDouble * math.log(tf.toDouble))
              .setScale(9, java.math.RoundingMode.HALF_UP)
              .movePointRight(9).longValueExact()
            nanosOf.put(tf, v)
            v
          }
        }
        it.flatMap { case (id, toks) =>
          if (toks.isEmpty) None
          else {
            val m = new java.util.HashMap[String, Int](toks.length * 2)
            toks.foreach(t => m.merge(t, 1, Integer.sum _))
            var s9 = 0L
            val vs = m.values.iterator()
            while (vs.hasNext) s9 += nanos(vs.next())
            Some((id, toks.length.toLong, m.size.toLong,
              java.math.BigDecimal.valueOf(s9, 9).doubleValue))
          }
        }
      }
      .toDF("doc_id", "n_toks", "n_distinct", "__s_tlnt")
      .select(col("doc_id"), col("n_toks"), col("n_distinct"),
        round(log(col("n_toks").cast("double"))
          - col("__s_tlnt") / col("n_toks").cast("double"), 6)
          .as("entropy_nats"))
  }

  /** Per-doc novelty in corpus order — the fraction of a document's
    * word-3-gram shingles whose FIRST corpus appearance (lowest doc_id)
    * is this document: the dedup-aware "effective new data" measure
    * behind epoch/repeat-budget decisions (the later copy of duplicated
    * text scores ~0, the first copy ~1). Both the first-seen aggregate
    * and the join back shuffle on the shingle key, so the exchange is
    * reused; per-shingle state is one min — linear in corpus tokens,
    * never doc×doc. Reads the LANDED exploded shingle table
    * (DocArtifacts — one corpus tokenize amortized across all shingle
    * consumers) instead of re-deriving it. */
  def novelty(s: SparkSession, dir: String): DataFrame = {
    // ONE shingle-keyed exchange: the per-shingle first-seen doc is a
    // window min over the shingle partition — the r16 groupBy + join
    // back paid the same exchange plus a sort-merge of both branches.
    // The partition key is (xxhash64(shingle), shingle): the 8-byte
    // hash prefix resolves nearly every sort comparison before the
    // ~25-byte string is touched, while the string in the key keeps
    // the result EXACT at any scale — a 64-bit first-seen key alone
    // is birthday-bounded at n²/2·2⁻⁶⁴ (≈2.7×10⁻⁴ already at 10⁸
    // distinct shingles, and ≫1 at a 100 TB corpus's ~10¹¹), so
    // hash-only identity is not a scale-safe discipline for this op.
    // Window partitioned by the (hash, shingle) pair: group
    // cardinality IS the distinct-shingle count — massively parallel,
    // never single-task.
    val sh = DocArtifacts.shingles3(s, dir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"),
        col("shingle"))
    val w = Window.partitionBy(col("h"), col("shingle"))
    sh.withColumn("first_doc", min(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double")
          / col("n_shingles").cast("double"), 6).as("novelty"))
  }

  /** Vocabulary coverage curve — tokens covered by the top-k most
    * frequent types for a ladder of candidate vocabulary budgets: the
    * tokenizer-design artifact (what fraction of the corpus a k-entry
    * vocab explains before falling back to bytes/UNK). Type counts are
    * one combinable aggregate; the frequency ranking is the two-pass
    * bucket plan (Ranking — no single-task global window at any vocab
    * size); the budget ladder is a bounded explode and the totals ride
    * a one-row broadcast. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val ks = Seq(10, 25, 50, 100)
    // vocabulary totals off the landed (source, tok, n) table
    val counts = DocArtifacts.srctf(s, dir)
      .groupBy(col("tok")).agg(sum(col("n")).as("n"))
    // vocab grows sublinearly in docs, so the doc count over-provisions
    // the bucket domain — harmless (empty buckets cost nothing)
    val nb = graft.operators.Ranking.bucketsFor(
      graft.Tables.rowCount(s, dir, "documents"), 32)
    val bucketed = graft.operators.Ranking.withValueBucket(
      counts, -col("n"), "bkt", nb)
    val ranked = graft.operators.Ranking.bucketedRowNumber(
      bucketed, Nil, "bkt", nb, Seq(col("n").desc, col("tok")), "rk")
    val tot = counts.agg(sum(col("n")).as("total_tokens"))
    ranked.crossJoin(broadcast(tot))
      .select(explode(array(ks.map(lit): _*)).as("k"),
        col("rk"), col("n"), col("total_tokens"))
      .filter(col("rk") <= col("k"))
      .groupBy(col("k"), col("total_tokens"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("n")).as("covered_tokens"))
      .select(col("k"), col("n_types"), col("covered_tokens"),
        round(col("covered_tokens").cast("double")
          / col("total_tokens").cast("double"), 6).as("coverage"))
      .orderBy(col("k"))
  }

  /** Readability scoring — the grade-level gate a kid-safe / plain-
    * language corpus filter thresholds on: Flesch-Kincaid grade and
    * Flesch reading-ease from exact integer counts (whitespace words,
    * [.!?]+ terminator runs as sentences, vowel-group runs as the
    * standard syllable approximation). The two formulas are the only
    * float steps — identical literal chains in both engines; empty or
    * sentence-less docs yield NULL scores, not a divide-by-zero.
    * Pure codegen projection: no shuffle at any corpus size. */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    // collapse each vowel run to one '~', count the survivors: exact
    // integer syllable proxy, same regex semantics in Java and RE2
    val collapsed = regexp_replace(lower(t), "[aeiouy]+", "~")
    val nSyll = (length(collapsed)
      - length(regexp_replace(collapsed, "~", ""))).cast("long")
    val nWords = size(tokens(t)).cast("long")
    val nSent = size(regexp_extract_all(t, lit("[\\.!\\?]+"), lit(0)))
      .cast("long")
    val wps = nWords.cast("double") /
      nullif(nSent, lit(0L)).cast("double")
    val spw = nSyll.cast("double") /
      nullif(nWords, lit(0L)).cast("double")
    Tables.documents(s, dir).select(col("doc_id"),
      nWords.as("n_words"), nSent.as("n_sentences"),
      nSyll.as("n_syllables"),
      (round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)
        + lit(0.0)).as("fk_grade"),
      (round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)
        + lit(0.0)).as("flesch_ease"))
  }

  /** Code-vs-prose gate — the router that keeps source files out of a
    * prose corpus (or routes them INTO a code corpus): exact counts of
    * code-shaped characters (braces/brackets, semicolons), indented
    * lines ((?m)-anchored, same RE2/Java semantics) and total lines,
    * with an integer-exact verdict — code iff braces+semicolons clear
    * 1-per-50-chars or ≥¼ of lines are indented. No float thresholds
    * anywhere; one codegen projection, no shuffle. */
  def codeDetect(s: SparkSession, dir: String): DataFrame =
    codeDetectOf(Tables.documents(s, dir))

  /** The synthetic corpus is all prose — the spec injects a code doc
    * through this seam to prove both verdicts fire. */
  private[graft] def codeDetectOf(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nBraces = size(regexp_extract_all(t,
      lit("[\\{\\}\\[\\]\\(\\)]"), lit(0))).cast("long")
    val nSemis = size(regexp_extract_all(t, lit("[;=]"), lit(0)))
      .cast("long")
    val nIndent = size(regexp_extract_all(t,
      lit("(?m)^(  |\\t)"), lit(0))).cast("long")
    val nLines = (size(regexp_extract_all(t, lit("\n"), lit(0)))
      + lit(1)).cast("long")
    docs.select(col("doc_id"),
      nBraces.as("n_braces"), nSemis.as("n_semis"),
      nIndent.as("n_indent_lines"), nLines.as("n_lines"),
      ((nBraces + nSemis) * lit(50L) >= length(t).cast("long") ||
        nIndent * lit(4L) >= nLines).as("is_code"))
  }

  /** First-iteration BPE merge statistics — the pair-count table a
    * byte-pair-encoding tokenizer trainer starts from: adjacent
    * character pairs WITHIN words, weighted by word frequency, top-50
    * merge candidates (count DESC, pair ASC — deterministic). The
    * token-vocabulary aggregate collapses the corpus before any pair
    * explode (pairs ride the vocab, ≪ corpus tokens), then one bounded
    * top-k. All counts integer-exact. */
  def bpeMergeCandidates(s: SparkSession, dir: String): DataFrame = {
    val vocab = DocArtifacts.doctf(s, dir)
      .filter(length(col("tok")) >= 2)
      .groupBy(col("tok")).agg(sum(col("tf")).as("n"))
    vocab
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"), col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_bpe_merge_candidates" -> (bpeMergeCandidates _),
    "txt_readability" -> (readability _),
    "txt_code_detect" -> (codeDetect _),
    "txt_vocab_coverage" -> (vocabCoverage _),
    "txt_novelty" -> (novelty _),
    "txt_entropy" -> (entropy _),
    "txt_boilerplate_ngrams" -> (boilerplateNgrams _),
    "txt_boilerplate_scrub" -> (boilerplateScrub _),
    "txt_zipf_fit" -> (zipfFit _),
    "txt_hapax_ratio" -> (hapaxRatio _),
    "txt_redact" -> (redact _),
    "txt_ccnet_bucket" -> (ccnetBucket _),
    "txt_repetition" -> (repetition _),
    "txt_length_histogram" -> (lengthHistogram _),
    "txt_token_count" -> (tokenCount _),
    "txt_quality_score" -> (qualityScore _),
    "txt_lang_id" -> (langId _),
    "txt_langid_eval" -> (langidEval _),
    "txt_fingerprint" -> (fingerprint _),
    "txt_unigram_logprob" -> (unigramLogprob _),
    "txt_bigram_logprob" -> (bigramLogprob _),
    "txt_chunk" -> (chunk _),
    "txt_pack" -> (pack _),
    "txt_ngram_stats" -> (ngramStats _),
    "txt_tfidf_topk" -> (tfidfTopk _))

  val oracles: Map[String, String] = Map(
    // the 64-bit wrapping polynomial hash re-derived per codepoint in
    // HUGEINT arithmetic mod 2^64 (ASCII corpus: codepoint == UTF-8
    // byte), then mapped to the signed BIGINT Spark emits
    "txt_fingerprint" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(range(1, length(text) + 1),
        |        i -> CAST(unicode(substr(text, i, 1)) AS HUGEINT))),
        |      (acc, c) -> (acc * 1000003 + c) %
        |        CAST('18446744073709551616' AS HUGEINT)) AS hf,
        |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(range(1, length(substr(text, 1, 64)) + 1),
        |        i -> CAST(unicode(substr(substr(text, 1, 64), i, 1))
        |          AS HUGEINT))),
        |      (acc, c) -> (acc * 1000003 + c) %
        |        CAST('18446744073709551616' AS HUGEINT)) AS hp
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN hf >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN hf - CAST('18446744073709551616' AS HUGEINT)
        |    ELSE hf END AS BIGINT) AS fingerprint,
        |  CAST(CASE WHEN hp >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN hp - CAST('18446744073709551616' AS HUGEINT)
        |    ELSE hp END AS BIGINT) AS prefix_fingerprint
        |FROM h""".stripMargin,
    // vocab-weighted within-word pair counts; integer-exact, ties on
    // the pair string
    "txt_bpe_merge_candidates" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |v AS (
        |  SELECT tok, COUNT(*) AS n FROM toks
        |  WHERE length(tok) >= 2 GROUP BY tok),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(tok)),
        |    i -> substr(tok, CAST(i AS INT), 2))) AS pair, n
        |  FROM v)
        |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
        |FROM p GROUP BY pair
        |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin,
    // identical integer counts; the FK/ease formulas are the only float
    // steps and share literal-for-literal operand order
    "txt_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_words,
        |    CAST(len(regexp_extract_all(text, '[\.!\?]+')) AS BIGINT)
        |      AS n_sentences,
        |    CAST(length(regexp_replace(lower(text), '[aeiouy]+', '~', 'g'))
        |      - length(replace(regexp_replace(lower(text), '[aeiouy]+',
        |          '~', 'g'), '~', '')) AS BIGINT) AS n_syllables
        |  FROM documents),
        |r AS (SELECT *,
        |  CAST(n_words AS DOUBLE)
        |    / CAST(NULLIF(n_sentences, 0) AS DOUBLE) AS wps,
        |  CAST(n_syllables AS DOUBLE)
        |    / CAST(NULLIF(n_words, 0) AS DOUBLE) AS spw
        |  FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  ROUND(0.39 * wps + 11.8 * spw - 15.59, 6) + 0.0 AS fk_grade,
        |  ROUND(206.835 - 1.015 * wps - 84.6 * spw, 6) + 0.0
        |    AS flesch_ease
        |FROM r""".stripMargin,
    // pure integer counts and integer-threshold verdict
    "txt_code_detect" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[\{\}\[\]\(\)]')) AS BIGINT)
        |    AS n_braces,
        |  CAST(len(regexp_extract_all(text, '[;=]')) AS BIGINT) AS n_semis,
        |  CAST(len(regexp_extract_all(text, '(?m)^(  |\t)')) AS BIGINT)
        |    AS n_indent_lines,
        |  CAST(len(regexp_extract_all(text, chr(10))) + 1 AS BIGINT)
        |    AS n_lines,
        |  (len(regexp_extract_all(text, '[\{\}\[\]\(\)]'))
        |      + len(regexp_extract_all(text, '[;=]'))) * 50
        |    >= length(text)
        |  OR len(regexp_extract_all(text, '(?m)^(  |\t)')) * 4
        |    >= len(regexp_extract_all(text, chr(10))) + 1 AS is_code
        |FROM documents""".stripMargin,
    "txt_vocab_coverage" ->
      """WITH c AS (
        |  SELECT tok, COUNT(*) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |    FROM documents) GROUP BY tok),
        |r AS (SELECT tok, n,
        |    row_number() OVER (ORDER BY n DESC, tok) AS rk FROM c),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM c),
        |kk AS (SELECT UNNEST([10, 25, 50, 100]) AS k)
        |SELECT k, COUNT(*) AS n_types,
        |  CAST(SUM(n) AS BIGINT) AS covered_tokens,
        |  ROUND(CAST(SUM(n) AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
        |    AS coverage
        |FROM kk JOIN r ON r.rk <= kk.k CROSS JOIN tot
        |GROUP BY k, total_tokens ORDER BY k""".stripMargin,
    "txt_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, UNNEST(list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END)) AS shingle
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM t GROUP BY shingle)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  COUNT(CASE WHEN first_doc = doc_id THEN 1 END) AS n_novel,
        |  ROUND(CAST(COUNT(CASE WHEN first_doc = doc_id THEN 1 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
        |FROM t JOIN f USING (shingle)
        |GROUP BY doc_id""".stripMargin,
    // same conditional-prob ratio term-for-term: c(w1 w2)/c(w1 ·),
    // 6dp-rounded log terms, exact decimal sum, 4dp mean
    "txt_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, UNNEST(CASE WHEN len(w) >= 2
        |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |      ELSE [] END) AS bigram
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (SELECT bigram, COUNT(*) AS n FROM t GROUP BY bigram),
        |p AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(n) AS np
        |      FROM b GROUP BY 1),
        |term AS (SELECT bigram,
        |    CAST(ROUND(ln(CAST(n AS DOUBLE) / CAST(np AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM b JOIN p ON split_part(b.bigram, ' ', 1) = p.w1),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(lp) * 1000000 AS BIGINT) AS s6
        |  FROM t JOIN term USING (bigram)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  CAST(CASE WHEN s6 >= 0
        |    THEN (s6 + n_bigrams*50) // (n_bigrams*100)
        |    ELSE -((-s6 + n_bigrams*50) // (n_bigrams*100)) END AS DOUBLE)
        |    / 10000.0 AS mean_logprob
        |FROM agg""".stripMargin,
    // H = ln(n) - (sum tf*ln(tf))/n, 9dp-rounded decimal-summed terms
    "txt_entropy" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_toks,
        |    COUNT(*) AS n_distinct,
        |    CAST(SUM(CAST(ROUND(CAST(tf AS DOUBLE)
        |      * ln(CAST(tf AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE)
        |      AS s_tlnt
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_toks, n_distinct,
        |  ROUND(ln(CAST(n_toks AS DOUBLE))
        |    - s_tlnt / CAST(n_toks AS DOUBLE), 6) AS entropy_nats
        |FROM agg""".stripMargin,
    "txt_boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 8
        |      THEN list_transform(range(1, len(w) - 6),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |          || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' '
        |          || w[i+6] || ' ' || w[i+7])
        |      ELSE [] END) AS spans
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents))
        |SELECT span, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
        |FROM (SELECT doc_id, unnest(spans) AS span FROM t)
        |GROUP BY span HAVING COUNT(*) >= 3""".stripMargin,
    // identical TopK tie-break, 9dp-rounded ln terms summed as exact
    // decimals, fit arithmetic term for term
    "txt_zipf_fit" ->
      """WITH c AS (
        |  SELECT tok, COUNT(*) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |    FROM documents) GROUP BY tok),
        |top AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 100),
        |r AS (SELECT n,
        |    row_number() OVER (ORDER BY n DESC, tok) AS rank FROM top),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS mcnt,
        |    CAST(SUM(CAST(ROUND(ln(rank), 9) AS DECIMAL(18,9)))
        |      AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ROUND(ln(n), 9) AS DECIMAL(18,9)))
        |      AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(ROUND(ln(rank) * ln(n), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(ROUND(ln(rank) * ln(rank), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) AS sxx
        |  FROM r)
        |SELECT mcnt AS n_points,
        |  ROUND((CAST(mcnt AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(mcnt AS DOUBLE) * sxx - sx * sx), 6) AS slope,
        |  ROUND((sy - (CAST(mcnt AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(mcnt AS DOUBLE) * sxx - sx * sx) * sx)
        |    / CAST(mcnt AS DOUBLE), 6) AS intercept
        |FROM t""".stripMargin,
    "txt_hapax_ratio" ->
      """WITH t AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
        |    AS type_token_ratio
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // the boilerplate CTE (distinct spans per doc, >=3-doc floor), then
    // POSITIONAL grams hit-test, covered positions explode x8, and the
    // doc reassembles from the surviving token indices
    "txt_boilerplate_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 8
        |      THEN list_transform(range(1, len(w) - 6),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |          || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' '
        |          || w[i+6] || ' ' || w[i+7])
        |      ELSE [] END) AS spans
        |  FROM d),
        |b AS (
        |  SELECT span FROM (SELECT doc_id, unnest(spans) AS span FROM t)
        |  GROUP BY span HAVING COUNT(*) >= 3),
        |pos AS (
        |  SELECT doc_id, u.i AS i, u.g AS g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
        |      i -> {'i': i, 'g': w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |        || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]
        |        || ' ' || w[i+6] || ' ' || w[i+7]})) AS u
        |    FROM d WHERE len(w) >= 8)),
        |hit AS (SELECT p.doc_id, p.i FROM pos p JOIN b ON p.g = b.span),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS cp FROM hit),
        |covs AS (
        |  SELECT doc_id, list_sort(array_agg(cp)) AS cps
        |  FROM cov GROUP BY doc_id),
        |o AS (
        |  SELECT d.doc_id, len(w) AS n_tokens,
        |    COALESCE(cps, []) AS cps, w
        |  FROM d LEFT JOIN covs USING (doc_id))
        |SELECT doc_id, n_tokens, len(cps) AS n_masked,
        |  ROUND(CAST(len(cps) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS masked_ratio,
        |  COALESCE(array_to_string(list_transform(
        |    list_filter(range(1, n_tokens + 1),
        |      i -> NOT list_contains(cps, i)),
        |    i -> w[i]), ' '), '') AS scrubbed_text
        |FROM o""".stripMargin,
    // same scored CTE as txt_unigram_logprob (decimal-summed, exact);
    // DuckDB's ntile is the ANSI tiling ntileFromRank reproduces
    "txt_ccnet_bucket" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS tok
        |  FROM documents),
        |freqs AS (SELECT tok, COUNT(*) AS tok_n FROM toks GROUP BY tok),
        |tot AS (SELECT COUNT(*) AS corpus_n FROM toks),
        |scored AS (
        |  SELECT doc_id, ROUND(CAST(SUM(CAST(ROUND(ln(CAST(tok_n AS DOUBLE)
        |      / CAST(corpus_n AS DOUBLE)), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS mean_logprob
        |  FROM toks JOIN freqs USING (tok), tot
        |  GROUP BY doc_id),
        |lbl AS (
        |  SELECT s.doc_id, d.lang, s.mean_logprob,
        |    ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.mean_logprob DESC, s.doc_id) AS t
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, mean_logprob,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
        |    AS bucket
        |FROM lbl""".stripMargin,
    "txt_redact" ->
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT)
        |    AS n_redactions,
        |  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
        |    AS INT) AS n_digit_chars
        |FROM events""".stripMargin,
    "txt_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, w,
        |    CASE WHEN len(w) >= 2
        |      THEN list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i + 1])
        |      ELSE CAST([] AS VARCHAR[]) END AS bg
        |  FROM t)
        |SELECT doc_id,
        |  len(w) AS n_toks,
        |  len(list_distinct(w)) AS n_distinct_toks,
        |  ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
        |    / NULLIF(CAST(len(w) AS DOUBLE), 0), 6) AS dup_tok_ratio,
        |  len(bg) AS n_bigrams,
        |  len(list_distinct(bg)) AS n_distinct_bigrams,
        |  ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
        |    / NULLIF(CAST(len(bg) AS DOUBLE), 0), 6) AS dup_bigram_ratio
        |FROM b""".stripMargin,
    "txt_length_histogram" ->
      """WITH t AS (
        |  SELECT source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
        |  FROM documents)
        |SELECT source, length(bin(n_toks)) AS bucket,
        |  COUNT(*) AS n_docs, MIN(n_toks) AS min_toks,
        |  MAX(n_toks) AS max_toks,
        |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks
        |FROM t GROUP BY source, bucket
        |ORDER BY source, bucket""".stripMargin,
    "txt_token_count" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
        |  length(text) AS n_chars_calc
        |FROM documents""".stripMargin,
    "txt_quality_score" ->
      """SELECT doc_id, length(text) AS len_chars,
        |  ROUND(CAST(len(regexp_extract_all(text, '[\.,!\?;:]')) AS DOUBLE)
        |    / NULLIF(CAST(length(text) AS DOUBLE), 0), 6) AS punct_ratio,
        |  ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |    / NULLIF(CAST(length(text) AS DOUBLE), 0), 6) AS digit_ratio,
        |  ROUND(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / NULLIF(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 0), 6)
        |    AS stopword_ratio,
        |  ROUND((CAST(length(text) AS DOUBLE)
        |      - CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
        |      + 1.0)
        |    / NULLIF(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 0), 6)
        |    AS mean_word_len
        |FROM documents""".stripMargin,
    "txt_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['der','und','nicht','merge','sort','hash','batch'], x))) AS s_de,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','join','query','fast','table'], x))) AS s_en,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['el','la','que','scan','filter','row','column'], x))) AS s_es,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['le','les','une','group','window','stream','value'], x))) AS s_fr,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['data','key','line','part','small','slow','customer'], x))) AS s_zh
        |  FROM documents)
        |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE
        |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |FROM scored""".stripMargin,
    // same scoring and cascading-argmax rule as txt_lang_id, joined to
    // the label column and row-normalized
    "txt_langid_eval" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['der','und','nicht','merge','sort','hash','batch'], x))) AS s_de,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','join','query','fast','table'], x))) AS s_en,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['el','la','que','scan','filter','row','column'], x))) AS s_es,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['le','les','une','group','window','stream','value'], x))) AS s_fr,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> list_contains(['data','key','line','part','small','slow','customer'], x))) AS s_zh
        |  FROM documents),
        |pred AS (
        |  SELECT lang AS label_lang, CASE
        |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |  FROM scored),
        |cells AS (
        |  SELECT label_lang, pred_lang, COUNT(*) AS n_docs
        |  FROM pred GROUP BY 1, 2),
        |totals AS (
        |  SELECT label_lang, SUM(n_docs) AS n_label FROM cells GROUP BY 1)
        |SELECT label_lang, pred_lang, n_docs,
        |  ROUND(CAST(n_docs AS DOUBLE) / CAST(n_label AS DOUBLE), 6)
        |    AS share
        |FROM cells JOIN totals USING (label_lang)
        |ORDER BY label_lang, pred_lang""".stripMargin,
    "txt_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, w, unnest(range(1, len(w) + 1, 24)) AS start
        |  FROM t WHERE len(w) >= 1)
        |SELECT doc_id,
        |  CAST((start - 1) // 24 AS INT) AS chunk_idx,
        |  array_to_string(w[start : start + 31], ' ') AS chunk_text,
        |  len(w[start : start + 31]) AS n_chunk_tokens
        |FROM st""".stripMargin,
    "txt_pack" ->
      """WITH t AS (
        |  SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(range(0, (n - 1) // 24 + 1)) AS chunk_idx, n
        |  FROM t WHERE n >= 1),
        |sized AS (
        |  SELECT doc_id, chunk_idx, least(32, n - 24 * chunk_idx) AS tok,
        |    md5('pack:' || CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(chunk_idx AS VARCHAR)) AS hk
        |  FROM c),
        |ordered AS (
        |  SELECT doc_id, chunk_idx, tok,
        |    CAST(COALESCE(SUM(tok) OVER (ORDER BY hk, doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM sized),
        |seg AS (
        |  SELECT doc_id, chunk_idx, tok, cb,
        |    unnest(range(cb // 256, (cb + tok - 1) // 256 + 1)) AS seq_id
        |  FROM ordered)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(greatest(cb, seq_id * 256) - seq_id * 256 AS INT)
        |    AS offset_in_seq,
        |  CAST(least(cb + tok, (seq_id + 1) * 256)
        |    - greatest(cb, seq_id * 256) AS INT) AS seg_tokens,
        |  (cb // 256) <> ((cb + tok - 1) // 256) AS is_split
        |FROM seg""".stripMargin,
    // integer half-up mean (the mean4FromMicros contract): s6 is the
    // exact micro-scaled decimal sum; the 4dp mean is rounded in BIGINT
    // arithmetic, never on a double quotient (boundary-exact — see
    // mean4FromMicros scaladoc)
    "txt_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |freqs AS (SELECT tok, COUNT(*) AS tok_n FROM toks GROUP BY tok),
        |tot AS (SELECT COUNT(*) AS corpus_n FROM toks),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_toks,
        |    CAST(SUM(CAST(ROUND(ln(CAST(tok_n AS DOUBLE)
        |        / CAST(corpus_n AS DOUBLE)), 6) AS DECIMAL(18,6)))
        |      * 1000000 AS BIGINT) AS s6
        |  FROM toks JOIN freqs USING (tok), tot
        |  GROUP BY doc_id)
        |SELECT doc_id, n_toks,
        |  CAST(CASE WHEN s6 >= 0 THEN (s6 + n_toks*50) // (n_toks*100)
        |    ELSE -((-s6 + n_toks*50) // (n_toks*100)) END AS DOUBLE)
        |    / 10000.0 AS mean_logprob
        |FROM agg""".stripMargin,
    "txt_tfidf_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf,
        |    ROUND(CAST(t.tf AS DOUBLE)
        |      * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
        |  FROM tf t JOIN df USING (term), n),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, tfidf, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "txt_ngram_stats" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i + 1])) AS bigram
        |  FROM toks WHERE len(w) >= 2)
        |SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 50""".stripMargin)
}
