package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.TextFns._
import graft.functions.VectorFns

/** Deduplication block (SURVEY §2D) — exact and near-dup detection over
  * `documents` / `embeddings`, built for 100 TB corpora: every candidate
  * generator is bucket-local (hash group, LSH band, SimHash chunk, label
  * block), so pair comparison is O(n · bucket_width), never O(n²)
  * (SURVEY §4).
  *
  * Shape discipline: tokens → shingles → shingle-hashes are materialized
  * once per doc as named columns (compute-once barriers, see TextFns),
  * the derived signature table is persisted before its self-join (at
  * 100 TB: a checkpointed signature table), and pair generation carries
  * only ids + join keys — the heavy array columns are re-attached to the
  * few surviving candidates afterwards.
  *
  * Cache contract: the persisted signature tables live until the caller
  * releases them — after materializing a result, call
  * `spark.catalog.clearCache()` (as Verify/Bench do).
  */
object Dedup {

  /** (doc_id, shingles) with the tokenize/shingle work done exactly once. */
  /** Attach each side's shingle(-hash) array to an id-pair table. */
  private def attach(pairs: DataFrame, base: DataFrame, c: String): DataFrame =
    pairs
      .join(base.select(col("doc_id").as("doc_a"), col(c).as("sh_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col(c).as("sh_b")), "doc_b")

  /** (doc_id, hs): distinct 3-gram shingle hashes via the native
    * ShingleHash64 pass — no intermediate shingle strings. Jaccard over
    * hash sets equals string Jaccard (the hash is injective in practice),
    * so sketch verification stays exact. */
  private def hashShingled(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        graft.functions.ShingleHash64.shingleHash64(col("toks"), 3).as("hs"))
      .filter(size(col("hs")) > 0)

  /** Corpus-level similarity between SOURCES via mergeable MinHash
    * sketches: the per-permutation minimum is associative, so the
    * source-level signature is just k `min()` aggregates over per-doc
    * signatures — map-side combinable, one shuffle of (sources × k)
    * values no matter how many documents flow in. The pairwise matching
    * fraction of two source signatures estimates the Jaccard similarity
    * of the sources' full shingle-set UNIONS without ever materializing
    * them (estimate ±1/√k) — how a 100 TB pipeline compares crawls or
    * snapshots. The per-doc signature table LANDS to parquet, so the
    * oracle re-derives the per-source minima, the pairwise agreement
    * counts and the estimates in DuckDB — only the multiply-shift
    * minhash stays Spark-side; the spec additionally bounds the
    * estimate's error vs the exact union Jaccard. */
  /** Landing dir for the per-doc source-sketch table — the simhashFpDir
    * contract: computable from `dir` alone. */
  private[graft] def srcSimDir(dir: String): String =
    graft.Tables.landingDir("srcsim", dir)

  def sourceSimilarity(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    // NOTE (r18, measured): reading the LANDED doctoks table here
    // instead of re-tokenizing text was tried and is SLOWER locally
    // (0.76s → 1.07s isolated at sf0.1, twice) — the array<string>
    // parquet decode of token arrays costs more than the regex
    // tokenize over 1-string rows at bench scale; kept on raw text.
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("source"),
        graft.functions.ShingleHash64.shingleHash64(col("toks"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", graft.functions.SketchExprs.minhashSig(col("hs"), k))
      .select(col("source"), col("sig"))
      .write.mode("overwrite").parquet(srcSimDir(dir))
    val sigs = s.read.parquet(srcSimDir(dir))
      .groupBy(col("source"))
      .agg(min(element_at(col("sig"), 1)).as("m0"),
        (1 until k).map(i =>
          min(element_at(col("sig"), i + 1)).as(s"m$i")): _*)
      .select(col("source"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    val a = sigs.select(col("source").as("source_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("source").as("source_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        round(aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k.toDouble), 6)
          .as("est_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** EXACT cross-source shingle-overlap matrix — the ground truth that
    * `sourceSimilarity`'s MinHash sketches approximate: for every source
    * pair, the number of distinct word-3-gram shingles both vocabularies
    * share, each side's vocabulary size, and the overlap coefficient
    * |A∩B| / min(|A|,|B|) — the crawl-comparison / provenance-audit
    * report in exact form.
    *
    * Scale shape: NEVER a shingle-table self-join. The per-shingle
    * source set is bounded by the SOURCE REGISTRY (≤ tens), so each
    * shingle contributes its ≤C(|sources|,2) pairs via a bounded
    * in-row explode, and the pair counts are one fully combinable
    * aggregate onto the bounded pair space — linear in corpus tokens
    * at any scale. Vocabulary totals ride a broadcast. Reads the LANDED
    * exploded shingle table (DocArtifacts) — the op itself is the
    * source-vocabulary distinct plus the bounded pair aggregate. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // BITMASK plan (r16): the source registry is bounded (≤ tens, the
    // Scale-shape contract this op already leaned on for its bounded
    // pair space), so the per-shingle source SET is one LONG — groupBy
    // the 8-byte shingle hash, bit_or the source bits (idempotent
    // under the landed table's (shingle, source) duplicates, map-side
    // combinable to ≤ distinct-shingle rows per partition), then ONE
    // global aggregate sums every single-source bit and every pair's
    // bit-conjunction: |src| + C(|src|,2) counting columns, bounded by
    // the registry, no array state, no explode, no second pass. The
    // r15 collect_set form paid the set-merge machinery twice (once
    // per consumer) and measured ~6.5s at sf3; the mask plan carries
    // the same ONE corpus-sized exchange and a 1-row result. The
    // report assembles driver-side from that row (the percentilesCore
    // discipline: bounded-by-configuration tables ride the driver).
    // The shuffle keys on xxhash64 of the shingle (the bigram-logprob
    // discipline): the output only COUNTS distinct shingles, so 8-byte
    // keys replace ~25-byte 3-gram strings in the exchange, and a
    // 64-bit collision (≲10⁻⁷ even at 10⁸ distinct shingles) merges
    // one count; the DuckDB oracle still counts the raw strings from
    // the same landed table. Past 32 sources the wide aggregate's
    // column count grows quadratically — the set-based plan (one
    // exchange, explode after the agg) takes over; same answer.
    val sh = DocArtifacts.shingles3(s, dir)
      .select(col("source"), xxhash64(col("shingle")).as("h"))
    // UTF-8 BYTE order, not Scala's UTF-16 code-unit `.sorted`: the
    // >32-source fallback orients (src_a, src_b) pairs with Spark's
    // array_sort (UTF8String binary order), and for source names with
    // supplementary characters the two orders differ — both regimes
    // must orient pairs identically
    val utf8Order: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // source registry from the DOCUMENTS scan, not a corpus-shingle
    // distinct (guide §2.3 — scan fewer bytes for the same decision):
    // the registry probe only needs the source vocabulary, and the
    // documents table is orders of magnitude smaller than the exploded
    // shingle landing. A source whose docs yield zero shingles gets a
    // bit no mask ever sets — nOf stays 0, no pair passes shared>0 —
    // so the output is unchanged; sources ⊇ shingle-sources keeps the
    // ≤32 regime check conservative.
    val srcs: Seq[String] = Tables.documents(s, dir)
      .select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted(utf8Order).toSeq
    if (srcs.size <= 32 && srcs.nonEmpty) sourceOverlapMask(s, sh, srcs)
    else sourceOverlapSets(sh)
  }

  /** Distinct-mask cap for the driver-side pair fold: 2^|src| ≤ 2^32 in
    * principle, but real corpora produce few distinct source SETS; past
    * the cap the wide in-Spark aggregate takes over (same answer). */
  private val maskCountCap = 262144

  /** The ≤32-source bitmask plan (spec'd equivalent to
    * [[sourceOverlapSets]] on the same input). */
  private[graft] def sourceOverlapMask(s: SparkSession, sh: DataFrame,
      srcs: Seq[String]): DataFrame = {
    val bitOf = typedLit(srcs.zipWithIndex
      .map { case (src, i) => src -> (1L << i) }.toMap)
    // two combinable aggregates: per-shingle mask, then per-MASK
    // counts — the distinct-mask table is tiny (source SETS, not
    // shingles) and the singles/pairs fold over it on the driver. The
    // first cut ran |src| + C(|src|,2) sum-aggregate COLUMNS in Spark;
    // the 210-column codegen compile alone was ~1.4s of per-call
    // constant at sf0.1.
    val maskCounts = sh
      .select(col("h"), element_at(bitOf, col("source")).as("bit"))
      .groupBy(col("h"))
      .agg(bit_or(col("bit")).as("mask"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("cnt"))
      .limit(maskCountCap + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    if (maskCounts.length > maskCountCap)
      // pathological set diversity: fall back to the in-Spark plan
      return sourceOverlapSets(sh)
    val k = srcs.size
    val nOf = new Array[Long](k)
    val shared = Array.ofDim[Long](k, k)
    maskCounts.foreach { case (mask, cnt) =>
      var i = 0
      while (i < k) {
        if ((mask & (1L << i)) != 0L) {
          nOf(i) += cnt
          var j = i + 1
          while (j < k) {
            if ((mask & (1L << j)) != 0L) shared(i)(j) += cnt
            j += 1
          }
        }
        i += 1
      }
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val out = for {
      i <- 0 until k; j <- (i + 1) until k if shared(i)(j) > 0
    } yield
      // java BigDecimal.valueOf (string-canonical), not Scala's
      // exact-binary BigDecimal(double): Spark's Round expression
      // rounds via valueOf, and the oracle hash-compares against
      // exactly that rendering
      Row(srcs(i), srcs(j), shared(i)(j), nOf(i), nOf(j),
        java.math.BigDecimal
          .valueOf(shared(i)(j).toDouble / math.min(nOf(i), nOf(j)))
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .doubleValue)
    val schema = StructType(Seq(
      StructField("src_a", StringType), StructField("src_b", StringType),
      StructField("n_shared", LongType), StructField("n_a", LongType),
      StructField("n_b", LongType),
      StructField("overlap_coef", DoubleType)))
    s.createDataFrame(java.util.Arrays.asList(out: _*), schema)
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The general set-based plan — one exchange, explode after the agg;
    * takes over past 32 sources where the mask plan's wide aggregate
    * would grow quadratically in columns. */
  private[graft] def sourceOverlapSets(sh: DataFrame): DataFrame = {
    {
      val sets = sh.groupBy(col("h"))
        .agg(array_sort(collect_set(col("source"))).as("srcs"))
      val tot = sets
        .select(explode(col("srcs")).as("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val pairs = sets
        .filter(size(col("srcs")) >= 2)
        .select(posexplode(col("srcs")).as(Seq("i", "src_a")), col("srcs"))
        .select(col("src_a"), explode(
          slice(col("srcs"), col("i") + lit(2), size(col("srcs"))))
          .as("src_b"))
      pairs.groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(tot.select(col("source").as("src_a"),
          col("n").as("n_a"))), "src_a")
        .join(broadcast(tot.select(col("source").as("src_b"),
          col("n").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          col("n_a"), col("n_b"),
          round(col("n_shared").cast("double")
            / least(col("n_a"), col("n_b")).cast("double"), 6)
            .as("overlap_coef"))
        .orderBy(col("src_a"), col("src_b"))
    }
  }

  /** Exact dedup: group by full-content hash, keep the smallest id as the
    * canonical copy. One map-side-combinable shuffle over the LANDED
    * per-doc hash column (DocArtifacts stats — the md5 pass is paid once
    * per corpus, not per consumer); the oracle recomputes the hash from
    * the raw text, so the landing is verified, not trusted. */
  def exact(s: SparkSession, dir: String): DataFrame = {
    DocArtifacts.stats(s, dir)
      .groupBy(col("h").as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Exact dedup over NORMALIZED text — case-folded, trimmed, runs of
    * whitespace collapsed — catching re-encodes and re-wraps that byte
    * hashing misses (the standard first pass before any fuzzy dedup).
    * Same one-shuffle shape as `exact`, over the SAME landed hash pair
    * (the r14 form re-paid the regex-normalize + two md5 corpus passes
    * this op's 6.6× sf3 ratio was made of); reports how many normalized
    * groups collapse more docs than their raw-byte groups did. */
  def exactNormalized(s: SparkSession, dir: String): DataFrame = {
    DocArtifacts.stats(s, dir)
      .groupBy(col("norm_h").as("norm_hash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("h")).as("n_byte_variants"))
  }

  /** Word-3-gram Jaccard near-dup pairs, candidates restricted to docs
    * sharing their minimum shingle hash (1-band MinHash): the bucket join
    * replaces the quadratic cross product; each surviving pair gets the
    * exact Jaccard verification. Reads the LANDED tuning-candidate table
    * (`ensureTuningLanded`) — the identical storm-safe `saltedBandPairs`
    * pair set with exact |A∩B| / |A∪B| already landed for the tuning
    * trio and `containment`, so the shingle → pair pipeline never
    * re-runs here. The keep test is integer-exact (2·inter ≥ uni ⇔ raw
    * J ≥ 0.5 — equivalent to the former raw-double threshold, with no
    * float at the boundary at all); the rounded score is output-only.
    * `cluster` / `cluster_stats` inherit the reuse. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    ensureTuningLanded(s, dir)
    s.read.parquet(tuningCandDir(dir))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("uni").cast("double"), 6)
          .as("jaccard"))
  }

  /** Containment near-dup pairs — the asymmetric overlap score
    * C(A,B) = |A∩B| / |A| that catches SUBSET duplicates (a snippet
    * quoted whole inside a longer page) which symmetric Jaccard dilutes
    * below threshold. Reads the LANDED tuning-candidate table
    * (`ensureTuningLanded`): the same storm-safe min-shingle-bucket
    * pairs with exact |A∩B| and per-side shingle counts already landed
    * for the tuning trio, so the corpus-sized shingle → pair pipeline
    * is never re-run here (previously this op re-derived + re-persisted
    * the identical pair set — the largest avoidable cost in the r8
    * bench). No size-ratio prefilter applies (it would prune exactly
    * the asymmetric pairs this op exists for — and the landed table
    * never had one); the keep test is integer-exact
    * (5·|A∩B| ≥ 4·min(|A|,|B|), i.e. max-containment ≥ 0.8) so both
    * engines agree bit-for-bit at the boundary. */
  def containment(s: SparkSession, dir: String): DataFrame = {
    ensureTuningLanded(s, dir)
    s.read.parquet(tuningCandDir(dir))
      .filter(col("inter") * 5 >= least(col("sz_a"), col("sz_b")) * 4)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double")
          / col("sz_a").cast("double"), 6).as("containment_a"),
        round(col("inter").cast("double")
          / col("sz_b").cast("double"), 6).as("containment_b"))
  }

  /** Jaccard-threshold sweep — the dedup-aggressiveness tuning artifact:
    * over the SAME storm-safe min-shingle-bucket candidates as
    * `ngramJaccard`, how many near-dup pairs and how many dropped docs
    * (keep-lowest convention: the higher id of each pair) each
    * candidate threshold in {0.5 … 0.9} would produce. The keep test is
    * integer-exact (10·|A∩B| ≥ t·|A∪B|, t ∈ 5..9 scaled by 10), so both
    * engines agree bit-for-bit at every boundary. One candidate pass,
    * bounded threshold explode, one combinable aggregate — the sweep
    * costs one extra aggregate over the pair table, not five reruns. */
  /** Landing dir for the tuning suite's shared candidate table — the
    * simhashFpDir contract: computable from `dir` alone. */
  private[graft] def tuningCandDir(dir: String): String =
    graft.Tables.landingDir("tuning_cand", dir)

  /** Land-once memo for the tuning suite's shared candidate stage (the
    * ensureKmeansLanded discipline): `thresholdSweep`, `bandTuning` and
    * `minhashCalibration` all aggregate over the SAME storm-safe
    * min-md5-shingle bucket pairs, so the shingle→pair pipeline runs
    * ONCE per (session, dir) and lands (doc_a, doc_b, inter, uni,
    * n_agree) to parquet — each tuning op then reads the landed table
    * instead of re-executing the corpus-sized tokenize + pair join
    * (previously 3× the full pipeline, the top of the r7 bench). The
    * k = 32 signature table also lands here (mhCalibDir) so the
    * calibration oracle can re-derive agreement counts in DuckDB.
    * Landing (not caching) is deliberate: Verify/Bench clearCache()
    * between ops, which would void a cached memo. */
  private val tuningLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook: force the next tuning op to re-run the landing pipeline
    * (StressSpec times the full shingle→pair stage, not the memo hit). */
  private[graft] def clearTuningMemo(): Unit = tuningLanded.clear()
  private[graft] def ensureTuningLanded(s: SparkSession, dir: String): Unit = {
    graft.Tables.landOnce(tuningLanded,
      (System.identityHashCode(s.sparkContext), dir,
        // content-keyed (count:bytes:mtime:listing-hash): a regenerated
        // documents table re-lands instead of serving stale artifacts
        graft.Tables.fingerprint(s, dir, "documents"))) {
        val k = 32
        // token arrays come from the landed doc-artifact table (ONE
        // corpus tokenize for all consumers); spread: the shingle/sig/
        // bucket work below is per-doc CPU and a small landing is one
        // parquet split (Tables.spread scaladoc).
        // The localCheckpoint after the shingle projection is a
        // COLLAPSE BARRIER, not just reuse: without it CollapseProject
        // inlines the shingle expression into every downstream
        // reference (the filter, the bucket transform, both attach
        // sides) and the landing re-derives it per reference — measured
        // 9.1s → 1.1s for this stage at sf0.1 (the corpus_contamination
        // discipline).
        val shingledDocs = Tables.spreadScan(s,
            DocArtifacts.toksDir(dir), DocArtifacts.toks(s, dir))
          .select(col("doc_id"),
            wordShingles(col("toks"), 3).as("shingles"),
            graft.functions.ShingleHash64.shingleHash64(col("toks"), 3)
              .as("hs"))
          .localCheckpoint()
        val base = shingledDocs
          .filter(size(col("shingles")) > 0)
          .withColumn("sig",
            graft.functions.SketchExprs.minhashSig(col("hs"), k))
          .withColumn("bucket",
            // digest-direct min-md5 (HashExprs): one hex encode per doc
            // instead of one 32-char string per shingle
            graft.functions.HashExprs.minMd5Hex(col("shingles")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val banded = base.select(col("doc_id"), lit(0).as("band_id"),
          col("bucket").as("band_hash"))
        val cands = saltedBandPairs(banded, target = 64)
          .join(base.select(col("doc_id").as("doc_a"),
            col("shingles").as("sh_a"), col("sig").as("sig_a")), "doc_a")
          .join(base.select(col("doc_id").as("doc_b"),
            col("shingles").as("sh_b"), col("sig").as("sig_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            size(col("sh_a")).as("sz_a"), size(col("sh_b")).as("sz_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
            aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, v) => acc + v).cast("long").as("n_agree"))
          // shingle arrays are per-doc DISTINCT (wordShingles), so
          // |A∪B| = |A| + |B| − |A∩B| exactly — arithmetic instead of
          // the per-PAIR array_distinct(concat(...)) hash-set build
          // over sz_a+sz_b strings (guide §2.3: shuffle/compute fewer
          // bytes; pair count ≫ doc count). Derived in a second
          // projection so `inter` is computed once.
          .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
        // both writes hang off the persisted base (block-level locking
        // dedupes its first materialization): concurrent actions, the
        // DocArtifacts discipline
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.sequence(Seq(
          Future(base.select(col("doc_id"), col("sig"))
            .write.mode("overwrite").parquet(mhCalibDir(dir))),
          Future(cands
            .write.mode("overwrite").parquet(tuningCandDir(dir))))),
          scala.concurrent.duration.Duration.Inf)
        base.unpersist()
        ()
      }
  }

  /** Shared candidate stage for the tuning suite: the storm-safe
    * min-md5-shingle bucket pairs with exact intersection/union sizes —
    * the (doc_a, doc_b, inter, uni) table `thresholdSweep` and
    * `bandTuning` both aggregate over, read from the landed parquet
    * (`ensureTuningLanded` computes it once per session+dir). */
  private def sizedCandidates(s: SparkSession, dir: String): DataFrame = {
    ensureTuningLanded(s, dir)
    s.read.parquet(tuningCandDir(dir))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  def thresholdSweep(s: SparkSession, dir: String): DataFrame = {
    sizedCandidates(s, dir)
      .select(col("doc_b"), col("inter"), col("uni"),
        explode(array((5 to 9).map(lit): _*)).as("t10"))
      .filter(col("inter") * 10 >= col("t10") * col("uni"))
      .groupBy((col("t10") * 10).as("threshold_pct"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_docs_dropped"))
      .orderBy(col("threshold_pct"))
  }

  /** LSH band-geometry tuning table — the S-curve analysis run before
    * anyone picks `minhashLsh`'s (bands, rows-per-band) split: for each
    * way of spending the k = 32 signature budget, the expected detection
    * probability 1−(1−j^r)^b evaluated against the corpus's OWN observed
    * candidate-pair similarity distribution (the storm-safe min-shingle
    * buckets), plus the config's threshold s* = (1/b)^(1/r). The output
    * answers "which split catches ≥ X% of OUR near-dups", not the
    * textbook curve at hypothetical similarities.
    *
    * Determinism discipline: every power is a power of two, so j^r and
    * (1−j^r)^b are explicit IEEE multiply chains (j2 = j·j, q2 = q·q, …)
    * and s* is a sqrt chain — each step exactly rounded, bit-identical
    * in any IEEE engine, where a libm `pow` would not be. Per-pair
    * probabilities are quantized to integer micro-units BEFORE the
    * cross-partition sum (the decimal-first discipline for a quantity
    * that has no decimal form). One candidate pass, ×4 config explode,
    * one combinable aggregate. */
  def bandTuning(s: SparkSession, dir: String): DataFrame = {
    val cfg = Seq((32, 1), (16, 2), (8, 4), (4, 8))
    sizedCandidates(s, dir)
      .withColumn("j", col("inter").cast("double") / col("uni").cast("double"))
      .select(col("inter"), col("uni"), col("j"),
        explode(array(cfg.map { case (b, r) =>
          struct(lit(b).as("b"), lit(r).as("r")) }: _*)).as("c"))
      .select(col("inter"), col("uni"), col("j"),
        col("c.b").as("bands"), col("c.r").as("rows_per_band"))
      .withColumn("j2", col("j") * col("j"))
      .withColumn("j4", col("j2") * col("j2"))
      .withColumn("j8", col("j4") * col("j4"))
      .withColumn("jr",
        when(col("rows_per_band") === 1, col("j"))
          .when(col("rows_per_band") === 2, col("j2"))
          .when(col("rows_per_band") === 4, col("j4"))
          .otherwise(col("j8")))
      .withColumn("q", lit(1.0) - col("jr"))
      .withColumn("q2", col("q") * col("q"))
      .withColumn("q4", col("q2") * col("q2"))
      .withColumn("q8", col("q4") * col("q4"))
      .withColumn("q16", col("q8") * col("q8"))
      .withColumn("q32", col("q16") * col("q16"))
      .withColumn("prob", lit(1.0) -
        when(col("bands") === 4, col("q4"))
          .when(col("bands") === 8, col("q8"))
          .when(col("bands") === 16, col("q16"))
          .otherwise(col("q32")))
      .withColumn("p_u", round(col("prob") * lit(1e6)).cast("long"))
      .withColumn("near", col("inter") * 2 >= col("uni"))
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("n_cand"),
        count(when(col("near"), 1)).as("n_near"),
        sum(when(col("near"), col("p_u")).otherwise(lit(0L))).as("pu_near"))
      .withColumn("s_star", round(
        when(col("rows_per_band") === 1, lit(1.0) / col("bands"))
          .when(col("rows_per_band") === 2, sqrt(lit(1.0) / col("bands")))
          .when(col("rows_per_band") === 4,
            sqrt(sqrt(lit(1.0) / col("bands"))))
          .otherwise(sqrt(sqrt(sqrt(lit(1.0) / col("bands"))))), 6))
      .withColumn("exp_caught_near",
        round(col("pu_near").cast("double") / lit(1e6), 6))
      .withColumn("exp_recall_near",
        when(col("n_near") > 0,
          round(col("pu_near").cast("double") / lit(1e6)
            / col("n_near").cast("double"), 6)))
      .select(col("bands"), col("rows_per_band"), col("s_star"),
        col("n_cand"), col("n_near"), col("exp_caught_near"),
        col("exp_recall_near"))
      .orderBy(col("rows_per_band"))
  }

  /** Landing dir for the calibration signatures — the simhashFpDir
    * contract: computable from `dir` alone so the static oracle SQL can
    * read the run's signatures. */
  private[graft] def mhCalibDir(dir: String): String =
    graft.Tables.landingDir("mhcalib", dir)

  /** MinHash calibration — estimated vs exact Jaccard, pair by pair: for
    * every storm-safe min-shingle-bucket candidate, the k = 32 signature
    * agreement fraction next to the exact shingle Jaccard and their
    * absolute gap. This is the report that justifies (or kills) trusting
    * `minhashLsh`'s sketch verification at a given k — the observed
    * error column IS the ±1/√k theory check, per pair, on real data.
    *
    * The signature table lands to parquet, so the oracle re-derives
    * everything downstream of signature generation brute-force in DuckDB
    * (agreement count, exact Jaccard, gap) — fully hash-checked; only
    * the multiply-shift hash itself stays Spark-side (the simhash
    * contract). est = n_agree/32 and the gap are IEEE-exact (power-of-
    * two divide, exact subtract), so no float indeterminism. */
  def minhashCalibration(s: SparkSession, dir: String): DataFrame = {
    ensureTuningLanded(s, dir)
    s.read.parquet(tuningCandDir(dir))
      .withColumn("est", col("n_agree").cast("double") / lit(32.0))
      .withColumn("j",
        col("inter").cast("double") / col("uni").cast("double"))
      .select(col("doc_a"), col("doc_b"), col("n_agree"),
        round(col("est"), 6).as("est_jaccard"),
        round(col("j"), 6).as("jaccard"),
        round(abs(col("est") - col("j")), 6).as("abs_err"))
  }

  /** Exact-Jaccard verification of candidate pairs carrying DISTINCT
    * hash/shingle arrays as sh_a/sh_b: size-ratio prefilter, then the
    * threshold filter and the rounded output share ONE array_intersect
    * — |A∪B| = |A|+|B|−|A∩B| for distinct arrays, so the union is
    * arithmetic and the old form's array_union per pair (built a
    * second per-pair hash set in both the filter AND the projection)
    * disappears; codegen subexpression elimination computes the
    * remaining intersect once per operator. inter and uni are the
    * same integers as before, so the divide and round are
    * bit-identical to the oracle's. */
  private def verifiedJaccard(cands: DataFrame, keyA: String,
      keyB: String): DataFrame = {
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      .cast("double")
    val rawj = inter /
      ((size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter)
    cands
      .filter(size(col("sh_a")) <= size(col("sh_b")) * 2 &&
        size(col("sh_b")) <= size(col("sh_a")) * 2)
      .filter(rawj >= 0.5)
      .select(col(keyA), col(keyB), round(rawj, 6).as("jaccard"))
  }

  /** Candidate id-pairs from an exploded (doc_id, band_id, band_hash)
    * table, with heavy-hitter bucket salting. A plain band self-join
    * sends a whole (band_id, band_hash) bucket to ONE join group: a
    * duplicate-storm bucket of width w costs w² comparisons in a single
    * task. Here a bucket of width w splits into g = ceil(w/target) salt
    * groups: side A takes ONE salt by doc-id hash, side B replicates
    * across all g, so every a<b pair still appears exactly once
    * (unchanged recall) while no join group carries more than ~target
    * A-rows — the storm bucket becomes g parallel groups of ≤ target·w
    * comparisons. Narrow buckets (w ≤ target, the common case) get
    * g = 1: zero replication, the exact pre-salt plan. Only STORM
    * buckets (w > target) carry a non-trivial g, so the width join is
    * a broadcast of the storms alone under the saltedProbePairs
    * two-regime discipline (persisted, COUNTED under a bounded probe;
    * past [[stormBroadcastCap]] both sides take the shuffle width-join
    * — safe at any storm count). The r16 form joined the full
    * corpus-sized width table into both sides: two extra data-sized
    * exchanges per pair stage. */
  private[graft] def saltedBandPairs(banded: DataFrame,
      target: Int): DataFrame = {
    val storms = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") > target)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fits = storms.limit(stormBroadcastCap.toInt + 1).count() <=
      stormBroadcastCap
    val side = if (fits) broadcast(storms) else storms
    val g = coalesce(ceil(col("__w") / lit(target)).cast("int"), lit(1))
    val a = banded.join(side, Seq("band_id", "band_hash"), "left")
      .select(col("band_id"), col("band_hash"),
        pmod(xxhash64(col("doc_id")), g.cast("long")).cast("int")
          .as("__salt"),
        col("doc_id").as("doc_a"))
    val b = banded.join(side, Seq("band_id", "band_hash"), "left")
      .select(col("band_id"), col("band_hash"),
        explode(sequence(lit(0), g - 1)).as("__salt"),
        col("doc_id").as("doc_b"))
    a.join(b, Seq("band_id", "band_hash", "__salt"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Landing dir for the LSH band table — the simhashFpDir contract:
    * computable from `dir` alone so the static oracle SQL can read the
    * run's (doc_id, hs, bands) table. */
  private[graft] def mhLshDir(dir: String): String =
    graft.Tables.landingDir("mhlsh", dir)

  /** Land-once memo for the LSH (doc_id, hs, bands) table — the tuning
    * landing discipline: shingle-hash + k=32 signature generation is a
    * corpus-sized pass that every minhashLsh call re-paid in-query
    * before r14 (the bulk of its 7.5s at sf3, around a candidate+verify
    * stage that reads only the landed table). One landing per
    * (session, dir, corpus fingerprint); the bench times it as its own
    * landing_mhlsh line. */
  private val mhLshLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook (the clearTuningMemo discipline). */
  private[graft] def clearMhLshMemo(): Unit = mhLshLanded.clear()
  private[graft] def ensureMhLshLanded(s: SparkSession, dir: String): Unit = {
    val bands = 8
    val r = 4
    graft.Tables.landOnce(mhLshLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "documents"))) {
      hashShingled(s, dir)
        .withColumn("sig",
          graft.functions.SketchExprs.minhashSig(col("hs"), bands * r))
        .select(col("doc_id"), col("hs"),
          bandHashes(col("sig"), bands, r).as("bands"))
        .write.mode("overwrite").parquet(mhLshDir(dir))
    }
  }

  /** MinHash+LSH near-dup detection — the full scale path: one string-
    * hash pass, k=32 multiply-shift minima → 8 bands of 4 → salted
    * band-bucket join on ids only → exact-Jaccard verification of
    * survivors. The (doc_id, hs, bands) table LANDS to parquet (once —
    * [[ensureMhLshLanded]]) and the emitted pairs recompute from the
    * landed table, so the oracle re-derives band-bucket candidate
    * generation, the size-ratio prefilter and the exact-Jaccard
    * verification brute-force in DuckDB — only the multiply-shift
    * minhash + band hashing stay Spark-side (the simhash contract). */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    ensureMhLshLanded(s, dir)
    val base = s.read.parquet(mhLshDir(dir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val pairs = saltedBandPairs(banded, target = 64)
    verifiedJaccard(attach(pairs, base, "hs"), "doc_a", "doc_b")
  }

  /** Deterministic landing dir for the SimHash fingerprint table: the
    * oracle re-derives the pair list from these landed fingerprints by
    * brute force (DuckDB bit_count(xor) over all doc pairs), so the path
    * must be computable from `dir` alone — the oracle SQL is a static
    * string and cannot see the Spark application id. */
  private[graft] def simhashFpDir(dir: String): String =
    graft.Tables.landingDir("simhash_fp", dir)

  /** SimHash near-dup pairs: 64-bit majority fingerprint; pigeonhole over
    * 4×16-bit chunks guarantees every pair within Hamming ≤ 3 collides in
    * at least one chunk; true Hamming verified via bit_count(xor).
    *
    * The (doc_id, fp) table is landed to parquet so the oracle can verify
    * the pair list end-to-end: given the fingerprints, the output is the
    * deterministic set of all pairs at Hamming ≤ 3, which DuckDB recomputes
    * by brute force — checking both the pigeonhole candidate generation
    * (completeness) and the Hamming verification (precision). Only the
    * fingerprint function itself (a custom codegen Expression DuckDB
    * cannot run) stays Spark-side. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    // the LSH landing's (doc_id, hs) is EXACTLY hashShingled's output
    // (same tokenize, same shingleHash64, same non-empty filter), so
    // read it instead of re-paying the corpus tokenize + hash pass —
    // array<long> parquet decode is cheap (the array<string> caveat
    // from dedup_source_similarity does not apply to longs; measured)
    ensureMhLshLanded(s, dir)
    val base = s.read.parquet(mhLshDir(dir))
      .select(col("doc_id"),
        graft.functions.SketchExprs.simhash64(col("hs")).as("fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.write.mode("overwrite").parquet(simhashFpDir(dir))
    // the chunk pigeonhole is a band join like any other: route it
    // through the SAME salted candidate machinery as the MinHash bands
    // (chunk_id ≡ band_id, 16-bit chunk value ≡ band_hash) — a near-dup
    // storm sharing one chunk value would otherwise put w² comparisons
    // in a single join task. Salting preserves the pair set exactly
    // (every a<b pair appears once — saltedBandPairs' contract), so
    // recall and the landed-fingerprint oracle are untouched.
    val chunked = base.select(col("doc_id"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band_id", "band_hash")))
    saltedBandPairs(chunked, target = 64)
      .join(base.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")),
        "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= 3)
  }

  /** Near-dup cluster assignment: connected components over the verified
    * ngram-Jaccard pair graph via iterative min-label propagation
    * (hash-min CC): each round every node takes the min label among
    * itself and its neighbors — one equi-join + one groupBy-min per
    * round, converging in O(cluster diameter) rounds (near-dup clusters
    * are shallow). The driver loop only checks a convergence count; all
    * data work stays distributed, and labels are localCheckpoint'ed per
    * round so the iterative plan doesn't accrete lineage. cluster_id =
    * min doc_id of the component — canonical-copy selection for free. */
  def cluster(s: SparkSession, dir: String): DataFrame = {
    ensureCcFullLanded(s, dir)
    s.read.parquet(ccFullDir(dir))
  }

  /** Landing dir for the FULL-graph component labels — the
    * simhashFpDir contract: computable from `dir` alone. */
  private[graft] def ccFullDir(dir: String): String =
    graft.Tables.landingDir("ccfull", dir)

  /** Land-once memo for the FULL-graph component labels: `cluster` and
    * `clusterStats` both need the same hash-min fixpoint over the
    * verified ngram-Jaccard pair graph, and each re-ran the
    * O(diameter)-round propagation per query (≈2 full CC runs per
    * sweep). One landing; both read it. Distinct from [[ccLabelsDir]]:
    * the corpus-only labels are NOT the full labels restricted (batch
    * docs bridge corpus components), so both landings exist. The
    * oracle re-derives the fixpoint from raw text via a recursive CTE,
    * so the landing stays end-to-end checked. */
  private val ccFullLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook (the clearTuningMemo discipline). */
  private[graft] def clearCcFullMemo(): Unit = ccFullLanded.clear()
  private[graft] def ensureCcFullLanded(s: SparkSession,
      dir: String): Unit = {
    ensureTuningLanded(s, dir)
    graft.Tables.landOnce(ccFullLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "documents"))) {
      clusterOfPairs(
        s.read.parquet(tuningCandDir(dir))
          .filter(col("inter") * 2 >= col("uni"))
          .select(col("doc_a"), col("doc_b")))
        .write.mode("overwrite").parquet(ccFullDir(dir))
    }
  }

  /** Landing dir for the CORPUS-side component labels — the production
    * state a near-dup clustering pipeline maintains between runs (the
    * simhashFpDir contract: computable from `dir` alone). */
  private[graft] def ccLabelsDir(dir: String): String =
    graft.Tables.landingDir("cclabels", dir)

  /** Land-once memo for the corpus component labels: hash-min CC over
    * the CORPUS-ONLY near-dup pairs (both endpoints in the landed
    * corpus — the `incremental` pmod-5 day stand-in), landed so
    * [[clusterIncremental]] attaches each day's batch WITHOUT re-running
    * global label propagation. */
  private val ccLabelsLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook (the clearTuningMemo discipline). */
  private[graft] def clearCcLabelsMemo(): Unit = ccLabelsLanded.clear()
  private[graft] def ensureCcLabelsLanded(s: SparkSession,
      dir: String): Unit = {
    ensureTuningLanded(s, dir)
    graft.Tables.landOnce(ccLabelsLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "documents"))) {
      clusterOfPairs(
        s.read.parquet(tuningCandDir(dir))
          .filter(col("inter") * 2 >= col("uni"))
          .filter(pmod(col("doc_a"), lit(5)) =!= 0 &&
            pmod(col("doc_b"), lit(5)) =!= 0)
          .select(col("doc_a"), col("doc_b")))
        .write.mode("overwrite").parquet(ccLabelsDir(dir))
    }
  }

  /** Batch-vs-corpus incremental near-dup CLUSTERING — the third leg of
    * the incremental story (exact → near-dup pairs → components): each
    * batch document is attached to the LANDED corpus component labels
    * without re-running global label propagation. Corpus components are
    * already collapsed to their canonical label (min corpus doc_id —
    * [[ensureCcLabelsLanded]]), so the attach graph CONTRACTS every
    * corpus endpoint of a batch pair to its label supernode; hash-min
    * convergence then runs on that batch-sized graph only (batch docs +
    * touched supernodes — a batch bridging two corpus clusters merges
    * them here, exactly as full reachability would). Because a label IS
    * its component's minimum, the attach component's minimum equals the
    * full merged component's minimum doc_id: the emitted cluster_id is
    * identical to a from-scratch global clustering, at batch cost.
    * Output: one row per batch doc in the pair graph — its final
    * cluster_id and whether it joined an existing corpus cluster
    * (`joins_corpus`) or only a new batch-side cluster.
    *
    * Scale: the corpus-sized work (shingle pairs, corpus CC) is landed
    * state amortized across runs; the per-run cost is one filter over
    * the landed candidate table, two label equi-joins, and CC rounds
    * bounded by the BATCH graph's diameter. Oracle: DuckDB re-derives
    * the full pair graph from raw text and computes recursive-CTE
    * reachability — the strongest possible check that the incremental
    * composition equals global clustering. */
  def clusterIncremental(s: SparkSession, dir: String): DataFrame = {
    ensureTuningLanded(s, dir)
    ensureCcLabelsLanded(s, dir)
    // r19: the per-query cost here was never the attach GRAPH (batch-
    // sized by construction) but the fixpoint's per-round ACTIONS —
    // retired by clusterOfPairs' driver union-find regime (1.01 →
    // ~0.3s at sf0.1). A separate ccinc landing was tried and measured
    // WORSE on the bench total (op 1.01 → 0.15s but the landing cost
    // 1.5s: one consumer only pays the landing's extra write+read, and
    // the cclabels first-touch it absorbs was previously amortized in
    // the op's cold run) — so the attach stays per-query, where at
    // corpus scale it is the batch-sized work a production run pays
    // per batch anyway.
    def isBatch(c: org.apache.spark.sql.Column) = pmod(c, lit(5)) === 0
    val pairs = s.read.parquet(tuningCandDir(dir))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("doc_a"), col("doc_b"))
    val batchPairs = pairs
      .filter(isBatch(col("doc_a")) || isBatch(col("doc_b")))
    val labels = s.read.parquet(ccLabelsDir(dir))
    // contract corpus endpoints to their landed label; a corpus doc
    // absent from the corpus pair graph is its own singleton label
    val attach = batchPairs
      .join(labels.select(col("doc_id").as("__a"),
        col("cluster_id").as("__la")), col("doc_a") === col("__a"), "left")
      .join(labels.select(col("doc_id").as("__b"),
        col("cluster_id").as("__lb")), col("doc_b") === col("__b"), "left")
      .select(
        when(isBatch(col("doc_a")), col("doc_a"))
          .otherwise(coalesce(col("__la"), col("doc_a"))).as("doc_a"),
        when(isBatch(col("doc_b")), col("doc_b"))
          .otherwise(coalesce(col("__lb"), col("doc_b"))).as("doc_b"))
    // small-graph regime (the clusterOfPairs cap): the attach graph
    // collects in ONE job and components + joins_corpus both derive in
    // plain Scala — a distributed clusterOfPairs here would pay the
    // attach derivation twice (its own bounded probe, then the
    // hasCorpus/output plan) plus the fixpoint. Past the cap the
    // distributed path below runs unchanged.
    val probe = attach.limit(ccDriverEdgeCap + 1).collect()
    if (probe.length <= ccDriverEdgeCap) {
      val lbl = unionFindLabels(probe)
      // a component joins the corpus iff it holds a corpus supernode:
      // after contraction a corpus endpoint is its corpus LABEL — the
      // min corpus doc_id of its component, itself pmod-5 ≠ 0
      val hasCorpus = lbl.groupBy(_._2).map { case (root, ms) =>
        root -> ms.keysIterator.exists(_ % 5 != 0) }
      import s.implicits._
      lbl.iterator.filter(_._1 % 5 == 0)
        .map { case (d, root) => (d, root, hasCorpus(root)) }
        .toSeq.sortBy(_._1)
        .toDF("doc_id", "cluster_id", "joins_corpus")
    } else {
      val cc = clusterOfPairs(attach)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // a component joins the corpus iff it contains a corpus supernode
      val hasCorpus = cc.groupBy(col("cluster_id"))
        .agg(max(when(pmod(col("doc_id"), lit(5)) =!= 0, 1).otherwise(0))
          .as("__hc"))
      cc.filter(isBatch(col("doc_id")))
        .join(hasCorpus, "cluster_id")
        .select(col("doc_id"), col("cluster_id"),
          (col("__hc") === 1).as("joins_corpus"))
    }
  }

  /** Cluster-size histogram — the dedup-impact report published after a
    * clustering run: for each near-dup cluster size, how many clusters,
    * how many documents they hold, and how many would drop under the
    * keep-lowest-id convention — the number a curation team quotes as
    * "near-dup dedup removes X docs". Two combinable aggregates over
    * `dedup_cluster`'s labels (per-cluster count, then the bounded
    * size histogram); nothing new shuffles at corpus scale. */
  def clusterStats(s: SparkSession, dir: String): DataFrame =
    cluster(s, dir)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))
      .orderBy(col("cluster_size"))

  /** Driver-side CC bound: pair graphs at or under this many edges
    * collect (≤ ~100 MB of transient Rows) and label via union-find in
    * plain Scala; larger graphs take the distributed fixpoint. */
  private val ccDriverEdgeCap = 1 << 20

  /** Min-rooted union-find over collected (a, b) edge rows: returns
    * node → min(component) — exactly the hash-min fixpoint's converged
    * label (keeping the smaller root on every union preserves "root =
    * component minimum" inductively). Plain Scala, O(E·α). */
  private def unionFindLabels(
      edges: Array[org.apache.spark.sql.Row]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { row =>
      val a = row.getLong(0)
      val b = row.getLong(1)
      if (!parent.contains(a)) parent.update(a, a)
      if (!parent.contains(b)) parent.update(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
      }
    }
    parent.keysIterator.map(k => k -> find(k)).toMap
  }

  /** Connected components over an id-pair graph: driver union-find for
    * bounded graphs, hash-min label propagation past the cap (converges
    * in O(component diameter) rounds; a round is one equi-join + one
    * groupBy-min over the (small) label table). The distributed path
    * THROWS if the round cap is hit rather than silently returning
    * half-propagated labels — a pathological >200-diameter chain should
    * fail loudly, not corrupt the canonical-copy choice. cluster_id =
    * min doc_id of the component under BOTH regimes. (Package-visible
    * so stress specs can drive synthetic graphs.) */
  private[graft] def clusterOfPairs(pairs: DataFrame): DataFrame = {
    // SMALL-GRAPH regime (r19): the distributed fixpoint pays per ROUND
    // one join, one groupBy-min, one localCheckpoint and a convergence
    // count — O(diameter) jobs of pure per-job constants when the pair
    // graph is small (the bench-SF near-dup graphs are a few hundred
    // edges; cclabels/ccfull/attach landings each paid ~1s of rounds).
    // Under ccDriverEdgeCap collected edges, connected components run
    // on the driver via min-rooted union-find — IDENTICAL labels:
    // components are graph-theoretic, and keeping the smaller root on
    // every union makes each root the component minimum, exactly the
    // hash-min fixpoint's converged label. The probe is one bounded
    // collect (limit cap+1 — the groupedPercentiles histCap
    // discipline: bounded driver work, never data-sized); past the cap
    // the distributed fixpoint below runs unchanged, so a 100 TB pair
    // graph never lands on the driver. Node ids are LONG by the dedup
    // data model (doc_id); both paths return (doc_id, cluster_id) LONG.
    val probe = pairs.limit(ccDriverEdgeCap + 1).collect()
    if (probe.length <= ccDriverEdgeCap) {
      val spark = pairs.sparkSession
      import spark.implicits._
      return unionFindLabels(probe).toSeq.sortBy(_._1)
        .toDF("doc_id", "cluster_id")
    }
    clusterOfPairsDistributed(pairs)
  }

  /** The distributed hash-min fixpoint — the past-the-cap path of
    * [[clusterOfPairs]], package-visible so specs can pin both regimes
    * against each other on the same graph. */
  private[graft] def clusterOfPairsDistributed(
      pairs: DataFrame): DataFrame = {
    val maxRounds = 200
    val edges = pairs
      .union(pairs.select(pairs.columns.reverse.map(col): _*))
      .toDF("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin, col("node") === col("src"), "left")
        .select(col("node"), col("lbl"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl")))
            .as("new_lbl"))
        .localCheckpoint()
      changed = next.filter(col("new_lbl") =!= col("lbl")).count()
      labels = next.select(col("node"), col("new_lbl").as("lbl"))
      rounds += 1
    }
    edges.unpersist()
    require(changed == 0,
      s"hash-min did not converge within $maxRounds rounds — component " +
        "diameter exceeds the cap; raise it or pre-contract the graph")
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Embedding-space near-dup pairs, block-local: vectors are compared
    * only within their block (here the label column; in a 100 TB corpus,
    * the shard/source key), so cost is O(Σ block²) not O(n²).
    *
    * Scale posture: this is the EXACT pair listing — the correctness
    * baseline of the family, deliberately enumerating every qualifying
    * pair (its output is itself near-quadratic in block width: 327k
    * pairs from 20k vectors at sf1, where DuckDB pays the same
    * enumeration — 2.5× ratio). The loose 0.3 threshold is why no
    * sub-bucketing can be exact here (cos ≥ 0.3 spans ~72° — wider
    * than any useful LSH cell). The production paths at corpus scale
    * are [[semantic]] (SemDeDup against the derived-k quantizer,
    * high-threshold, linear) and Similarity.lshTopk's bucketing. */
  /** Enumerated-pair budget for the exact block-local baseline:
    * 4096·n — a LINEAR budget, so the near-quadratic Σ w·(w−1)/2
    * enumeration passes at the bundled SFs (sf1 enumerates ~20M of an
    * 82M budget, 30× ~180M of 246M) but FAILS LOUDLY roughly one
    * doubling past 30× instead of quietly dominating a large-scale
    * sweep (r12 measured 4.9× wall per 3× data here — by design, but a
    * baseline must not be runnable-by-accident at a scale where its
    * own output is the cost). Callers past the budget narrow the
    * blocks, raise the threshold, or move to the production paths
    * ([[semantic]], Similarity.lshTopk). */
  private[graft] def cosinePairBudget(n: Long): Long = 4096L * n

  /** The guard check, factored for the spec: total enumerated pairs
    * (Σ per-block w·(w−1)/2) against [[cosinePairBudget]]. */
  private[graft] def checkCosinePairBudget(n: Long, enumPairs: Long): Unit =
    require(enumPairs <= cosinePairBudget(n),
      s"dedup_embedding_cosine would enumerate $enumPairs block-local " +
        s"pairs against a ${cosinePairBudget(n)} budget (4096/vector): " +
        "the exact baseline is past its design scale — narrow the block " +
        "key, raise the threshold, or use dedup_semantic / ann_lsh_topk")

  def embeddingCosine(s: SparkSession, dir: String): DataFrame = {
    // pair-budget guard (EAGER: one cheap label-column aggregate runs at
    // construction — the documented exception to lazy-plan construction,
    // same contract note as Ranking.groupedPercentiles): the enumerated
    // pair count collapses to ONE driver row whatever the label
    // cardinality, so the guard is bounded at any scale
    val enumPairs = Tables.embeddings(s, dir)
      .groupBy(col("label")).agg(count(lit(1)).as("w"))
      .agg(coalesce(sum(col("w") * (col("w") - 1L) / lit(2L)), lit(0L))
        .cast("long").as("p"))
      .first().getLong(0)
    checkCosinePairBudget(Tables.rowCount(s, dir, "embeddings"), enumPairs)
    val base = Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"),
        VectorFns.asDouble(col("embedding")).as("vd"))
      .withColumn("nrm", sqrt(VectorFns.dotD(col("vd"), col("vd"))))
    // Tile the block-local pair join: a bare join on `label` caps
    // parallelism at the number of DISTINCT labels (profiled: 4 tasks,
    // 12.5s at sf1 over 10 labels) and, worse, puts one whole block's
    // pair enumeration in ONE task — the same single-bucket storm
    // ceiling the salted band joins solve for MinHash. Side A fans out
    // over T sub-tiles, side B hashes to one; the join key becomes
    // (label, tile), so each block's w² pair work spreads over T tasks
    // with each unordered pair met exactly once (A carries every tile,
    // B exactly one, and the vec_a < vec_b filter is tile-independent).
    // T derives from the corpus like the quantizer k (constant expected
    // per-tile width; T=1 at the bundled small sfs), so no block can
    // outgrow its task; the pair SET is T-independent either way.
    val tiles = math.max(1L, math.min(64L,
      Tables.rowCount(s, dir, "embeddings") / 4096L)).toInt
    val np = s.sparkContext.defaultParallelism
    val a = base.select(col("label"), col("vec_id").as("vec_a"),
        col("vd").as("vd_a"), col("nrm").as("nrm_a"))
      .withColumn("tile",
        explode(array((0 until tiles).map(lit(_)): _*)))
      // EXPLICIT exchange: AQE sizes partitions from MAP-side bytes and
      // cannot see the join's pair expansion, so it would coalesce the
      // small shuffled input right back onto a handful of tasks
      // (measured: 4 tasks with or without the tile key). A
      // user-specified repartition is exempt from AQE coalescing and
      // pins the pair work across the cores.
      .repartition(np, col("label"), col("tile"))
    val b = base.select(col("label"), col("vec_id").as("vec_b"),
        col("vd").as("vd_b"), col("nrm").as("nrm_b"))
      .withColumn("tile",
        pmod(xxhash64(col("vec_b")), lit(tiles.toLong)).cast("int"))
      .repartition(np, col("label"), col("tile"))
    a.join(b, Seq("label", "tile")).filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(VectorFns.cosineWithNorms(col("vd_a"), col("vd_b"),
          col("nrm_a"), col("nrm_b")), 6).as("cosine"))
      .filter(col("cosine") >= 0.3)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with the TRAINED k-means quantizer
    * (`Similarity.kmeans`'s landed centroids), then hunt near-dup pairs
    * only WITHIN a cluster — the published answer to "embedding cosine
    * dedup without O(n²)". A vector is dropped when a lower-id member of
    * its own cluster sits above the cosine threshold; output is one row
    * per dropped vector with its canonical keeper (the lowest such
    * partner), the max offending cosine and the partner count.
    *
    * Scale shape: assignment reads the landed kmeans_assign table (the
    * one O(n·k) broadcast scan is paid in the landing, shared with the
    * whole quantizer family) joined back to the vectors linearly —
    * and pair generation shuffles on the cluster key, so cost is
    * O(Σ cluster²). k comes from the landed quantizer, which derives it
    * from the corpus (Similarity.quantizerK: n/256, SemDeDup's n/k ≈
    * constant cluster-size discipline) — so the expected cluster width,
    * and with it the per-cluster pair cost, is scale-invariant. The oracle re-derives
    * assignment AND pairs brute-force in DuckDB from the landed centroid
    * parquet (`__SFDIR__` contract), so the whole decision is
    * hash-checked, not merely spec-checked. */
  def semantic(s: SparkSession, dir: String): DataFrame = {
    Similarity.ensureKmeansLanded(s, dir) // lands centroids + assignment
    // cluster per vector from the LANDED kmeans_assign table (one
    // linear equi-join of two n-row tables) — the O(n·k) broadcast scan
    // is paid once in the landing, and the landed min_by values are
    // exactly what the oracle's brute-force re-derivation produces
    val assigned = Tables.embeddings(s, dir)
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("vd"))
      .join(s.read.parquet(Similarity.kmeansAssignDir(dir))
        .select(col("vec_id"), col("cluster")), "vec_id")
      .withColumn("nrm", sqrt(VectorFns.dotD(col("vd"), col("vd"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
      col("vd").as("vd_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
      col("vd").as("vd_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cluster")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        round(VectorFns.cosineWithNorms(col("vd_a"), col("vd_b"),
          col("nrm_a"), col("nrm_b")), 6))
      .filter(col("cosine") >= 0.35)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("cluster")).as("cluster"),
        min(col("vec_a")).as("dup_of"),
        max(col("cosine")).as("max_cosine"),
        count(lit(1)).as("n_partners"))
  }

  /** Batch-vs-corpus incremental dedup — the production shape: a new
    * day's documents deduped against the LANDED corpus's hash index
    * (exact + normalized), not merely within-batch. Each batch doc gets
    * a status (`dup_exact` / `dup_norm` / `new`) and the canonical
    * corpus doc it collided with. Both legs are linear hash equi-joins
    * against map-side-combinable min() indexes — at 100 TB the index is
    * a landed table keyed by hash, and the day's batch joins against it
    * without ever rescanning the corpus text. */
  private[graft] def incrementalOf(corpus: DataFrame,
      batch: DataFrame): DataFrame = {
    def hashed(df: DataFrame): DataFrame =
      if (df.columns.contains("h"))
        df.select(col("doc_id"), col("h").as("raw_hash"),
          col("norm_h").as("norm_hash"))
      else {
        val norm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
        df.select(col("doc_id"), md5(col("text")).as("raw_hash"),
          md5(norm).as("norm_hash"))
      }
    val idx = hashed(corpus)
    val rawIdx = idx.groupBy(col("raw_hash"))
      .agg(min(col("doc_id")).as("raw_match"))
    val normIdx = idx.groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("norm_match"))
    hashed(batch)
      .join(rawIdx, Seq("raw_hash"), "left")
      .join(normIdx, Seq("norm_hash"), "left")
      .select(col("doc_id"),
        when(col("raw_match").isNotNull, "dup_exact")
          .when(col("norm_match").isNotNull, "dup_norm")
          .otherwise("new").as("status"),
        coalesce(col("raw_match"), col("norm_match"))
          .as("matched_corpus_id"))
  }

  /** The operator entry: landed corpus = doc_id % 5 != 0 (the prior
    * days), incoming batch = doc_id % 5 == 0 (today) — a deterministic
    * stand-in for the date column a real landing carries. */
  def incremental(s: SparkSession, dir: String): DataFrame = {
    // the landed hash pair serves both sides (incrementalOf recognizes
    // the stats schema) — no text rescan per leg
    val docs = DocArtifacts.stats(s, dir)
    incrementalOf(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0))
  }

  /** Two-sided salted index probe: `batch` rows joined against a landed
    * `corpus` band index (both as (band_id, band_hash, doc_id)) without
    * ever letting one storm bucket collapse into a single join group. A
    * corpus bucket of width w splits into g = ceil(w/target) salt
    * groups — the corpus side takes ONE salt by doc-id hash, the batch
    * side replicates across all g — so each (band, hash, salt) group
    * holds ~target corpus rows and every (batch, corpus) candidate
    * appears exactly once. The inner join on the width table also DROPS
    * batch bands absent from the index: exactly the no-candidate case.
    * Returns distinct (doc_batch, doc_corpus). */
  /** Storm-table broadcast bound: ≤ this many storm buckets broadcast
    * (≤ ~2.4 MB of (int, long, long) rows); past it the width join
    * falls back to the shuffle plan. Storm count is DATA-dependent
    * (bounded only by corpus_rows/target — a heavy-duplication corpus
    * can make most buckets storms), so the regime is decided by a
    * COUNTED probe of the storm aggregate, never assumed. */
  private[graft] val stormBroadcastCap = 100000L

  private[graft] def saltedProbePairs(corpus: DataFrame, batch: DataFrame,
      target: Int): DataFrame = {
    // only STORM buckets (width > target) need salting, and storms are
    // rare by design — so the width table joins in as a BROADCAST of
    // the storms alone (left join, absent → one salt group) instead of
    // shuffling both sides against the full corpus-sized bucket-width
    // table (the r15 form paid two width shuffles before the probe
    // join). The two-regime discipline: the storm table is persisted
    // and counted under a bounded probe (limit cap+1, never a full
    // count of an unbounded table) — within the cap it broadcasts,
    // past it (the heavy-duplication corpus where "rare by design"
    // fails) both sides take the shuffle width-join, which is safe at
    // any storm count.
    val storms = corpus.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") > target)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fits = storms.limit(stormBroadcastCap.toInt + 1).count() <=
      stormBroadcastCap
    val side = if (fits) broadcast(storms) else storms
    val g = ceil(col("__w") / lit(target)).cast("int")
    val cs = corpus.join(side, Seq("band_id", "band_hash"),
        "left")
      .select(col("band_id"), col("band_hash"),
        when(col("__w").isNull, lit(0))
          .otherwise(pmod(xxhash64(col("doc_id")), g.cast("long"))
            .cast("int")).as("__salt"),
        col("doc_id").as("doc_corpus"))
    val bs = batch.join(side, Seq("band_id", "band_hash"),
        "left")
      .select(col("band_id"), col("band_hash"),
        explode(sequence(lit(0), coalesce(g - 1, lit(0)))).as("__salt"),
        col("doc_id").as("doc_batch"))
    bs.join(cs, Seq("band_id", "band_hash", "__salt"))
      .select(col("doc_batch"), col("doc_corpus"))
      .distinct()
  }

  /** Batch-vs-corpus incremental NEAR-dup — the fuzzy twin of
    * `incremental`, and the production shape of MinHash dedup: the
    * corpus's LSH band index is a landed table (what a 100 TB pipeline
    * maintains between daily runs — here landed then probed in one op);
    * today's batch is banded the same way and probes the index with a
    * linear equi-join, never re-pairing the corpus against itself.
    * The probe is heavy-hitter salted like `saltedBandPairs`, two-sided:
    * a storm bucket of corpus width w splits into g = ceil(w/64) salt
    * groups — the corpus side takes one salt by doc-id hash, the (small)
    * batch side replicates g ways — so no join group quadratically
    * blows one task. Survivors get exact hash-set Jaccard verification.
    *
    * The band index IS the minhashLsh landing ([[ensureMhLshLanded]]):
    * both ops maintain the identical (doc_id, hs, bands) table, so this
    * op probes the SHARED memoized landing instead of re-running the
    * corpus-sized shingle+signature pass and re-landing the same bytes
    * to a private dir (the r14 form paid exactly that — 5.5s at sf3 for
    * work the mhlsh landing already held). Oracle: DuckDB re-derives
    * candidates AND verification from the same landed table (__SFDIR__
    * pattern), so the whole operator stays hash-checked end to end. */
  def minhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val target = 64
    ensureMhLshLanded(s, dir)
    val base = s.read.parquet(mhLshDir(dir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    // corpus = prior days, batch = today (deterministic date stand-in,
    // the `incremental` convention)
    val corpus = banded.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = banded.filter(pmod(col("doc_id"), lit(5)) === 0)
    val pairs = saltedProbePairs(corpus, batch, target)
    verifiedJaccard(pairs
      .join(base.select(col("doc_id").as("doc_batch"), col("hs").as("sh_a")),
        "doc_batch")
      .join(base.select(col("doc_id").as("doc_corpus"), col("hs").as("sh_b")),
        "doc_corpus"),
      "doc_batch", "doc_corpus")
  }

  /** Per-source duplication telemetry — the dashboard row a corpus
    * curator watches per crawl/feed: doc counts, distinct raw and
    * normalized content hashes, and the resulting duplication rates.
    * One map-side-combinable shuffle on `source`. */
  def stats(s: SparkSession, dir: String): DataFrame = {
    DocArtifacts.stats(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        countDistinct(col("norm_h")).as("n_distinct_norm"))
      .select(col("source"), col("n_docs"), col("n_distinct_texts"),
        col("n_distinct_norm"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        round(lit(1.0) - col("n_distinct_norm").cast("double") /
          col("n_docs").cast("double"), 6).as("norm_dup_rate"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_stats" -> (stats _),
    "dedup_exact" -> (exact _),
    "dedup_exact_norm" -> (exactNormalized _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_threshold_sweep" -> (thresholdSweep _),
    "dedup_band_tuning" -> (bandTuning _),
    "dedup_minhash_calibration" -> (minhashCalibration _),
    "dedup_containment" -> (containment _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _),
    "dedup_cluster" -> (cluster _),
    "dedup_cluster_stats" -> (clusterStats _),
    "dedup_cluster_incremental" -> (clusterIncremental _),
    "dedup_incremental" -> (incremental _),
    "dedup_minhash_incremental" -> (minhashIncremental _),
    "dedup_source_similarity" -> (sourceSimilarity _),
    "dedup_source_overlap" -> (sourceOverlap _),
    "dedup_embedding_cosine" -> (embeddingCosine _),
    "dedup_semantic" -> (semantic _))

  val oracles: Map[String, String] = Map(
    // band-bucket candidates, size-ratio prefilter and exact-Jaccard
    // verification re-derived from the landed (doc_id, hs, bands)
    // table; only minhash + band hashing stay Spark-side. The raw
    // inter/uni double compare vs 0.5 is IEEE-identical in both
    // engines (the op's own threshold discipline).
    "dedup_minhash_lsh" ->
      s"""WITH b AS (SELECT doc_id, hs, bands
        |  FROM '${mhLshDir("__SFDIR__")}/*.parquet'),
        |banded AS (
        |  SELECT doc_id, generate_subscripts(bands, 1) AS band_id,
        |    unnest(bands) AS band_hash
        |  FROM b),
        |-- MATERIALIZED: without the barrier DuckDB pushes the jaccard
        |-- filter below the DISTINCT onto the raw band join (millions of
        |-- pre-dedup pairs; measured 414s -> 0.1s at sf0.1)
        |p AS MATERIALIZED (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM banded x JOIN banded y
        |    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
        |  WHERE x.doc_id < y.doc_id),
        |j AS (
        |  SELECT p.doc_a, p.doc_b, a.hs AS hs_a, c.hs AS hs_b
        |  FROM p JOIN b a ON a.doc_id = p.doc_a
        |         JOIN b c ON c.doc_id = p.doc_b
        |  WHERE len(a.hs) <= 2 * len(c.hs) AND len(c.hs) <= 2 * len(a.hs)),
        |sc AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(hs_a, hs_b))) AS DOUBLE)
        |      AS raw_j
        |  FROM j)
        |SELECT doc_a, doc_b, ROUND(raw_j, 6) AS jaccard
        |FROM sc WHERE raw_j >= 0.5""".stripMargin,
    // per-source minima over the landed per-doc signatures, pairwise
    // agreement fraction; est = n_agree/32 is a power-of-two divide —
    // IEEE-exact in both engines
    "dedup_source_similarity" ->
      s"""WITH s AS (SELECT source, sig
        |  FROM '${srcSimDir("__SFDIR__")}/*.parquet'),
        |flat AS (
        |  SELECT source, generate_subscripts(sig, 1) AS i,
        |    unnest(sig) AS v
        |  FROM s),
        |m AS (SELECT source, i, MIN(v) AS mv
        |  FROM flat GROUP BY source, i),
        |sv AS (SELECT source, array_agg(mv ORDER BY i) AS sig
        |  FROM m GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |    a.sig AS sa, b.sig AS sb
        |  FROM sv a JOIN sv b ON a.source < b.source)
        |SELECT source_a, source_b,
        |  ROUND(CAST(list_sum(list_transform(range(1, 33),
        |      i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) AS DOUBLE)
        |    / 32.0, 6) AS est_jaccard
        |FROM p ORDER BY source_a, source_b""".stripMargin,
    "dedup_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(text)) AS n_distinct_texts,
        |  COUNT(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))))
        |    AS n_distinct_norm,
        |  ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate,
        |  ROUND(1.0 - CAST(COUNT(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS norm_dup_rate
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // same bucket-candidate CTE as dedup_ngram_jaccard, integer-exact
    // grid filter (10*inter >= t*union)
    "dedup_threshold_sweep" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t WHERE len(shingles) > 0),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |    len(list_intersect(a.shingles, b2.shingles)) AS inter,
        |    len(list_distinct(list_concat(a.shingles, b2.shingles))) AS uni
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket
        |    AND a.doc_id < b2.doc_id),
        |g AS (SELECT UNNEST([5, 6, 7, 8, 9]) AS t10)
        |SELECT t10 * 10 AS threshold_pct, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT doc_b) AS n_docs_dropped
        |FROM g JOIN p ON inter * 10 >= t10 * uni
        |GROUP BY t10 ORDER BY threshold_pct""".stripMargin,
    // same candidate CTE; every power is an explicit IEEE multiply /
    // sqrt chain mirroring the Spark expressions step by step, and the
    // per-pair probability is quantized to integer micro-units before
    // the order-dependent SUM
    "dedup_band_tuning" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t WHERE len(shingles) > 0),
        |p AS (
        |  SELECT len(list_intersect(a.shingles, b2.shingles)) AS inter,
        |    len(list_distinct(list_concat(a.shingles, b2.shingles))) AS uni
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket
        |    AND a.doc_id < b2.doc_id),
        |cfg AS (SELECT * FROM (VALUES (32, 1), (16, 2), (8, 4), (4, 8))
        |  AS v(bands, rows_per_band)),
        |x0 AS (
        |  SELECT bands, rows_per_band, inter, uni,
        |    CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS j
        |  FROM cfg CROSS JOIN p),
        |x1 AS (SELECT *, j * j AS j2 FROM x0),
        |x2 AS (SELECT *, j2 * j2 AS j4 FROM x1),
        |x3 AS (SELECT *, j4 * j4 AS j8 FROM x2),
        |x4 AS (SELECT *, CASE rows_per_band WHEN 1 THEN j WHEN 2 THEN j2
        |    WHEN 4 THEN j4 ELSE j8 END AS jr FROM x3),
        |x5 AS (SELECT *, 1.0 - jr AS q FROM x4),
        |x6 AS (SELECT *, q * q AS q2 FROM x5),
        |x7 AS (SELECT *, q2 * q2 AS q4 FROM x6),
        |x8 AS (SELECT *, q4 * q4 AS q8 FROM x7),
        |x9 AS (SELECT *, q8 * q8 AS q16 FROM x8),
        |xa AS (SELECT *, q16 * q16 AS q32 FROM x9),
        |xb AS (SELECT *, 1.0 - CASE bands WHEN 4 THEN q4 WHEN 8 THEN q8
        |    WHEN 16 THEN q16 ELSE q32 END AS prob FROM xa),
        |xc AS (SELECT *, CAST(round(prob * 1e6) AS BIGINT) AS p_u,
        |    (inter * 2 >= uni) AS near FROM xb),
        |g AS (
        |  SELECT bands, rows_per_band, COUNT(*) AS n_cand,
        |    COUNT(CASE WHEN near THEN 1 END) AS n_near,
        |    CAST(SUM(CASE WHEN near THEN p_u ELSE 0 END) AS BIGINT)
        |      AS pu_near
        |  FROM xc GROUP BY bands, rows_per_band)
        |SELECT bands, rows_per_band,
        |  ROUND(CASE rows_per_band
        |    WHEN 1 THEN 1.0 / bands
        |    WHEN 2 THEN sqrt(1.0 / bands)
        |    WHEN 4 THEN sqrt(sqrt(1.0 / bands))
        |    ELSE sqrt(sqrt(sqrt(1.0 / bands))) END, 6) AS s_star,
        |  n_cand, n_near,
        |  ROUND(CAST(pu_near AS DOUBLE) / 1e6, 6) AS exp_caught_near,
        |  CASE WHEN n_near > 0 THEN
        |    ROUND(CAST(pu_near AS DOUBLE) / 1e6
        |      / CAST(n_near AS DOUBLE), 6) END AS exp_recall_near
        |FROM g ORDER BY rows_per_band""".stripMargin,
    // signatures read from the landed parquet (simhash contract): the
    // oracle re-derives agreement, exact Jaccard, and the gap
    "dedup_minhash_calibration" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t WHERE len(shingles) > 0),
        |sg AS (SELECT doc_id, sig
        |  FROM '${mhCalibDir("__SFDIR__")}/*.parquet'),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |    len(list_intersect(a.shingles, b2.shingles)) AS inter,
        |    len(list_distinct(list_concat(a.shingles, b2.shingles))) AS uni
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket
        |    AND a.doc_id < b2.doc_id),
        |e AS (
        |  SELECT doc_a, doc_b, inter, uni,
        |    len(list_filter(range(1, 33),
        |      i -> sa.sig[i] = sb.sig[i])) AS n_agree
        |  FROM p
        |  JOIN sg sa ON sa.doc_id = p.doc_a
        |  JOIN sg sb ON sb.doc_id = p.doc_b)
        |SELECT doc_a, doc_b, CAST(n_agree AS BIGINT) AS n_agree,
        |  ROUND(CAST(n_agree AS DOUBLE) / 32.0, 6) AS est_jaccard,
        |  ROUND(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jaccard,
        |  ROUND(ABS(CAST(n_agree AS DOUBLE) / 32.0
        |    - CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)), 6) AS abs_err
        |FROM e""".stripMargin,
    // the oracle may pair via the self-join DuckDB is happy with at
    // sf0.01 — the Spark side must NOT (bounded per-shingle explode)
    "dedup_source_overlap" ->
      """WITH t AS (
        |  SELECT DISTINCT source, UNNEST(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingle
        |  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |tot AS (SELECT source, COUNT(*) AS n FROM t GROUP BY source),
        |c AS (SELECT a.source AS src_a, b.source AS src_b,
        |    COUNT(*) AS n_shared
        |  FROM t a JOIN t b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared, ta.n AS n_a, tb.n AS n_b,
        |  ROUND(CAST(n_shared AS DOUBLE) / least(ta.n, tb.n), 6)
        |    AS overlap_coef
        |FROM c JOIN tot ta ON ta.source = c.src_a
        |JOIN tot tb ON tb.source = c.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "dedup_exact_norm" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |    AS norm_hash,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        |  COUNT(DISTINCT md5(text)) AS n_byte_variants
        |FROM documents
        |GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t)
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  ROUND(CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.shingles, b2.shingles))) AS DOUBLE), 6) AS jaccard
        |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.doc_id < b2.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.shingles, b2.shingles))) AS DOUBLE) >= 0.5""".stripMargin,
    "dedup_containment" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t WHERE len(shingles) > 0)
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  ROUND(CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(a.shingles) AS DOUBLE), 6) AS containment_a,
        |  ROUND(CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(b2.shingles) AS DOUBLE), 6) AS containment_b
        |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.doc_id < b2.doc_id
        |WHERE len(list_intersect(a.shingles, b2.shingles)) * 5 >=
        |  least(len(a.shingles), len(b2.shingles)) * 4""".stripMargin,
    "dedup_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS raw_hash,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |      AS norm_hash
        |  FROM documents),
        |corpus AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |batch AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |raw_idx AS (SELECT raw_hash, MIN(doc_id) AS raw_match
        |  FROM corpus GROUP BY raw_hash),
        |norm_idx AS (SELECT norm_hash, MIN(doc_id) AS norm_match
        |  FROM corpus GROUP BY norm_hash)
        |SELECT b.doc_id,
        |  CASE WHEN raw_match IS NOT NULL THEN 'dup_exact'
        |       WHEN norm_match IS NOT NULL THEN 'dup_norm'
        |       ELSE 'new' END AS status,
        |  COALESCE(raw_match, norm_match) AS matched_corpus_id
        |FROM batch b
        |LEFT JOIN raw_idx USING (raw_hash)
        |LEFT JOIN norm_idx USING (norm_hash)""".stripMargin,
    // candidate AND verification legs re-derived from the landed band
    // index + hash-shingle table (mhIncDir): batch bands probe corpus
    // bands, exact hash-set Jaccard verifies — the size-ratio prefilter
    // is implied by J >= 0.5 over distinct sets, so it's omitted here
    "dedup_minhash_incremental" ->
      s"""WITH t AS (SELECT doc_id, hs, bands
        |  FROM '${mhLshDir("__SFDIR__")}/*.parquet'),
        |bands AS (
        |  SELECT doc_id, generate_subscripts(bands, 1) AS band_id,
        |    unnest(bands) AS band_hash
        |  FROM t),
        |hs AS (SELECT doc_id, hs FROM t),
        |cand AS (
        |  SELECT DISTINCT b.doc_id AS doc_batch, c.doc_id AS doc_corpus
        |  FROM bands b JOIN bands c
        |    ON b.band_id = c.band_id AND b.band_hash = c.band_hash
        |  WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
        |v AS (
        |  SELECT doc_batch, doc_corpus,
        |    CAST(len(list_intersect(hb.hs, hc.hs)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(hb.hs, hc.hs))) AS DOUBLE)
        |      AS rawj
        |  FROM cand
        |  JOIN hs hb ON hb.doc_id = doc_batch
        |  JOIN hs hc ON hc.doc_id = doc_corpus)
        |SELECT doc_batch, doc_corpus, ROUND(rawj, 6) AS jaccard
        |FROM v WHERE rawj >= 0.5""".stripMargin,
    // brute-force re-derivation of the SimHash pair list from the
    // fingerprints the op lands (simhashFpDir): at Hamming ≤ 3 the
    // pigeonhole candidate generation is provably complete, so the
    // all-pairs scan must produce EXACTLY the op's output — checking both
    // candidate completeness and the Hamming verification. The __SFDIR__
    // token resolves to the verified sf dir's slug at dump time
    // (SparkEntry.oracleSqlFor), so any sf checks its own landed run.
    "dedup_simhash" ->
      s"""WITH fp AS (SELECT doc_id, fp
        |  FROM '${simhashFpDir("__SFDIR__")}/*.parquet')
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.fp, b.fp)) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin,
    // connected components via recursive reachability: every node's
    // cluster is the MIN id it can reach over the (bidirectional) verified
    // near-dup pair graph — same fixpoint hash-min converges to
    "dedup_cluster" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.doc_id < b2.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.shingles, b2.shingles))) AS DOUBLE) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |reach AS (
        |  SELECT node, node AS lbl FROM nodes
        |  UNION
        |  SELECT e.dst AS node, r.lbl FROM reach r
        |  JOIN edges e ON e.src = r.node)
        |SELECT node AS doc_id, MIN(lbl) AS cluster_id
        |FROM reach GROUP BY node""".stripMargin,
    // the incremental attach must equal GLOBAL clustering restricted to
    // batch docs: full recursive-CTE reachability over the complete
    // pair graph (corpus + batch edges re-derived from raw text), min
    // reachable doc_id, plus whether any corpus doc is reachable —
    // checking that landed-label contraction composes exactly
    "dedup_cluster_incremental" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.doc_id < b2.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.shingles, b2.shingles))) AS DOUBLE) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |reach AS (
        |  SELECT node, node AS lbl FROM nodes
        |  UNION
        |  SELECT e.dst AS node, r.lbl FROM reach r
        |  JOIN edges e ON e.src = r.node)
        |SELECT node AS doc_id, MIN(lbl) AS cluster_id,
        |  MAX(CASE WHEN lbl % 5 <> 0 THEN 1 ELSE 0 END) = 1 AS joins_corpus
        |FROM reach WHERE node % 5 = 0 GROUP BY node""".stripMargin,
    // same recursive-CC CTE, then the size histogram
    "dedup_cluster_stats" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, shingles,
        |    list_min(list_transform(shingles, x -> md5(x))) AS bucket
        |  FROM t),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.doc_id < b2.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b2.shingles)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.shingles, b2.shingles))) AS DOUBLE) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |reach AS (
        |  SELECT node, node AS lbl FROM nodes
        |  UNION
        |  SELECT e.dst AS node, r.lbl FROM reach r
        |  JOIN edges e ON e.src = r.node),
        |lbls AS (
        |  SELECT node AS doc_id, MIN(lbl) AS cluster_id
        |  FROM reach GROUP BY node),
        |szs AS (
        |  SELECT cluster_id, COUNT(*) AS sz FROM lbls GROUP BY cluster_id)
        |SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
        |  sz * COUNT(*) AS n_docs, (sz - 1) * COUNT(*) AS n_dropped
        |FROM szs GROUP BY sz ORDER BY cluster_size""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH e AS (
        |  SELECT label, vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings)
        |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  ROUND(list_dot_product(a.emb, b.emb)
        |    / (sqrt(list_dot_product(a.emb, a.emb))
        |       * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ROUND(list_dot_product(a.emb, b.emb)
        |    / (sqrt(list_dot_product(a.emb, a.emb))
        |       * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.3""".stripMargin,
    // the emb_kmeans assignment CTE (landed centroids, identical distance
    // term order, ties to the lower cluster), then within-cluster pairs
    // and the keep-lowest-id drop rule
    "dedup_semantic" ->
      s"""WITH c AS (SELECT cluster, cv
        |  FROM '${Similarity.kmeansCentDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id, cluster, vd FROM (
        |    SELECT e.vec_id, c.cluster, e.vd,
        |      (list_dot_product(vd, vd) + list_dot_product(cv, cv))
        |        - 2.0 * list_dot_product(vd, cv) AS dist
        |    FROM e, c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cluster) = 1),
        |p AS (
        |  SELECT x.cluster, x.vec_id AS vec_a, y.vec_id AS vec_b,
        |    ROUND(list_dot_product(x.vd, y.vd)
        |      / (sqrt(list_dot_product(x.vd, x.vd))
        |         * sqrt(list_dot_product(y.vd, y.vd))), 6) AS cosine
        |  FROM a x JOIN a y ON x.cluster = y.cluster
        |    AND x.vec_id < y.vec_id)
        |SELECT vec_b AS vec_id, MIN(cluster) AS cluster,
        |  MIN(vec_a) AS dup_of, MAX(cosine) AS max_cosine,
        |  CAST(COUNT(*) AS BIGINT) AS n_partners
        |FROM p WHERE cosine >= 0.35
        |GROUP BY vec_b""".stripMargin)
}
