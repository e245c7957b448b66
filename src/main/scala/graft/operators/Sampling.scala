package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sampling & split block (SURVEY §2I) — the train/val/test machinery of
  * a training-data pipeline. "Random" is always content-hash order:
  * deterministic, reproducible across engines and reruns, stable under
  * re-partitioning — never rand()/sample() (seed-and-partition
  * dependent, unverifiable).
  */
object Sampling {

  /** Deterministic train/val/test assignment from the last hex nibble of
    * the content hash: 16 buckets → 12/2/2 split. Pure projection. */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    // digest-direct nibble (HashExprs): 0-11 train, 12-13 val, rest test
    val nibble = graft.functions.HashExprs.md5SliceLong(col("text"), 32, 1)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(nibble <= 11, "train")
          .when(nibble <= 13, "val")
          .otherwise(lit("test")).as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
  }

  /** Stratified 10% sample per language: rank by content-hash order
    * inside each stratum, keep the first ceil(n/10). A plain
    * `Window.partitionBy(lang)` would put each whole language on ONE
    * task — and one language dominates any real corpus — so the
    * per-stratum rank is computed with two-pass bucket ranking instead:
    * row-count-derived hash-prefix sub-buckets per language
    * (Ranking.hexCharsFor), counts → offsets →
    * within-(lang,bucket) row_number. The dominant language spreads
    * across the buckets; n_lang falls out of the same count pass. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val hc = Ranking.hexCharsFor(Tables.rowCount(s, dir, "documents"))
    val base = Tables.documents(s, dir)
      .withColumn("__hk", md5(col("text")))
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("__hk"), hc))
    Ranking.bucketedRowNumber(base, Seq("lang"), "__bkt", 1 << (4 * hc),
        Seq(col("__hk"), col("doc_id")), "rn", totalName = Some("n_lang"),
        smallRows = Some(Tables.rowCount(s, dir, "documents")))
      .filter(col("rn") <= ceil(col("n_lang") / 10))
      .select(col("lang"), col("doc_id"), col("rn").cast("int").as("rn"))
  }

  /** Label-balanced downsample — the class-rebalance step before
    * training a probe/classifier on skewed labels: every label keeps
    * exactly min-label-count vectors, chosen in deterministic
    * content-hash order (md5 over the id, the weightedSample
    * discipline — reruns and engine swaps keep the same set). The
    * per-label rank rides the same two-pass bucket ranking as
    * stratifiedSample (derived hash-prefix sub-buckets per label — a
    * dominant class spreads across the buckets, never one task); the global
    * min-count is a one-row broadcast. */
  def classBalance(s: SparkSession, dir: String): DataFrame = {
    val hc = Ranking.hexCharsFor(Tables.rowCount(s, dir, "embeddings"))
    val base = Tables.embeddings(s, dir)
      .withColumn("__hk",
        md5(concat(lit("balance:"), col("vec_id").cast("string"))))
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("__hk"), hc))
    val ranked = Ranking.bucketedRowNumber(base, Seq("label"), "__bkt",
      1 << (4 * hc),
      Seq(col("__hk"), col("vec_id")), "rn", totalName = Some("n_label"),
      smallRows = Some(Tables.rowCount(s, dir, "embeddings")))
    val minCount = Tables.embeddings(s, dir)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("m"))
    ranked.crossJoin(broadcast(minCount))
      .filter(col("rn") <= col("m"))
      .select(col("label"), col("vec_id"), col("rn").cast("int").as("rn"),
        col("n_label").as("n_label_total"), col("m").as("kept_per_label"))
  }

  /** Quality-weighted deterministic sampling — the "temperature"
    * upsample/downsample of a training mix: each doc keeps with
    * probability = its (capped) quality weight, decided by comparing the
    * weight against a content-hash uniform draw. The draw is the first 6
    * md5 hex chars over 16^6 — 2^24 is a power of two, so the division
    * is EXACT in ieee double and the keep decision is bit-identical in
    * any engine; reruns and engine swaps keep the same docs. */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val w = least(lit(1.0), col("n_chars").cast("double") / lit(400.0))
    val u = graft.functions.HashExprs.md5SliceLong(
      concat(col("doc_id").cast("string"), lit(":"), col("text")), 1, 6)
      .cast("double") / lit(16777216.0)
    Tables.documents(s, dir)
      .filter(u < w)
      .select(col("doc_id"), round(w, 6).as("weight"),
        round(u, 6).as("sample_key"))
  }

  /** Deterministic corpus shuffle — the reproducible training ORDER:
    * every doc gets a global position by ranking on its content-hash
    * draw (doc_id tie-break). Rerunning, re-partitioning, or switching
    * engines yields the identical epoch order — what rand()-based
    * shuffles can never guarantee. The global position is two-pass
    * bucket ranking on the hash key's derived hex-prefix buckets (uniform
    * by construction), never a single-task global window: one cheap
    * count pass + one bucket-partitioned row_number. */
  def shuffleOrder(s: SparkSession, dir: String): DataFrame = {
    // the draw chains the LANDED content hash (DocArtifacts stats `h`
    // = md5(text)) instead of re-digesting the raw text: the op reads
    // two scalar columns off columnar storage — both passes of the
    // two-pass ranking skip the text pages entirely — and the key is
    // just as content-derived/deterministic (md5 over doc_id + the
    // content digest). The oracle re-derives the same chain from the
    // raw text, so the order stays engine-checked end to end.
    val key = md5(concat(lit("shuffle:"), col("doc_id").cast("string"),
      lit(":"), col("h")))
    val hc = Ranking.hexCharsFor(Tables.rowCount(s, dir, "documents"))
    val base = DocArtifacts.stats(s, dir)
      .withColumn("shuffle_key", key)
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("shuffle_key"), hc))
    Ranking.bucketedRowNumber(base, Nil, "__bkt", 1 << (4 * hc),
        Seq(col("shuffle_key"), col("doc_id")), "shuffle_pos")
      .select(col("doc_id"), col("shuffle_key"), col("shuffle_pos"))
  }

  /** Deterministic mixture interleave — stride scheduling over sources:
    * the training-mix ORDER that feeds each source proportionally to its
    * mixture weight (a curator-assigned knob; here a deterministic
    * stand-in derived from the source name, as LangProfiles stands in
    * for real language profiles). Each doc gets a per-source rank r by
    * content-hash order and a virtual time r/weight; the global order
    * sorts by virtual time, so any prefix holds ~weight-proportional
    * counts per source and per-source order is preserved. Both ranks
    * are two-pass bucket rankings (hash-prefix buckets for the
    * per-source leg, approx-percentile value buckets for the global
    * leg) — no single-task window at any corpus size. */
  def interleave(s: SparkSession, dir: String): DataFrame = {
    val nDocs = Tables.rowCount(s, dir, "documents")
    val hc = Ranking.hexCharsFor(nDocs)
    // __hk IS the landed content hash (DocArtifacts stats `h` =
    // md5(text)) — the interleave reads scalar columns only, no text
    val base = DocArtifacts.stats(s, dir)
      .withColumn("weight", lit(1) + length(col("source")) % 3)
      .withColumn("__hk", col("h"))
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("__hk"), hc))
    // ONE count pass serves everything the op needs beyond the data
    // pass: the per-(source, bucket) counts ARE bucketedRowNumber's
    // aux table (collected here instead of broadcast-joined — same
    // |sources|·nBuckets bound either way), per-source totals and
    // weights fold from the same rows, and the source-registry cap
    // check reads the collected keys. The r17 shape paid three
    // driver-visible jobs for this (srcStats collect + the ranking's
    // count pass + its broadcast build); this is two scans total:
    // count pass + the final ranked projection.
    val cntRows = base.groupBy(col("source"), col("__bkt"))
      .agg(count(lit(1)).as("c"), first(col("weight")).as("w"))
      .collect()
    val bySrc = cntRows.groupBy(_.getString(0))
    // The global position is CLOSED-FORM from the per-source totals:
    // stride scheduling emits each source's ranks as the arithmetic
    // ladder r/w, so the number of rows ordered strictly before
    // (s, r) is Σ_{s'} |{r' ≤ n_{s'} : r'·w_s < r·w_{s'}}|
    //         = Σ_{s'} min(n_{s'}, (r·w_{s'} − 1) div w_s),
    // plus the exact ties r'·w_s = r·w_{s'} from earlier-named sources
    // (the (vt, source) tie-break; same-source ties are impossible —
    // vt is strictly increasing in r). All integer arithmetic, so the
    // result is exact wherever the oracle's double vt ordering is
    // collision-free: with integer weights ≤ 3 the rational grid's
    // minimum nonzero gap is ≥ 1/9, astronomically wider than a double
    // ulp until r ≈ 4e14 — far past any real corpus. This replaces the
    // r16 second two-pass ranking (percentile boundary pass + offset
    // pass + data-sized rank exchange over vt) with ONE broadcast
    // projection; the per-source stat table is bounded by the source
    // registry (the dedup_source_overlap discipline), guarded by cap
    // with the ranking plan as fallback.
    if (bySrc.size > 64) {
      // unbounded registry: fall back to the exact two-pass rankings
      val ranked = Ranking.bucketedRowNumber(base, Seq("source"), "__bkt",
          1 << (4 * hc), Seq(col("__hk"), col("doc_id")), "src_rank")
        .withColumn("vt",
          col("src_rank").cast("double") / col("weight").cast("double"))
      val vb = Ranking.bucketsFor(nDocs, 256)
      val bucketed = Ranking.withValueBucket(ranked, col("vt"), "__vbkt",
        vb)
      Ranking.bucketedRowNumber(bucketed, Nil, "__vbkt", vb,
          Seq(col("vt"), col("source"), col("doc_id")), "pos")
        .select(col("doc_id"), col("source"), col("weight"),
          col("src_rank"), round(col("vt"), 6).as("vt"), col("pos"))
    } else {
      // per-(source, bucket) exclusive rank offsets from the collected
      // counts (bucketedRowNumber step 2, driver-side), and per-source
      // (w, n) stats for the closed-form position — one data structure,
      // zero further jobs before the output pass
      val offRows = bySrc.toSeq.flatMap { case (src, rows) =>
        var run = 0L
        rows.sortBy(_.getInt(1)).map { r =>
          val off = run
          run += r.getLong(2)
          (src, r.getInt(1), off)
        }
      }
      val srcStats = bySrc.toSeq.map { case (src, rows) =>
        (src, rows.head.getInt(3).toLong, rows.map(_.getLong(2)).sum)
      }
      import s.implicits._
      val offDf = offRows.toDF("source", "__bkt", "__off")
      val localW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("__bkt"))
        .orderBy(col("__hk"), col("doc_id"))
      val ranked = base
        .join(broadcast(offDf), Seq("source", "__bkt"), "left")
        .withColumn("src_rank",
          coalesce(col("__off"), lit(0L)) + row_number().over(localW))
        .withColumn("vt",
          col("src_rank").cast("double") / col("weight").cast("double"))
      val stats = array(srcStats.map { case (src, w0, n) =>
        struct(lit(src).as("src"), lit(w0).as("w"), lit(n).as("n"))
      }: _*)
      def floorDiv(t: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        ((t - pmod(t, d)) / d).cast("long")
      val w = col("weight").cast("long")
      val pos = aggregate(stats, lit(1L), (acc, st) => {
        val cross = col("src_rank") * st.getField("w")
        acc +
          least(st.getField("n"), floorDiv(cross - 1, w)) +
          when(st.getField("src") < col("source") &&
            pmod(cross, w) === 0 && floorDiv(cross, w) <= st.getField("n"),
            1L).otherwise(0L)
      })
      ranked.select(col("doc_id"), col("source"), col("weight"),
        col("src_rank"), round(col("vt"), 6).as("vt"), pos.as("pos"))
    }
  }

  /** Deterministic k-fold cross-validation assignment: fold = a 24-bit
    * content-hash draw mod k — reproducible across engines, reruns and
    * repartitionings (the hashSplit convention, k-way). Pure projection,
    * no shuffle; the fold table is what a CV harness joins against, so
    * the assignment itself is the artifact. */
  def kfold(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val fold = pmod(graft.functions.HashExprs.md5SliceLong(
      concat(lit("fold:"), col("doc_id").cast("string"), lit(":"),
        col("text")), 1, 6), lit(k.toLong)).cast("int")
    Tables.documents(s, dir)
      .select(col("doc_id"), fold.as("fold"))
  }

  /** Time-based train/test split over the event stream — the
    * leakage-free alternative to hash splits for forecasting/attribution
    * models: everything up to the 80% point of the observed time range
    * trains, the tail tests. The cutoff is exact integer-µs arithmetic
    * (lo + (hi−lo)·4 DIV 5), so the boundary is bit-identical across
    * engines. Output: one row per split with event/user counts and the
    * time range, plus the headline leakage number — users active on BOTH
    * sides (a time split cannot de-leak users; the gate must know).
    *
    * Scale: one min/max scan (combinable), one broadcast one-row bounds
    * join, per-split counts map-side combinable; the user-overlap leg is
    * a per-user two-flag aggregate — one user_id shuffle, no window. */
  def temporalSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(col("lo"), col("hi"),
        expr("lo + ((hi - lo) * 4) DIV 5").as("cut_us"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("us") <= col("cut_us"), "train").otherwise("test"))
    val leak = tagged.groupBy(col("user_id"))
      .agg(max(when(col("split") === "train", 1).otherwise(0)).as("tr"),
        max(when(col("split") === "test", 1).otherwise(0)).as("te"))
      .agg(sum(when(col("tr") === 1 && col("te") === 1, 1L).otherwise(0L))
        .as("n_users_leaked"))
    tagged.groupBy(col("split"), col("cut_us"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("us")).as("min_us"), max(col("us")).as("max_us"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_events"), col("n_users"),
        col("min_us"), col("max_us"), col("cut_us"), col("n_users_leaked"))
      .orderBy(col("split"))
  }

  /** Group-aware holdout — the split GroupKFold guards with: every USER
    * lands wholly in train or holdout (md5 user-hash nibble, 14/16 vs
    * 2/16), so user-level leakage across the split is zero BY
    * CONSTRUCTION — the complement of `smp_temporal_split`'s time
    * boundary. Reports per-split user/event/purchase mass plus exact
    * decimal revenue so the holdout's composition is auditable.
    *
    * One scan: the assignment is a pure projection of user_id, the
    * stats one combinable aggregate onto the two-row split space. */
  def groupHoldout(s: SparkSession, dir: String): DataFrame = {
    val split = when(
      graft.functions.HashExprs.md5SliceLong(
        concat(lit("grp:"), col("user_id").cast("string")), 32, 1) >= 14,
      "holdout").otherwise(lit("train"))
    Tables.events(s, dir)
      .withColumn("split", split)
      .groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1))
          .as("n_purchases"),
        sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy(col("split"))
  }

  /** Negative downsampling — the CTR-training staple: keep every
    * positive (click), hash-keep 2/16 of negatives (views), and report
    * per campaign the class balance before/after plus the calibration
    * factor a trainer must re-weight kept negatives by. The keep rule
    * is the last md5 nibble of the event id (deterministic, rerun- and
    * engine-stable); everything downstream is integer counts and two
    * identically-ordered float divisions.
    *
    * One scan, one combinable aggregate onto the bounded campaign
    * space — the sampled TRAINING SET itself is a pure filter any
    * consumer applies with the same rule; this op publishes its audit. */
  def negativeDownsample(s: SparkSession, dir: String): DataFrame = {
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    val keepNeg = graft.functions.HashExprs.md5SliceLong(
      concat(lit("neg:"), col("event_id").cast("string")), 32, 1) <= 1
    Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"))
      .agg(count(when(col("event_type") === "click", 1)).as("n_pos"),
        count(when(col("event_type") === "view", 1)).as("n_neg"),
        count(when(col("event_type") === "view" && keepNeg, 1))
          .as("n_neg_kept"))
      .withColumn("pos_rate_before",
        round(col("n_pos").cast("double")
          / (col("n_pos") + col("n_neg")).cast("double"), 6))
      .withColumn("pos_rate_after",
        round(col("n_pos").cast("double")
          / (col("n_pos") + col("n_neg_kept")).cast("double"), 6))
      .withColumn("calib_factor",
        round(col("n_neg").cast("double")
          / nullif(col("n_neg_kept"), lit(0L)).cast("double"), 6))
      .orderBy(col("campaign"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "smp_negative_downsample" -> (negativeDownsample _),
    "smp_group_holdout" -> (groupHoldout _),
    "smp_kfold" -> (kfold _),
    "smp_temporal_split" -> (temporalSplit _),
    "smp_hash_split" -> (hashSplit _),
    "smp_stratified" -> (stratifiedSample _),
    "smp_weighted" -> (weightedSample _),
    "smp_shuffle" -> (shuffleOrder _),
    "smp_class_balance" -> (classBalance _),
    "smp_interleave" -> (interleave _))

  val oracles: Map[String, String] = Map(
    // identical md5-nibble keep rule and float division order
    "smp_negative_downsample" ->
      """WITH e AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |      AS campaign,
        |    event_type,
        |    substr(md5('neg:' || CAST(event_id AS VARCHAR)), 32, 1)
        |      IN ('0', '1') AS keep_neg
        |  FROM events WHERE event_type IN ('view', 'click')),
        |g AS (
        |  SELECT campaign,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_pos,
        |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_neg,
        |    COUNT(CASE WHEN event_type = 'view' AND keep_neg THEN 1 END)
        |      AS n_neg_kept
        |  FROM e GROUP BY campaign)
        |SELECT campaign, n_pos, n_neg, n_neg_kept,
        |  ROUND(CAST(n_pos AS DOUBLE)
        |    / CAST(n_pos + n_neg AS DOUBLE), 6) AS pos_rate_before,
        |  ROUND(CAST(n_pos AS DOUBLE)
        |    / CAST(n_pos + n_neg_kept AS DOUBLE), 6) AS pos_rate_after,
        |  ROUND(CAST(n_neg AS DOUBLE)
        |    / CAST(NULLIF(n_neg_kept, 0) AS DOUBLE), 6) AS calib_factor
        |FROM g ORDER BY campaign""".stripMargin,
    // identical md5 nibble assignment; BIGINT casts on the count sums
    "smp_group_holdout" ->
      """WITH a AS (
        |  SELECT *, CASE WHEN substr(md5('grp:'
        |      || CAST(user_id AS VARCHAR)), 32, 1) IN ('e', 'f')
        |    THEN 'holdout' ELSE 'train' END AS split
        |  FROM events)
        |SELECT split,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value
        |FROM a GROUP BY split ORDER BY split""".stripMargin,
    // integer-µs cutoff arithmetic identical term for term; the leaked
    // count is the users seen on both sides of the boundary
    "smp_temporal_split" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi,
        |    MIN(us) + ((MAX(us) - MIN(us)) * 4) // 5 AS cut_us FROM e),
        |t AS (SELECT user_id, us, cut_us,
        |    CASE WHEN us <= cut_us THEN 'train' ELSE 'test' END AS split
        |  FROM e CROSS JOIN b),
        |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users_leaked FROM (
        |  SELECT user_id FROM t GROUP BY user_id
        |  HAVING COUNT(DISTINCT split) = 2))
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  MIN(us) AS min_us, MAX(us) AS max_us, cut_us, n_users_leaked
        |FROM t CROSS JOIN u GROUP BY split, cut_us, n_users_leaked
        |ORDER BY split""".stripMargin,
    // same md5 order; DuckDB's plain per-label window is fine at
    // oracle scale — the Spark side is the one that must bucket
    "smp_class_balance" ->
      """WITH r AS (
        |  SELECT label, vec_id,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY md5('balance:' || CAST(vec_id AS VARCHAR)), vec_id)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY label) AS n_label
        |  FROM embeddings),
        |m AS (SELECT MIN(n) AS m FROM
        |  (SELECT COUNT(*) AS n FROM embeddings GROUP BY label))
        |SELECT label, vec_id, CAST(rn AS INT) AS rn,
        |  n_label AS n_label_total, m AS kept_per_label
        |FROM r CROSS JOIN m WHERE rn <= m""".stripMargin,
    "smp_kfold" ->
      """SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)
        |    || ':' || text), 1, 6) AS BIGINT) % 5 AS INT) AS fold
        |FROM documents""".stripMargin,
    "smp_hash_split" ->
      """WITH assigned AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 32, 1) IN
        |        ('0','1','2','3','4','5','6','7','8','9','a','b')
        |      THEN 'train'
        |      WHEN substr(md5(text), 32, 1) IN ('c','d') THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id,
        |  MAX(doc_id) AS max_doc_id
        |FROM assigned GROUP BY split""".stripMargin,
    "smp_shuffle" ->
      """SELECT doc_id,
        |  md5('shuffle:' || CAST(doc_id AS VARCHAR) || ':' || md5(text))
        |    AS shuffle_key,
        |  row_number() OVER (ORDER BY
        |    md5('shuffle:' || CAST(doc_id AS VARCHAR) || ':' || md5(text)),
        |    doc_id) AS shuffle_pos
        |FROM documents""".stripMargin,
    "smp_weighted" ->
      """WITH weighted AS (
        |  SELECT doc_id,
        |    least(1.0, CAST(n_chars AS DOUBLE) / 400.0) AS w,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 6)
        |      AS BIGINT) AS DOUBLE) / 16777216.0 AS u
        |  FROM documents)
        |SELECT doc_id, ROUND(w, 6) AS weight, ROUND(u, 6) AS sample_key
        |FROM weighted WHERE u < w""".stripMargin,
    "smp_interleave" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CAST(1 + length(source) % 3 AS INT) AS weight,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(text), doc_id) AS src_rank
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, source, weight, src_rank,
        |    CAST(src_rank AS DOUBLE) / CAST(weight AS DOUBLE) AS vt
        |  FROM w)
        |SELECT doc_id, source, weight, CAST(src_rank AS BIGINT) AS src_rank,
        |  ROUND(vt, 6) AS vt,
        |  row_number() OVER (ORDER BY vt, source, doc_id) AS pos
        |FROM v""".stripMargin,
    "smp_stratified" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(text), doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM ranked
        |WHERE rn <= CAST(ceil(n_lang / 10.0) AS BIGINT)""".stripMargin)
}
