package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed exact ranking (SURVEY §4 scale posture).
  *
  * A Spark `Window` with `orderBy` but no `partitionBy` moves EVERY row
  * to one task — correct at sf0.1, a scale-killer on a real corpus. This
  * utility computes the same exact global (or per-group) `row_number` /
  * `ntile` as a two-pass bucket plan in which no single task ever sees
  * more than ~N/nBuckets rows:
  *
  *  1. every row gets an integer bucket in [0, nBuckets) that is
  *     CONTIGUOUS w.r.t. the total order (all of bucket b precedes all
  *     of bucket b+1) — a hash-hex prefix for uniform digest keys, or
  *     approx-percentile range buckets for arbitrary orderable values;
  *  2. per-bucket counts (map-side partial agg, tiny result) become
  *     per-bucket rank offsets WITHOUT any data-sized global window: the
  *     running sum over the COUNT table is a window over ≤ |groups| ×
  *     nBuckets rows — bounded by configuration, not data (the
  *     bounded-global-window allowance), and the group total rides the
  *     same pass as a second window column;
  *  3. offsets broadcast-join back on the bucket id and the final rank
  *     is offset + within-bucket `row_number` (a window partitioned by
  *     bucket — parallel across nBuckets tasks).
  *
  * Exactness never depends on bucket BALANCE, only contiguity, so an
  * approximate boundary pass is safe; balance only shapes parallelism.
  * Both branches of the two-pass plan hang off the same child, so
  * whenever the input ends in a shuffle (the aggregated inputs of the
  * decile/RFM ops) ReuseExchange computes it once; raw-table inputs
  * (corpus shuffle/stratified sample) pay one extra columnar scan for
  * the count pass — the classic scalable trade.
  */
object Ranking {

  /** Exact 1-based row_number over `order` within each `group` (global
    * when `group` is empty), given a contiguous bucket column `bkt` in
    * [0, nBuckets). Result column `rnName` is LONG. When `totalName` is
    * set, the per-group row count is joined in as well (derived from the
    * same count pass — no extra scan). */
  def bucketedRowNumber(df: DataFrame, group: Seq[String], bkt: String,
      nBuckets: Int, order: Seq[Column], rnName: String,
      totalName: Option[String] = None,
      smallRows: Option[Long] = None): DataFrame = {
    val gCols = group.map(col)
    // small-input regime (callers pass the driving table's footer row
    // count): for GROUPED ranks at or under [[smallWindowRows]] a
    // direct per-group window replaces the count/offset/broadcast
    // stages — identical ranks, because the bucket column is
    // contiguous w.r.t. `order` (the plan's exactness invariant), so
    // offset(bkt) + within-bucket row_number IS the group-wide
    // row_number over `order`. Group-less callers never take this
    // branch (single-task window — the PlanAudit rule).
    if (group.nonEmpty && smallRows.exists(_ <= smallWindowRows)) {
      val wTot = Window.partitionBy(gCols: _*)
      val w = Window.partitionBy(gCols: _*).orderBy(order: _*)
      val withTot = totalName.fold(df)(tn =>
        df.withColumn(tn, count(lit(1)).over(wTot)))
      return withTot.withColumn(rnName,
        row_number().over(w).cast("long"))
    }
    val cnt = df.groupBy(gCols :+ col(bkt): _*)
      .agg(count(lit(1)).as("__bc"))
    // offsets AND group totals from windows over the count table itself:
    // ≤ |groups|·nBuckets rows, bounded by configuration at any data
    // size, so the single-task window is safe — and both ride ONE
    // broadcast join instead of an explode re-shuffle plus a second
    // totals join (measured ~0.5s of per-op constants locally)
    val wOff = Window.partitionBy(gCols: _*).orderBy(col(bkt))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aux0 = cnt.withColumn("__off", sum(col("__bc")).over(wOff))
    val aux = totalName.fold(aux0)(tn => aux0.withColumn(tn,
      sum(col("__bc")).over(Window.partitionBy(gCols: _*))))
    val localW = Window.partitionBy(gCols :+ col(bkt): _*).orderBy(order: _*)
    df.join(broadcast(aux.drop("__bc")), group :+ bkt, "left")
      .withColumn(rnName,
        coalesce(col("__off"), lit(0L)) + row_number().over(localW))
      .drop("__off")
  }

  /** Exact global EXCLUSIVE prefix sum of `value` over `order`, given a
    * contiguous bucket column `bkt` in [0, nBuckets) — the running-total
    * primitive behind sequence packing. Same two-pass shape as
    * `bucketedRowNumber`: per-bucket value sums (map-side partial agg)
    * become down-range offsets via a window over the bounded sum table;
    * the final cum = offset + within-bucket running sum over a window
    * partitioned by bucket (parallel across nBuckets tasks). Result
    * column is LONG and excludes the current row (first row of the
    * total order gets 0). When `totalName` is set, the per-group value
    * total is joined in from the same pass (no extra scan or join). */
  def bucketedPrefixSum(df: DataFrame, bkt: String, nBuckets: Int,
      order: Seq[Column], value: Column, cumName: String,
      group: Seq[String] = Seq.empty,
      totalName: Option[String] = None): DataFrame = {
    val gCols = group.map(col)
    val sums = df.groupBy(gCols :+ col(bkt): _*)
      .agg(sum(value.cast("long")).as("__bs"))
    // bounded-table windows, as in bucketedRowNumber
    val wOff = Window.partitionBy(gCols: _*).orderBy(col(bkt))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aux0 = sums.withColumn("__off", sum(col("__bs")).over(wOff))
    val aux = totalName.fold(aux0)(tn => aux0.withColumn(tn,
      sum(col("__bs")).over(Window.partitionBy(gCols: _*))))
    val localW = Window.partitionBy(gCols :+ col(bkt): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.join(broadcast(aux.drop("__bs")), group :+ bkt, "left")
      .withColumn(cumName, coalesce(col("__off"), lit(0L)) +
        coalesce(sum(value.cast("long")).over(localW), lit(0L)))
      .drop("__off")
  }

  /** Bucket count for the two-pass plans, derived from the driving
    * table's footer row count (`Tables.rowCount` — no job) so the
    * EXPECTED per-bucket row count stays ~256k at any scale — the
    * quantizerK discipline. The floor keeps the small-sf plans (and so
    * the committed bench/plan artifacts) identical to the legacy fixed
    * counts; the 65536 cap bounds the broadcast aux table
    * (|groups|·nBuckets rows) and the boundary array — past the cap
    * (≫17 B driving rows) per-bucket width grows linearly again and a
    * deployment raises the floor instead. Exactness never depends on
    * the count (contiguity argument above); only parallelism does. */
  def bucketsFor(n: Long, floor: Int): Int =
    math.max(floor.toLong, math.min(65536L, n / 262144L)).toInt

  /** Hex-prefix width whose 16^chars bucket domain covers
    * [[bucketsFor]]'s count at the same row count. */
  def hexCharsFor(n: Long): Int =
    if (n <= 256L * 262144L) 2 else if (n <= 4096L * 262144L) 3 else 4

  /** Small-input regime bound for GROUPED prefix sums/ranks: when the
    * driving table's footer row count is at or under this, a direct
    * per-group window (one exchange + sort; worst single task =
    * whole-table rows, bounded by this constant) beats the two-pass
    * bucket plan's three extra stages (count agg, bounded-window,
    * broadcast-join) — measured ~0.5-0.8s of per-query constants
    * locally. GROUPED only: a global (group-less) direct window is the
    * single-task sort PlanAudit forbids, so group = Nil callers always
    * take the bucket plan. Values are identical either way (same total
    * order, same exact long arithmetic); only the plan changes. */
  val smallWindowRows: Long = 1L << 21

  /** Direct grouped EXCLUSIVE prefix sum — the small-input regime of
    * [[bucketedPrefixSum]] (same output columns in the same order:
    * df columns, then `totalName` if set, then `cumName`). Callers
    * gate on [[smallWindowRows]] with a known footer row count. */
  def directPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      cumName: String, group: Seq[String],
      totalName: Option[String] = None): DataFrame = {
    require(group.nonEmpty,
      "directPrefixSum is grouped-only (single-task window otherwise)")
    val gCols = group.map(col)
    val wCum = Window.partitionBy(gCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gCols: _*)
    val withTot = totalName.fold(df)(tn =>
      df.withColumn(tn, sum(value.cast("long")).over(wTot)))
    withTot.withColumn(cumName,
      coalesce(sum(value.cast("long")).over(wCum), lit(0L)))
  }

  /** Contiguous bucket for a lowercase-hex digest key: the first
    * `chars` hex chars, as an int in [0, 16^chars) — hex-string
    * lexicographic order IS numeric order, and a digest key makes the
    * buckets uniform at any corpus size. Width via [[hexCharsFor]]. */
  def hexPrefixBucket(hexKey: Column, chars: Int = 2): Column =
    conv(substring(hexKey, 1, chars), 16, 10).cast("int")

  /** Contiguous bucket for an arbitrary orderable sort value (ascending):
    * boundaries = nBuckets-1 approx percentiles of the double-cast value
    * computed once and broadcast; bucket = count of boundaries ≤ value.
    * decimal→double is monotone and equal values share a bucket, so
    * contiguity w.r.t. the true (exact) order holds even where the double
    * cast collapses ties — the within-bucket sort still uses the exact
    * columns. NULL sort values compare null → bucket 0, matching the
    * NULLS FIRST default of an ascending sort.
    *
    * Boundary consistency: unlike `groupedPercentiles` (whose SAMPLED
    * boundaries are pinned to one driver-side evaluation because its
    * three passes run as SEPARATE actions), these boundaries stay a
    * lazy broadcast. They are a full-data deterministic aggregate over
    * a scan-rooted lineage, and every consumer
    * (`bucketedRowNumber`/`bucketedPrefixSum`, the one-shot bucket
    * queries) materializes the bucketed plan in ONE action, where the
    * identical bounds exchange is built once and reused — there is no
    * cross-action re-evaluation for a re-planned shuffle to skew, and
    * the lazy form saves a per-call job (measured ~0.3-0.7s per op
    * locally when this was briefly an eager collect). A future
    * multi-action consumer must pin first (collect or localCheckpoint
    * the bounds), as groupedPercentiles does. */
  def withValueBucket(df: DataFrame, sortAsc: Column, bkt: String,
      nBuckets: Int): DataFrame = {
    val qs = (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))
    // sketch accuracy must out-resolve the boundary grid once a derived
    // nBuckets exceeds the 10000 default (GK cannot place 65k
    // boundaries at 1/10000 rank resolution); balance-only either way
    val acc = math.max(10000, 4 * nBuckets)
    val bounds = df.agg(
      percentile_approx(sortAsc.cast("double"), array(qs: _*), lit(acc))
        .as("__bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn(bkt, coalesce(graft.functions.VectorExprs
        .sortedUpperBound(sortAsc.cast("double"), col("__bounds")), lit(0)))
      .drop("__bounds")
  }

  /** EXACT per-group continuous percentiles as a histogram-refinement
    * plan — the distributed replacement for Spark's `percentile`
    * aggregate, whose merge buffer is a per-group value→count map: one
    * reduce task holds a whole group's distinct values (an OOM at
    * corpus scale) and parallelism caps at the group count.
    *
    * Input: rows of (group…, measure `m`, value `v`); `pcts` maps each
    * measure name to its requested (output name, p) list. Three scans
    * of the input, and the ONLY data-sized shuffle is the target
    * buckets (≤ |g|·|m|·|pcts|·2 buckets of ~n/nBuckets rows each,
    * collapsed map-side to their distinct values):
    *
    *  1. approximate per-measure bucket boundaries (percentile_approx
    *     — exactness never depends on balance: equal values share a
    *     bucket by construction, so contiguity w.r.t. the true order
    *     holds whatever the boundaries are);
    *  2. EXACT per-(group, measure, bucket) row counts — a map-side
    *     combinable agg with a configuration-bounded result
    *     (|g|·|m|·nBuckets rows, persisted only while the bounded
    *     rank-probe table derives from it, then unpersisted in-line).
    *     Exclusive prefix sums over that table pin the exact
    *     rank interval (__off, __off+__c] each bucket covers, so the
    *     two ranks around position p·(n−1) resolve to (bucket,
    *     residual-rank) pairs with no data-sized work;
    *  3. refinement: ONLY rows of the target buckets are shuffled,
    *     grouped to per-value counts, and rank-probed within their
    *     bucket (window partitioned by bucket — no task ever holds
    *     more than one bucket of one measure's distinct values; size
    *     nBuckets so n/nBuckets fits a task at the deployment's scale).
    *
    * The interpolation replicates Spark's `Percentile.getPercentile`
    * operand-for-operand ((hi−pos)·loV + (pos−lo)·hiV, lower value
    * alone on an integer position), so the result is bit-identical to
    * the aggregate it replaces (RankingSpec). Returns one row per
    * (group, name): (group…, name, pv). Null values must be
    * pre-filtered (the aggregate ignores them; a caller with nullable
    * measures filters).
    *
    * EAGER-EXECUTION CONTRACT: this call is an ACTION, not a lazy plan
    * builder — the sampled boundaries (pass 1) and the bounded
    * rank-probe table (`needs`) are pinned to driver-side collections
    * at construction, because the three passes run as separate actions
    * and a re-planned shuffle between them could otherwise re-evaluate
    * a seeded sample into DIFFERENT boundaries per pass. Callers see
    * input scans (and input errors) at call time, and the driver holds
    * ≤ |groups|·|measures|·|pcts|·2 probe rows — bounded by
    * configuration times GROUP CARDINALITY, which is data-dependent:
    * the cap below fails loudly if a caller feeds a high-cardinality
    * group set rather than letting the collect OOM the driver. */
  def groupedPercentiles(df: DataFrame, group: Seq[String],
      pcts: Map[String, Seq[(String, Double)]],
      nBuckets: Int = 64): DataFrame = {
    val gm = group :+ "m"
    val gmCols = gm.map(col)
    val rows = df.select(gmCols :+ col("v").cast("double").as("__v"): _*)
    // pass 1: per-measure approximate boundaries from a 5% SAMPLE —
    // boundaries only shape balance, never exactness, so sampled
    // quantiles are plenty (a measure the sample misses entirely gets
    // no when-branch and falls back to one bucket, still exact).
    // COLLECTED to the driver and re-embedded as literal arrays: the
    // bucket function is evaluated again in pass 2 (hist) and pass 3
    // (refinement), and a seeded sample is only deterministic under
    // identical input partitioning — a caller downstream of an
    // AQE-coalesced shuffle could otherwise get DIFFERENT boundaries
    // per pass, silently misaligning __off with pass-3 buckets. The
    // collected state is |measures|·(nBuckets−1) doubles — bounded by
    // configuration, never by data. Bucket = count of boundaries ≤ v
    // (monotone in v and a pure function of v, so ties never straddle
    // a boundary), via the codegen'd binary search instead of an
    // interpreted 63-lambda fold per row.
    val bmap: Seq[(String, Seq[Double])] = rows.sample(0.05, 7L)
      .groupBy(col("m"))
      .agg(percentile_approx(col("__v"),
        array(boundaryQs(nBuckets): _*), lit(1000))
        .as("__bounds")).collect().toSeq
      .filter(!_.isNullAt(1))
      .map(r => r.getString(0) -> r.getSeq[Double](1))
    def bucketed(r: DataFrame): DataFrame = {
      // map literal + element_at, not a nested when/otherwise chain: a
      // per-measure conditional chain is O(|measures|) deep and a deep
      // expression tree degrades codegen (falls back to interpreted
      // mode past the splitting thresholds); the map lookup stays one
      // hash probe per row however many measures ride the pipeline
      val boundsCol =
        if (bmap.isEmpty) lit(null).cast("array<double>")
        else element_at(typedLit(bmap.toMap), col("m"))
      r.withColumn("__bkt", coalesce(graft.functions.VectorExprs
        .sortedUpperBound(col("__v"), boundsCol), lit(0)))
    }
    // pass 2: exact bounded histogram — |g|·|m|·nBuckets rows, bounded
    // by configuration, so it collects straight to the driver where
    // the core does all rank targeting in plain Scala (guarded below)
    val histRows = bucketed(rows).groupBy(gmCols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__c")).limit(histCap + 1).collect()
    val hist = histRows.toSeq.map { r =>
      (group.indices.map(r.get).toVector, r.getString(group.size),
        r.getInt(group.size + 1), r.getLong(group.size + 2))
    }
    percentilesCore(df.sparkSession,
      rows.schema.fields.take(group.size).toSeq, hist, pcts,
      refined = _ => bucketed(rows))
  }

  private def boundaryQs(nBuckets: Int): Seq[Column] =
    (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))

  /** WIDE-FORM [[groupedPercentiles]]: measures live in separate
    * COLUMNS of one row instead of melted (m, v) rows. Same exactness
    * contract and the same three-pass shape, but every pass runs over
    * the UN-MELTED table:
    *
    *  1. one sample scan computes every measure's boundaries in a
    *     single aggregate (the melted form's explode doubles the rows
    *     of all three passes for a two-measure caller — q13 measured
    *     ~8.6s at sf3 on exactly that);
    *  2. the exact histogram is ONE contingency aggregate over all
    *     measures' bucket columns — |g|·nBuckets^|measures| keys,
    *     bounded by configuration (callers keep |measures| ≤ 3; q13's
    *     2 measures × 64 buckets = 4096 cells/group), map-side
    *     combinable, one scan; per-measure histograms marginalize out
    *     of it with no further data-sized work;
    *  3. the refinement explode is PRE-FILTERED by the target buckets
    *     (known on the driver once `needs` is pinned): a row emits a
    *     melted (m, v, bkt) entry only for measures whose bucket holds
    *     a requested rank, so the explode produces ~target rows, never
    *     |measures|·n.
    *
    * `measures` maps each VALUE COLUMN name to its (output name, p)
    * list; results are one row per (group, name): (group…, name, pv),
    * bit-identical to the melted form (RankingSpec pins both against
    * the `percentile` aggregate). */
  def groupedPercentilesWide(df: DataFrame, group: Seq[String],
      measures: Seq[(String, Seq[(String, Double)])],
      nBuckets: Int = 64,
      minMaxOf: String => Option[(Double, Double)] = _ => None)
      : DataFrame = {
    val gCols = group.map(col)
    val mcols = measures.map(_._1)
    require(mcols.size <= 3,
      "groupedPercentilesWide: the contingency histogram is " +
        "nBuckets^|measures| cells per group — melt past 3 measures")
    val base = df.select(gCols ++
      mcols.map(m => col(m).cast("double").as(m)): _*)
    // pass 1: EQUI-WIDTH boundaries — boundaries only shape BALANCE
    // (contiguity gives exactness whatever they are), so min/max can
    // come from the CALLER's catalog statistics (`minMaxOf`, e.g.
    // Tables.columnMinMax over parquet footers — a driver-side read,
    // no job; r19 measured the scan-side aggregate at ~0.3s warm /
    // 3.5s cold at sf0.1 against 13 ms of footer reads, q13). Only
    // measures the hint cannot serve (missing/untrusted stats) fall
    // back to one min/max aggregate job; an all-null measure stays out
    // of bmap either way and rides the single-bucket fallback. The r16
    // note stands: equi-width boundaries on value-skewed columns give
    // less even buckets than sampled quantiles would — balance, not
    // correctness.
    val hinted: Map[String, (Double, Double)] =
      mcols.flatMap(m => minMaxOf(m).map(m -> _)).toMap
    val missing = mcols.filterNot(hinted.contains)
    val scanned: Map[String, (Double, Double)] =
      if (missing.isEmpty) Map.empty
      else {
        val aggs = missing.zipWithIndex.flatMap { case (m, i) =>
          Seq(min(col(m)).as(s"__mn$i"), max(col(m)).as(s"__mx$i")) }
        val brow = base.agg(aggs.head, aggs.tail: _*).collect().head
        missing.zipWithIndex.flatMap { case (m, i) =>
          if (brow.isNullAt(2 * i)) None
          else Some(m -> (brow.getDouble(2 * i), brow.getDouble(2 * i + 1)))
        }.toMap
      }
    val bmap: Map[String, Seq[Double]] = mcols.flatMap { m =>
      (hinted.get(m) orElse scanned.get(m)).map { case (lo, hi) =>
        m -> (1 until nBuckets).map(k => lo + (hi - lo) * k / nBuckets) }
    }.toMap
    // a NULL measure value gets the −1 sentinel bucket: the joint
    // contingency must still count the row for its other measures (the
    // melted form's "caller pre-filters nulls" contract cannot exist
    // column-wise), and the per-measure marginal drops the sentinel —
    // exactly the aggregate's ignore-nulls rule
    def bktCol(m: String): Column = when(col(m).isNull, lit(-1))
      .otherwise(bmap.get(m)
        .map(bs => coalesce(graft.functions.VectorExprs
          .sortedUpperBound(col(m), typedLit(bs)), lit(0)))
        .getOrElse(lit(0)))
    def bName(m: String): String = s"__b_$m"
    // pass 2: ONE exact contingency aggregate over all bucket columns —
    // |g|·nBuckets^|measures| cells, bounded by configuration, so it
    // collects straight to the driver and the per-measure marginals
    // are plain Scala (zero extra jobs; the guarded cap names the
    // failure for a high-cardinality group set)
    val cRows = base.select(gCols ++
        mcols.map(m => bktCol(m).as(bName(m))): _*)
      .groupBy((group ++ mcols.map(bName)).map(col): _*)
      .agg(count(lit(1)).as("__cc")).limit(histCap + 1).collect()
    require(cRows.length <= histCap,
      "groupedPercentilesWide: > 1e6 contingency cells — the group " +
        "column cardinality is too high for a driver-pinned " +
        "percentile report; bucket the groups or aggregate upstream")
    val hist = mcols.zipWithIndex.flatMap { case (m, mi) =>
      cRows.toSeq
        .filter(_.getInt(group.size + mi) != -1)
        .groupBy(r => (group.indices.map(r.get).toVector,
          r.getInt(group.size + mi)))
        .map { case ((g, b), rs) =>
          (g, m, b, rs.map(_.getLong(group.size + mcols.size)).sum) }
    }
    val pcts = measures.toMap
    percentilesCore(df.sparkSession,
      base.schema.fields.take(group.size).toSeq, hist, pcts,
      refined = targets => {
        // the target buckets are literals by now — one cheap-filtered
        // branch per measure, unioned (scans are ~0.4s at sf3 where a
        // per-row array-of-structs explode measured 4.4s of allocation
        // churn; n branch scans of a columnar source beat one
        // allocating pass, and the union still feeds ONE shuffle)
        mcols.flatMap { m =>
          val tb = targets.getOrElse(m, Seq.empty)
          if (tb.isEmpty) None
          else Some(base
            .select(gCols ++ Seq(lit(m).as("m"),
              col(m).as("__v"), bktCol(m).as("__bkt")): _*)
            .filter(col("__bkt").isin(tb: _*)))
        }.reduceOption(_ unionAll _).getOrElse(
          base.limit(0).select(gCols ++ Seq(lit("").as("m"),
            lit(0.0).as("__v"), lit(0).as("__bkt")): _*))
      })
  }

  /** Driver-side histogram cap: |g|·|m|·nBuckets (melted) or
    * |g|·nBuckets^|measures| (wide) rows — bounded by configuration
    * times GROUP CARDINALITY, which is data-dependent, so the collects
    * fail loudly past this instead of letting a high-cardinality group
    * set OOM the driver (1M rows of Row overhead ≈ a few hundred MB —
    * far past any sane percentile report). */
  private val histCap = 1000000

  /** Shared rank-targeting + refinement of the percentile plans. The
    * EXACT histogram arrives COLLECTED — (group values, m, bkt, count)
    * tuples, configuration-bounded (see [[histCap]]) — and all rank
    * targeting runs in plain Scala on the driver: the r15 form ran the
    * same bounded-table math as Spark windows/joins over a 384-row
    * DataFrame and paid ~10 AQE jobs of pure per-job constants for it
    * (~2-3s of the q13 sf3 wall). Only pass 3 — the value-level
    * refinement of target buckets — touches the cluster.
    * `refined(targets)` must return (group…, m, __v, __bkt) rows
    * covering AT LEAST every (m → target buckets) pair — extra rows
    * are dropped by the needs semi-join, so an unfiltered scan (the
    * melted frontend) and a pre-filtered union (the wide frontend) are
    * both correct. */
  private def percentilesCore(spark: org.apache.spark.sql.SparkSession,
      groupFields: Seq[org.apache.spark.sql.types.StructField],
      hist: Seq[(Vector[Any], String, Int, Long)],
      pcts: Map[String, Seq[(String, Double)]],
      refined: Map[String, Seq[Int]] => DataFrame): DataFrame = {
    require(hist.length <= histCap,
      "groupedPercentiles: > 1e6 histogram rows — the group column " +
        "cardinality is too high for a driver-pinned percentile " +
        "report; bucket the groups or aggregate upstream first")
    val group = groupFields.map(_.name)
    val gCols = group.map(col)
    val gm = group :+ "m"
    val gmCols = gm.map(col)
    // rank targeting, per (group, measure): ascending-bucket offsets
    // pin the exact 1-based rank interval (off, off+c] each bucket
    // covers; the two ranks around position p·(n−1) resolve to
    // (bucket, offset) probes — all driver Scala over bounded rows.
    // pos/lo/hi math is the same IEEE double arithmetic the previous
    // Spark expressions ran, so the interpolation inputs are
    // bit-identical.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val needsRows = hist.groupBy(t => (t._1, t._2)).toSeq.flatMap {
      case ((g, m), ts) =>
        val buckets = ts.map(t => (t._3, t._4)).sortBy(_._1)
        val n = buckets.map(_._2).sum
        val offs = buckets.scanLeft(0L)(_ + _._2)
        // (bkt, off, c) triples in ascending bucket order
        val triples = buckets.zip(offs).map { case ((b, c), off) =>
          (b, off, c) }
        pcts.getOrElse(m, Nil).flatMap { case (name, p) =>
          val pos = p * (n - 1).toDouble
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          Seq(lo + 1, hi + 1).distinct.flatMap { r =>
            triples.find(t => r > t._2 && r <= t._2 + t._3).map(t =>
              Row.fromSeq(g ++ Seq(m, name, pos, lo, hi, r, t._1, t._2)))
          }
        }
    }
    val needsSchema = StructType(groupFields ++ Seq(
      StructField("m", StringType), StructField("name", StringType),
      StructField("__pos", DoubleType), StructField("__lo", LongType),
      StructField("__hi", LongType), StructField("__r", LongType),
      StructField("__bkt", IntegerType), StructField("__off", LongType)))
    val needsLit = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(needsRows: _*), needsSchema))
    val mI = needsSchema.fieldIndex("m")
    val bI = needsSchema.fieldIndex("__bkt")
    // the driver-pinned probe rows double as the refinement frontends'
    // pre-filter hint: measure → the buckets that hold requested ranks
    val targets: Map[String, Seq[Int]] = needsRows
      .map(r => r.getString(mI) -> r.getInt(bI))
      .groupBy(_._1).map { case (m, bs) =>
        m -> bs.map(_._2).distinct.sorted }
    // pass 3: shuffle ONLY the target buckets, collapsed to per-value
    // counts map-side; rank within the bucket via an exclusive prefix
    // sum partitioned by bucket, then probe residual rank __r − __off.
    // The semi join dedups by nature, so `needs` itself is the bucket
    // filter — and its broadcast exchange (same join keys) is shared
    // with the rank-probe join below instead of building twice.
    val ref = refined(targets)
      .join(needsLit, gm :+ "__bkt", "left_semi")
      .groupBy(gmCols ++ Seq(col("__bkt"), col("__v")): _*)
      .agg(count(lit(1)).as("__rc"))
    val localW = Window.partitionBy(gmCols :+ col("__bkt"): _*)
      .orderBy(col("__v").asc).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = ref.withColumn("__lcum",
      coalesce(sum(col("__rc")).over(localW), lit(0L)))
    ranked.join(needsLit, gm :+ "__bkt")
      .filter(col("__r") - col("__off") > col("__lcum") &&
        col("__r") - col("__off") <= col("__lcum") + col("__rc"))
      .groupBy(gCols ++ Seq(col("name"), col("__pos"), col("__lo"),
        col("__hi")): _*)
      .agg(min(when(col("__r") === col("__lo") + 1, col("__v")))
          .as("__loV"),
        min(when(col("__r") === col("__hi") + 1, col("__v")))
          .as("__hiV"))
      .select(gCols ++ Seq(col("name"),
        when(col("__hi") === col("__lo"), col("__loV"))
          .otherwise(
            (col("__hi").cast("double") - col("__pos")) * col("__loV") +
            (col("__pos") - col("__lo").cast("double")) * col("__hiV"))
          .as("pv")): _*)
  }

  /** ANSI ntile(k) from an exact 1-based rank `rn` and group size `n`:
    * the first n%k tiles hold floor(n/k)+1 rows, the rest floor(n/k) —
    * identical to Spark's and DuckDB's ntile, without the single-task
    * global window ntile requires. */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val base = floor(n / lit(k))
    val rem = n % lit(k)
    val cut = rem * (base + lit(1))
    when(rn <= cut, floor((rn - lit(1)) / (base + lit(1))) + lit(1))
      .otherwise(
        rem + floor((rn - lit(1) - cut) / greatest(base, lit(1))) + lit(1))
      .cast("int")
  }
}
