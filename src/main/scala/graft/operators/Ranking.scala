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
      totalName: Option[String] = None): DataFrame = {
    val gCols = group.map(col)
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
    val gCols = group.map(col)
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
    val qs = (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))
    val bmap: Seq[(String, Seq[Double])] = rows.sample(0.05, 7L)
      .groupBy(col("m"))
      .agg(percentile_approx(col("__v"), array(qs: _*), lit(1000))
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
    // pass 2: exact bounded histogram, persisted for the two bounded
    // derivations below (`tgt` and `needs` both read `cum`) and
    // unpersisted as soon as `needs` is materialized — no reliance on
    // the caller running Caches.release
    val hist = bucketed(rows).groupBy(gmCols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__c")).persist()
    val wOff = Window.partitionBy(gmCols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__c"))
        .over(Window.partitionBy(gmCols: _*)))
    // requested ranks around position p·(n−1) per (group, measure),
    // resolved to their owning bucket: bucket b covers 1-based ranks
    // (__off, __off + __c]. All bounded-table work.
    val pctRows = pcts.toSeq.flatMap { case (m, ps) =>
      ps.map { case (name, p) =>
        struct(lit(m).as("m"), lit(name).as("name"), lit(p).as("p")) } }
    val tgt = cum.select(gmCols :+ col("__n"): _*).distinct()
      .select(gmCols ++ Seq(col("__n"),
        explode(array(pctRows: _*)).as("__t")): _*)
      .filter(col("__t").getField("m") === col("m"))
      .select(gmCols ++ Seq(col("__t").getField("name").as("name"),
        (col("__t").getField("p") * (col("__n") - 1).cast("double"))
          .as("__pos")): _*)
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    val needs = tgt
      .select(gmCols ++ Seq(col("name"), col("__pos"), col("__lo"),
        col("__hi"),
        explode(array(col("__lo") + 1, col("__hi") + 1)).as("__r")): _*)
      .distinct()
      .join(cum.select(gmCols ++ Seq(col("__bkt"), col("__off"),
        col("__c")): _*), gm)
      .filter(col("__r") > col("__off") &&
        col("__r") <= col("__off") + col("__c"))
      .select(gmCols ++ Seq(col("name"), col("__pos"), col("__lo"),
        col("__hi"), col("__r"), col("__bkt"), col("__off")): _*)
    // `needs` is BOUNDED (≤ 2 rows per (group, measure, percentile) —
    // the same bound its broadcast already assumed), so materialize it
    // once on the driver: hist can be unpersisted right here instead
    // of leaking until a Caches.release, and pass 3 rides a literal
    // table with no recompute of the histogram lineage. The bound is
    // configuration × GROUP CARDINALITY: cap the materialization so a
    // high-cardinality group set fails with a named error instead of
    // an opaque driver OOM (1M probe rows ≈ a few hundred MB of Row
    // overhead — far past any sane percentile report).
    val needsRows = needs.limit(1000001).collect()
    require(needsRows.length <= 1000000,
      "groupedPercentiles: > 1e6 rank-probe rows — the group column " +
        "cardinality is too high for a driver-pinned percentile " +
        "report; bucket the groups or aggregate upstream first")
    hist.unpersist()
    val needsLit = broadcast(df.sparkSession.createDataFrame(
      java.util.Arrays.asList(needsRows: _*), needs.schema))
    // pass 3: shuffle ONLY the target buckets, collapsed to per-value
    // counts map-side; rank within the bucket via an exclusive prefix
    // sum partitioned by bucket, then probe residual rank __r − __off.
    // The semi join dedups by nature, so `needs` itself is the bucket
    // filter — and its broadcast exchange (same join keys) is shared
    // with the rank-probe join below instead of building twice.
    val ref = bucketed(rows)
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
