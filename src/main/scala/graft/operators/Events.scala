package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-stream analytics block (SURVEY §2C) — the ads-funnel queries a
  * daily-scheduled ingestion cadence (reference scripts/setup_schedule.py)
  * feeds. Batch forms here; the streaming twins live in graft.streaming.
  *
  * Scale notes (SURVEY §4): every per-user op (sessionize, funnel,
  * attribution, retention) hangs off ONE hash partitioning by user_id —
  * window specs and groupBys are key-aligned so Catalyst reuses the same
  * shuffle instead of re-exchanging per step.
  */
object Events {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def outd(c: Column): Column = c.cast("double")

  /** Per-user event order: ts with event_id tie-break keeps every window
    * deterministic even on identical timestamps. */
  private def byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** Tumbling-window hourly rollup — the batch twin of
    * streaming.stream_windowed_counts. Partial agg collapses each map
    * partition to (hours × types) rows before the shuffle. */
  def tumblingWindow(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        outd(sum(dec2(col("value")))).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Gap-based sessionization (30-min inactivity): lag marks session
    * starts, a running sum numbers them — both windows plus the final
    * groupBy share the single user_id shuffle. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val prevTs = lag(col("ts"), 1).over(byUser)
    val sessioned = Tables.events(s, dir)
      .withColumn("new_sess",
        when(prevTs.isNull ||
          unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessioned.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"),
        outd(sum(dec2(col("value")))).as("sum_value"))
  }

  /** Session-depth histogram — the engagement-shape report over
    * `sessionize`'s output: for each session depth (events per
    * session), how many sessions, how many distinct users produced one,
    * and the mean session duration at that depth — the curve that
    * separates one-and-done traffic from engaged use. Two extra
    * combinable aggregates over the sessionized table (bounded depth
    * key space); nothing new shuffles beyond sessionize's single
    * user_id exchange. */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    sessionize(s, dir)
      .groupBy(col("n_events").as("session_depth"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("duration_us")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_duration_us"))
      .orderBy(col("session_depth"))

  /** Ordered funnel view→click→purchase: each later step's first hit must
    * strictly follow the previous step's. Three chained window projections
    * over ONE user_id partitioning (each step's window may reference the
    * previous step's column because the partitioning is already in place)
    * + a key-aligned final agg — a single exchange end to end, vs. the
    * naive 3-agg/3-join formulation's nine. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("t_click"), col("ts"))).over(w))
      .filter(col("t_view").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"),
        max(col("t_click")).as("t_click"),
        max(col("t_purchase")).as("t_purchase"))
  }

  /** Funnel conversion-latency report — the funnel's companion metric:
    * how LONG each stage transition takes, per view-cohort week. Exact
    * epoch-µs latencies from the one windowed funnel pass, aggregated to
    * stage counts + DISCRETE quantiles: the actual observed latency at
    * index ceil(p·m) of the sorted non-null latencies. Interpolated
    * percentiles (q13's percentile/quantile_cont pairing) differ by an
    * ulp between engines at 1e11-µs magnitudes, so the report emits real
    * elements — exact BIGINTs, bit-identical anywhere; the ceil(p·m)
    * index itself is the same IEEE double product in both engines.
    * Cohort-week grouping bounds each sorted group by a week's
    * converted users; at unbounded scale swap for the q20 sketch path. */
  def funnelLatency(s: SparkSession, dir: String): DataFrame = {
    val vc = unix_micros(col("t_click")) - unix_micros(col("t_view"))
    val cp = unix_micros(col("t_purchase")) - unix_micros(col("t_click"))
    def qDisc(c: Column, p: Double): Column = {
      val arr = array_sort(collect_list(c))
      when(size(arr) === 0, lit(null).cast("long"))
        .otherwise(element_at(arr,
          ceil(lit(p) * size(arr).cast("double")).cast("int")))
    }
    funnel(s, dir)
      .groupBy(date_trunc("week", col("t_view")).as("cohort_week"))
      .agg(
        count(lit(1)).as("n_viewed"),
        count(col("t_click")).as("n_clicked"),
        count(col("t_purchase")).as("n_purchased"),
        qDisc(vc, 0.5).as("p50_view_to_click_us"),
        qDisc(vc, 0.9).as("p90_view_to_click_us"),
        qDisc(cp, 0.5).as("p50_click_to_purchase_us"),
        qDisc(cp, 0.9).as("p90_click_to_purchase_us"))
      .orderBy(col("cohort_week"))
  }

  /** Last-touch attribution: for every purchase, the latest click before
    * it in (ts, event_id) order by the same user (a click sharing the
    * purchase's timestamp counts when its event_id is lower) — one window
    * pass over the clicks∪purchases slice, no range join. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val touch = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
    touch
      .withColumn("attributed_click_id",
        last(col("click_id"), ignoreNulls = true)
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        dec2(col("value")).cast("double").as("purchase_value"),
        col("attributed_click_id"))
  }

  /** Multi-touch (position-based / U-shaped) attribution — the credit
    * split a real ads report runs beside last-touch: each purchase's
    * value is divided across ALL same-user clicks in the preceding hour
    * — 40% first touch, 40% last, the middle 20% split evenly (a lone
    * touch gets 100%). One user_id equi-join with a time-range
    * predicate generates the touch pairs (the stream_join_attribution
    * interval shape); the position window partitions by
    * (user_id, purchase_id), which the join's user_id clustering
    * already satisfies — no second shuffle. Share arithmetic is the
    * same double formula in both engines; credit = share × exact-2dp
    * purchase value, rounded once at the output. */
  def attributionMulti(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), dec2(col("value")).as("val_dec"))
    val byPurchase = Window.partitionBy(col("user_id"), col("purchase_id"))
      .orderBy(col("click_ts"), col("click_id"))
    val n = col("n_touches").cast("double")
    val share =
      when(col("n_touches") === 1, lit(1.0))
        .when(col("n_touches") === 2, lit(0.5))
        .when(col("position") === 1, lit(0.4))
        .when(col("position") === col("n_touches"), lit(0.4))
        .otherwise(lit(0.2) / (n - lit(2.0)))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .withColumn("position", row_number().over(byPurchase))
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy(col("user_id"),
          col("purchase_id"))))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("position"), col("n_touches"),
        round(share, 6).as("share"),
        round(share * outd(col("val_dec")), 6).as("credit"))
      .withColumn("position", col("position").cast("long"))
  }

  /** Time-decay multi-touch attribution — the third standard model after
    * last-touch (`attribution`) and U-shaped (`attributionMulti`):
    * recent touches earn more credit. Decay weights are DYADIC —
    * 2^(4−k) for decay bucket k = floor(gap/15min) within the 1-hour
    * window — so every weight, weight sum and share is exact in both
    * engines under ANY accumulation order (a float e^{−λt} would be
    * reduction-order-nondeterministic). Same single user_id-keyed join
    * and purchase-partitioned windows as the U-shaped model. */
  def attributionDecay(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), dec2(col("value")).as("val_dec"))
    val byPurchase = Window.partitionBy(col("user_id"), col("purchase_id"))
      .orderBy(col("click_ts"), col("click_id"))
    val overP = Window.partitionBy(col("user_id"), col("purchase_id"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .withColumn("gap_us",
        unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
      .withColumn("decay_bucket",
        least(floor(col("gap_us") / lit(900000000L)), lit(4L)))
      .withColumn("w_int",
        element_at(array(lit(16L), lit(8L), lit(4L), lit(2L), lit(1L)),
          col("decay_bucket").cast("int") + 1))
      .withColumn("sw", sum(col("w_int")).over(overP))
      .withColumn("position", row_number().over(byPurchase).cast("long"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("position"), col("gap_us"), col("decay_bucket"),
        round(col("w_int").cast("double") / col("sw").cast("double"), 6)
          .as("share"),
        round(col("w_int").cast("double") / col("sw").cast("double")
          * outd(col("val_dec")), 6).as("credit"))
  }

  /** Point-in-time-correct training-feature snapshot — the feature-store
    * extract a churn/propensity model trains on: per user, engagement
    * features computed STRICTLY before the cutoff (no leakage — counts,
    * exact-decimal spend, µs recency, active days) and the label
    * strictly after (any purchase in the following 7 days). One
    * map-side-combinable groupBy over the pre-cutoff slice + one
    * distinct-user label aggregate, left-joined — the exact shape a
    * 100 TB feature pipeline lands daily; at scale the cutoff is the
    * partition boundary, so both slices are partition-pruned scans. */
  def featureSnapshot(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-20").cast("timestamp")
    val ev = Tables.events(s, dir)
    val feats = ev.filter(col("ts") < cutoff)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        coalesce(outd(sum(when(col("event_type") === "purchase",
          dec2(col("value"))))), lit(0.0)).as("spend"),
        (unix_micros(cutoff) - unix_micros(max(col("ts"))))
          .as("recency_us"),
        countDistinct(col("ts").cast("date")).as("n_active_days"))
    val labels = ev.filter(col("event_type") === "purchase" &&
        col("ts") >= cutoff &&
        col("ts") < cutoff + expr("INTERVAL 7 DAYS"))
      .select(col("user_id")).distinct()
      .withColumn("label", lit(1))
    feats.join(labels, Seq("user_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(0)))
  }

  /** Seasonal-naive forecast baseline with error report — the
    * monitoring-side forecast every ads dashboard starts from: predict
    * each day's event volume with the same weekday one week earlier and
    * report the absolute/percentage error. The raw feed pre-aggregates
    * to the bounded daily table first; the 7-day shift is a self
    * equi-join on the day key (gap-day correct where a lag(7) row
    * offset isn't, and no window at all). */
  def forecastBaseline(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val shifted = daily.select(date_add(col("day"), 7).as("day"),
      col("n_events").as("forecast_events"))
    daily.join(shifted, Seq("day"))
      .select(col("day"), col("n_events"), col("forecast_events"),
        abs(col("n_events") - col("forecast_events")).as("abs_err"),
        round(abs(col("n_events") - col("forecast_events")).cast("double")
          / col("n_events").cast("double"), 6).as("ape"))
      .orderBy(col("day"))
  }

  /** Daily event-type count matrix via the pivot (long→wide) operator —
    * the dashboard-facing reshape of the feed. The pivot value list is
    * DECLARED (the event taxonomy is closed), so Spark skips the extra
    * distinct-values job and the plan is a single map-side-combinable
    * groupBy at any scale; absent (day, type) combinations land as 0. */
  def typePivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("day"))
      .pivot("event_type", types)
      .count()
    types.foldLeft(wide)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("day"))
  }

  /** Daily new-vs-returning decomposition of DAU — the growth-accounting
    * report behind every engagement dashboard. First-seen day is one
    * combinable per-user min; the day×user distinct and the user-keyed
    * join both shuffle on user_id, so the exchange is reused and no stage
    * ever holds more than a user's worth of state. */
  def newVsReturning(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("ts").cast("date").as("day"), col("user_id"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    ev.distinct()
      .join(firstSeen, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(when(col("day") === col("first_day"), 1)).as("new_users"),
        count(when(col("day") > col("first_day"), 1)).as("returning_users"),
        count(lit(1)).as("dau"))
      .orderBy(col("day"))
  }

  /** Hour-of-week seasonality profile — the (ISO weekday × hour) traffic
    * and revenue matrix behind dayparting/bid-scheduling decisions. The
    * key space is fixed (≤168 cells), so the whole report is one fully
    * map-side-combinable aggregate: at 100 TB each task emits ≤168
    * partial rows and the shuffle is constant-size. ISO weekday
    * (Mon=1..Sun=7) on both engines. */
  def seasonality(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy((weekday(col("ts")) + lit(1)).as("dow"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        coalesce(outd(sum(when(col("event_type") === "purchase",
          dec2(col("value"))))), lit(0.0)).as("revenue"))
      .orderBy(col("dow"), col("hod"))
  }

  /** Per-event lag features — the sequence-model feature row every
    * next-event/churn model consumes: previous event type, exact µs gap
    * since the previous event, and the session-start flag (gap ≥ 30 min
    * or first event ever — the same boundary rule `sessionize` uses).
    * One user-partitioned ordered window with a (ts, event_id)
    * tie-break, so the frame never holds more than one user's events
    * and the output is deterministic under same-timestamp ties. */
  def lagFeatures(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        gap.as("gap_us"),
        (gap.isNull || gap >= lit(1800000000L)).as("is_session_start"))
  }

  /** Cohort retention: first-seen day × day offset → distinct actives. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).cast("date").as("cohort_day"))
    val activity = ev
      .select(col("user_id"), col("ts").cast("date").as("act_day"))
      .distinct()
    activity.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("act_day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Campaign performance rollup — the core ads-ETL report: per-campaign
    * funnel counts, CTR/CVR, and purchase revenue, with the campaign id
    * parsed out of the semi-structured props payload. */
  def campaignStats(s: SparkSession, dir: String): DataFrame = {
    // % (sign-preserving) like the oracle's %, not pmod — they differ on
    // negative keys
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    Tables.events(s, dir)
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(count(when(col("event_type") === "click", 1)).cast("double") /
          nullif(count(when(col("event_type") === "view", 1)), lit(0))
            .cast("double"), 6).as("ctr"),
        round(count(when(col("event_type") === "purchase", 1)).cast("double") /
          nullif(count(when(col("event_type") === "click", 1)), lit(0))
            .cast("double"), 6).as("cvr"),
        outd(sum(when(col("event_type") === "purchase", dec2(col("value")))))
          .as("revenue"))
  }

  /** Daily + 7-day rolling active users, in ONE data-sized exchange:
    * events collapse to per-user distinct day SETS (map-side partial
    * collect_set, one user_id shuffle), then BOTH counts fall out of
    * bounded per-row array math — dau explodes the day set, wau
    * explodes the per-user DEDUPED anchor set (each day covers ≤7
    * anchors; array_distinct runs per user-row, so the (anchor, user)
    * pair stream is already distinct by construction and a plain count
    * IS the distinct-user count). The two count aggregates collapse
    * map-side to ≤|days| rows per task — calendar-bounded, tiny at any
    * fact scale. The r16 form shuffled the distinct (day,user) pair
    * table once for the distinct, then AGAIN through countDistinct's
    * two-phase expand over the ×7 exploded anchors — two fact-sized
    * exchanges where one suffices. Per-user state is bounded by the
    * calendar (≤ |days| distinct days per user), never by event count.
    * DISTINCT window aggregates don't exist in either engine; this
    * shape scales where they wouldn't. */
  def dauWau(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("day"))).as("days"))
    // one explode emits BOTH tagged streams per user (k=0 activity
    // days, k=1 covered anchors), so a single bounded aggregate yields
    // dau and wau together — no second pass over the exchange, no join;
    // anchors that aren't real activity days drop at the dau>0 filter.
    // The anchor stream is built from EXACT per-day coverage intervals
    // over the sorted day array — day d covers [d, min(d+6, next-1)],
    // so each (user, anchor) is emitted exactly once by construction
    // and the flatten-7×-then-array_distinct pass (the profiled hot
    // lambda: 7 structs built and deduped per activity day) disappears.
    perUser
      .select(explode(concat(
        transform(col("days"), d => struct(d.as("day"), lit(0).as("k"))),
        flatten(transform(col("days"), (d, i) =>
          transform(sequence(d, least(date_add(d, 6),
              coalesce(date_sub(try_element_at(col("days"), i + 2), 1),
                date_add(d, 6)))),
            a => struct(a.as("day"), lit(1).as("k"))))))).as("x"))
      .groupBy(col("x.day").as("day"))
      .agg(count(when(col("x.k") === 0, 1)).as("dau"),
        count(when(col("x.k") === 1, 1)).as("wau"))
      .filter(col("dau") > 0)
      .select(col("day"), col("dau"), col("wau"))
  }

  /** Hourly volume anomaly detection — the monitoring leg of the
    * reference's pipeline (config `monitoring.metrics_enabled`,
    * cloudwatch alarms): per-hour event counts z-scored against the
    * trailing 24 observed hours. The window runs over the PRE-AGGREGATED
    * hourly table — bounded by retention (≤ 8760 rows/yr), so the
    * single-partition window is fine at any fact scale; the heavy
    * lifting is the map-side-combined hourly count. Variance comes from
    * exact integer sums (Σn, Σn²) pushed through one double formula
    * identical in both engines — never stddev_samp, whose accumulation
    * differs per engine. */
  def hourlyAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("hour")).rowsBetween(-24, -1)
    val cnt = count(col("n")).over(w)
    val sn = sum(col("n")).over(w)
    val snsq = sum(col("n") * col("n")).over(w)
    val mean = sn.cast("double") / cnt.cast("double")
    val variance = (snsq.cast("double") -
      sn.cast("double") * sn.cast("double") / cnt.cast("double")) /
      (cnt.cast("double") - lit(1.0))
    hourly
      .withColumn("w_cnt", cnt)
      .withColumn("mean_24h", mean)
      .withColumn("var_24h", variance)
      .filter(col("w_cnt") === 24)
      .withColumn("z", (col("n").cast("double") - col("mean_24h")) /
        nullif(when(col("var_24h") > 0, sqrt(col("var_24h"))), lit(0.0)))
      .select(col("hour"), col("n"), round(col("mean_24h"), 6).as("mean_24h"),
        round(col("z"), 6).as("z"),
        // zero-variance windows give a null z; never emit a NULL boolean
        coalesce(abs(col("z")) > 3.0, lit(false)).as("is_anomaly"))
  }

  /** Gap sessionization via Spark's BUILT-IN session_window operator —
    * the declarative twin of `sessionize` (which builds the same thing
    * from lag + running sum). Both forms ride one user_id exchange;
    * session_window's end is last-event + gap by definition, so the
    * comparable key is the session START (spec-checked equal to
    * `sessionize`). */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        outd(sum(dec2(col("value")))).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("sum_value"))
  }

  /** Per-campaign CTR lift significance — the experimentation readout an
    * ads pipeline reports beside the raw CTRs: each campaign's
    * click-through tested against ALL OTHER campaigns pooled, as a
    * two-proportion z-score. Every input is an exact integer count
    * (views/clicks per campaign + global totals via a one-row broadcast),
    * pushed through ONE shared double formula — deterministic in both
    * engines, no per-engine variance estimators. */
  def abSignificance(s: SparkSession, dir: String): DataFrame = {
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    val per = Tables.events(s, dir)
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"))
      .agg(count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "click", 1)).as("clicks"))
    val tot = per.agg(sum(col("views")).as("t_views"),
      sum(col("clicks")).as("t_clicks"))
    val joined = per.crossJoin(broadcast(tot))
      .withColumn("r_views", (col("t_views") - col("views")).cast("double"))
      .withColumn("r_clicks", (col("t_clicks") - col("clicks")).cast("double"))
    val p1 = col("clicks").cast("double") /
      nullif(col("views").cast("double"), lit(0.0))
    val p2 = col("r_clicks") / nullif(col("r_views"), lit(0.0))
    val pPool = (col("clicks").cast("double") + col("r_clicks")) /
      nullif(col("views").cast("double") + col("r_views"), lit(0.0))
    // clicks are independent event counts, not a subset of views, so the
    // pooled "rate" can exceed 1 and the variance go negative — null the
    // z-score out in that case (both engines; DuckDB sqrt(<0) ERRORS)
    val variance = pPool * (lit(1.0) - pPool) *
      (lit(1.0) / nullif(col("views").cast("double"), lit(0.0)) +
        lit(1.0) / nullif(col("r_views"), lit(0.0)))
    val se = when(variance > 0, sqrt(variance))
    // NULL booleans render engine-differently downstream — never emit one
    joined.select(col("campaign"), col("views"), col("clicks"),
      round(p1, 6).as("ctr"),
      round((p1 - p2) / nullif(se, lit(0.0)), 6).as("z"),
      coalesce(abs((p1 - p2) / nullif(se, lit(0.0))) > 1.96, lit(false))
        .as("significant_95"))
      .orderBy(col("campaign"))
  }

  /** User-journey transition matrix: counts of consecutive event-type
    * pairs per user stream (the Markov counts behind path analysis /
    * next-action models). One lead() over the shared user_id
    * partitioning + a key-aligned groupBy over the bounded
    * (type × type) space — map-side combine collapses each partition to
    * ≤ |types|² rows before the shuffle. */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("n_transitions").desc, col("from_type"), col("to_type"))
  }

  /** Top-20 3-step user journeys (the path-analysis report behind the
    * transition matrix): two lead()s on the SAME shared user_id
    * partitioning every sequence op rides (one exchange), then a
    * groupBy over the bounded path space (≤ |types|³ keys —
    * map-side combine collapses each partition before the shuffle) and
    * a deterministic tie-broken top-k. */
  def pathTopk(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("t1", lead(col("event_type"), 1).over(byUser))
      .withColumn("t2", lead(col("event_type"), 2).over(byUser))
      .filter(col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** Trailing-7-day rolling revenue per day via a RANGE window frame
    * over day offsets — the frame covers a VALUE interval (6 days back),
    * not a row count, so gap days in the calendar are handled correctly
    * where a ROWS frame would silently span them. Runs over the bounded
    * pre-aggregated daily table (same posture as hourlyAnomaly). */
  def rollingRevenue(s: SparkSession, dir: String): DataFrame =
    rollingRevenueOf(Tables.events(s, dir),
      smallDomain =
        Tables.rowCount(s, dir, "events") <= Ranking.smallWindowRows)

  /** Two-regime 7-day rolling sum (r19, verdict item 7). Under the
    * footer gate: the original global range window over the bounded
    * day table (the explode/filter of the partitioned form measured
    * +0.15s of constants at sf0.1, stash-paired). Past the gate —
    * fact volume where a years-long day domain is plausible — the
    * window partitions by YEAR, with each year's last 6 days
    * DUPLICATED into the next year's partition as frame-contributor
    * context rows (filtered from output): every output row's frame
    * covers exactly the global frame, in-year days directly and the
    * prior-year tail via its context copies (WindowHardeningSpec pins
    * both regimes equal across a year boundary). */
  private[graft] def rollingRevenueOf(events: DataFrame,
      smallDomain: Boolean): DataFrame = {
    val daily = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(dec2(col("value"))).as("day_rev_dec"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val rolled =
      if (smallDomain) {
        val w = Window.orderBy(col("day_num"))
          .rangeBetween(-6, Window.currentRow)
        daily.withColumn("rolling_dec", sum(col("day_rev_dec")).over(w))
      } else {
        val nextYearStart =
          make_date(year(col("day")) + 1, lit(1), lit(1))
        val exploded = daily.select(col("day"), col("day_rev_dec"),
          col("day_num"),
          explode(when(col("day") >= date_sub(nextYearStart, 6),
            array(struct(year(col("day")).as("__wy"),
                lit(false).as("__ctx")),
              struct((year(col("day")) + 1).as("__wy"),
                lit(true).as("__ctx"))))
            .otherwise(array(struct(year(col("day")).as("__wy"),
              lit(false).as("__ctx"))))).as("__e"))
          .select(col("day"), col("day_rev_dec"), col("day_num"),
            col("__e.__wy").as("__wy"), col("__e.__ctx").as("__ctx"))
        val w = Window.partitionBy(col("__wy")).orderBy(col("day_num"))
          .rangeBetween(-6, Window.currentRow)
        exploded
          .withColumn("rolling_dec", sum(col("day_rev_dec")).over(w))
          .filter(!col("__ctx"))
      }
    rolled
      .select(col("day"),
        outd(col("day_rev_dec")).as("day_revenue"),
        outd(col("rolling_dec")).as("rolling_7d_revenue"))
      .orderBy(col("day"))
  }

  /** RFM segmentation — the classic ads/CRM user triage: per user, days
    * since last activity (Recency), event count (Frequency), total spend
    * (Monetary), each quartiled with deterministic tie-breaks into a
    * 3-digit RFM code. Recency is ranked on the last-activity day
    * itself (any fixed anchor merely shifts it), so the operator is
    * deterministic on static data and rerun-stable. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(dec2(col("value"))).as("monetary_dec"))
    // no anchor join: the corpus-max anchor only SHIFTS recency_days,
    // so recency ASC ≡ last_day DESC and the quartiles are identical —
    // rank on the last-activity day directly. Checkpoint so the rank
    // branches below never recompute the events aggregation.
    val per = perUser.localCheckpoint()
    // lower recency = better → rank ascending; higher freq/monetary =
    // better → rank descending; user_id tie-break everywhere. A global
    // ntile(4) window is a single-task sort over every user, so each
    // quartile is an exact two-pass bucket rank (Ranking's recipe) —
    // with all three dimensions FUSED in LONG FORMAT: each user becomes
    // three (dim, sortv) rows whose sort value is an exact ascending
    // LONG (recency days; negated event count; negated spend in cents —
    // decimal(…,2)×100 is exact, ANSI throws loudly if a user's spend
    // ever overflows cents-in-a-long), so ONE grouped percentile pass,
    // ONE count→offset pass and ONE bucket-partitioned window rank all
    // dimensions, and a pivot folds the quartiles back per user.
    val nB = 64
    val longFmt = per.select(col("user_id"), col("monetary_dec"),
      explode(array(
        struct(lit("r").as("dim"),
          negate(datediff(col("last_day"), lit("1970-01-01").cast("date")))
            .cast("long").as("sortv")),
        struct(lit("f").as("dim"), negate(col("frequency")).as("sortv")),
        struct(lit("m").as("dim"),
          negate((col("monetary_dec") * lit(100)).cast("long"))
            .as("sortv")))).as("dv"))
      .select(col("user_id"), col("monetary_dec"),
        col("dv.dim").as("dim"), col("dv.sortv").as("sortv"))
    // Two-regime quartiling (r19, the Ranking.smallWindowRows
    // discipline). The regime gate is the USER count — one cheap count
    // job over the pinned checkpoint (the events aggregation is NOT
    // re-run), because the per-dim windows of the small regime hold
    // |users| rows each, and the events footer count over-gates by the
    // events-per-user factor.
    val ranked = if (per.count() <= Ranking.smallWindowRows) {
      // small regime: ONE window pass partitioned by dim ranks all
      // three dimensions and carries n as count over the same
      // partition — the boundary job and the count/offset/total
      // broadcast subtrees of the bucket plan are all per-query
      // stage constants this regime deletes (guide §1.2/§2.4); the
      // 3-partition exchange is bounded by the gate, never corpus-sized
      val w = Window.partitionBy(col("dim"))
        .orderBy(col("sortv"), col("user_id"))
      longFmt.withColumn("q", Ranking.ntileFromRank(
        row_number().over(w).cast("long"),
        count(lit(1)).over(Window.partitionBy(col("dim"))), 4))
    } else {
      // bucket plan (unchanged past the gate): approx boundaries →
      // exact per-(dim, bucket) counts → offsets → bucket-partitioned
      // window, no task ever holds more than ~n/nB rows of one dim
      val qs = (1 until nB).map(i => lit(i.toDouble / nB))
      val bounds = longFmt.groupBy(col("dim"))
        .agg(percentile_approx(col("sortv"), array(qs: _*), lit(10000))
          .as("bs"))
      val ann = longFmt.join(broadcast(bounds), "dim")
        .withColumn("bkt", aggregate(col("bs"), lit(0),
          (acc, b) => acc + when(col("sortv") >= b, 1).otherwise(0)))
        .drop("bs")
      val cnts = ann.groupBy(col("dim"), col("bkt"))
        .agg(count(lit(1)).as("c"))
      // bucket counts → rank offsets without any global window (tiny
      // explode/re-aggregate, same trick as Ranking.bucketedRowNumber)
      val offs = cnts.filter(col("bkt") < lit(nB - 1))
        .select(col("dim"),
          explode(sequence(col("bkt") + lit(1), lit(nB - 1))).as("bkt"),
          col("c"))
        .groupBy(col("dim"), col("bkt")).agg(sum(col("c")).as("off"))
      // every user ranks in every dimension, so N is one number
      val total = cnts.filter(col("dim") === "r")
        .agg(sum(col("c")).as("n_total"))
      val w = Window.partitionBy(col("dim"), col("bkt"))
        .orderBy(col("sortv"), col("user_id"))
      ann
        .join(broadcast(offs), Seq("dim", "bkt"), "left")
        .crossJoin(broadcast(total))
        .withColumn("q", Ranking.ntileFromRank(
          coalesce(col("off"), lit(0L)) + row_number().over(w),
          col("n_total"), 4))
    }
    val quartiled = ranked
      .groupBy(col("user_id"))
      .agg(max(when(col("dim") === "r", col("q"))).as("r_q"),
        max(when(col("dim") === "f", col("q"))).as("f_q"),
        max(when(col("dim") === "m", col("q"))).as("m_q"),
        max(col("monetary_dec")).as("monetary_dec"))
    quartiled
      .groupBy(concat(col("r_q"), col("f_q"), col("m_q")).as("rfm_segment"))
      .agg(count(lit(1)).as("n_users"),
        outd(sum(col("monetary_dec"))).as("segment_revenue"))
  }

  /** Top-k users by spend, explicit tie-break. */
  def topkHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(outd(sum(dec2(col("value")))).as("total_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)
  }

  /** Cohort LTV curves — the revenue companion to retention: per signup
    * cohort (first-seen day) × day offset, buyer counts, purchase
    * counts, and exact-decimal period + cumulative revenue. The raw
    * purchase feed aggregates map-side onto (cohort_day, day_offset) — a
    * calendar²-bounded key space — and the cumulative sum's window runs
    * partitioned-by-cohort over that bounded pre-aggregate, never over
    * raw events (the rolling-revenue discipline). Decimal-first money:
    * both the period and cumulative sums are exact, cast to double once
    * on output. */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).cast("date").as("cohort_day"))
    val per = ev.filter(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("ts").cast("date"), col("cohort_day"))
          .as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_buyers"),
        count(lit(1)).as("n_purchases"),
        sum(dec2(col("value"))).as("rev_dec"))
    val w = Window.partitionBy(col("cohort_day"))
      .orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, 0)
    per
      .withColumn("cum_dec", sum(col("rev_dec")).over(w))
      .select(col("cohort_day"), col("day_offset"), col("n_buyers"),
        col("n_purchases"), outd(col("rev_dec")).as("revenue"),
        outd(col("cum_dec")).as("cum_revenue"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Heuristic bot / automation gate — the traffic-quality filter ads
    * attribution runs first: per user, volume, active span, exact
    * inter-event gap statistics (epoch-µs), type diversity, and the
    * rule verdict. The gap pass is the ONE per-user ordered window
    * (byUser); everything else is a map-side-combinable aggregate, and
    * every rule is an exact-integer comparison, so the verdict is
    * oracle-checkable bit for bit. This synthetic feed trips no rule
    * (coarse timestamps, uniform type mixes) — the spec injects a burst
    * user through botDetectionOf to prove both verdicts fire. */
  def botDetection(s: SparkSession, dir: String): DataFrame =
    botDetectionOf(Tables.events(s, dir))

  private[graft] def botDetectionOf(ev: DataFrame): DataFrame = {
    ev
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("span_us"),
        min(col("gap_us")).as("min_gap_us"),
        count(when(col("gap_us") < 1000000L, 1)).as("n_subsec_gaps"))
      // ≥20 events AND (≥40% arrive <1s after the previous, or a
      // single-type stream) — integer-exact, no float thresholds
      .withColumn("is_bot",
        col("n_events") >= 20 &&
          (col("n_subsec_gaps") * lit(5L) >= col("n_events") * lit(2L) ||
            col("n_types") === 1))
  }

  /** Inactivity-gap histogram — the churn-risk signal feeding retention
    * models: across all users, how long the silences between consecutive
    * ACTIVE DAYS last (a user active on day 3 and day 10 contributes one
    * 7-day gap). Output per gap length: how many such gaps occurred and
    * how many distinct users produced one — the curve a team reads to
    * pick its "dormant after N days" threshold.
    *
    * Scale shape: the (user, day) distinct is one map-side-combinable
    * exchange; the lag window is PER-USER partitioned (never global),
    * and the histogram is a second combinable aggregate onto the
    * bounded gap-length space. */
  def inactivityGaps(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("gap_days",
        datediff(col("day"), lag(col("day"), 1).over(w)).cast("long"))
      .filter(col("gap_days").isNotNull)
      .groupBy(col("gap_days"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Sample-ratio-mismatch check — the experimentation-platform DQ gate
    * that runs BEFORE anyone reads `ev_ab_significance`: per campaign,
    * are users actually split 50/50 between variants? Assignment is the
    * deterministic hash split every experiment framework uses (first
    * md5 hex char < '8' → A — exactly 8 of 16 outcomes, and the same
    * string compare in any engine); the chi-square statistic against
    * the expected even split trips the alarm at the df=1, α=0.05
    * critical value. A skewed split means assignment is broken and
    * every downstream lift number is garbage — the alarm, not the
    * z-test, is the first thing to check.
    *
    * One scan → distinct (campaign, user) → two combinable counts onto
    * the bounded campaign space; pure arithmetic after that. */
  def abSrmCheck(s: SparkSession, dir: String): DataFrame = {
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    val assigned = Tables.events(s, dir)
      .withColumn("campaign", campaign)
      .select(col("campaign"), col("user_id"),
        (substring(md5(concat(lit("assign:"),
          col("user_id").cast("string"))), 1, 1) < lit("8")).as("in_a"))
      .distinct()
    val chi2 =
      (col("n_a").cast("double") - col("e")) *
        (col("n_a").cast("double") - col("e")) / col("e") +
        (col("n_b").cast("double") - col("e")) *
        (col("n_b").cast("double") - col("e")) / col("e")
    assigned.groupBy(col("campaign"))
      .agg(count(when(col("in_a"), 1)).as("n_a"),
        count(when(!col("in_a"), 1)).as("n_b"))
      .withColumn("e", (col("n_a") + col("n_b")).cast("double") / lit(2.0))
      .select(col("campaign"), col("n_a"), col("n_b"),
        round(chi2, 6).as("chi2"),
        coalesce(chi2 > lit(3.841459), lit(false)).as("srm_alarm"))
      .orderBy(col("campaign"))
  }

  /** Landing dir for the stationary distribution — the landed-artifact
    * contract (simhashFpDir): computable from `dir` alone so the static
    * oracle SQL can read the run's vector. */
  private[graft] def markovDir(dir: String): String =
    graft.Tables.landingDir("markov", dir)

  /** Markov steady state vs today's mix — the long-run behavior report
    * behind `ev_transition_matrix`: the stationary distribution of the
    * per-user event-type chain next to each type's empirical share, and
    * the drift between them (where user behavior is heading vs where it
    * is). The transition matrix is BOUNDED by the type taxonomy (≤ 5²
    * cells — an aggregate, not data), so collecting it to the driver is
    * O(|types|²) at any event scale; the power iteration (60 sweeps,
    * uniform init, dangling states self-loop) is deterministic
    * sequential driver math. The stationary vector lands to parquet and
    * the report recomputes against the LANDED table, so the oracle
    * re-derives every output value in DuckDB. */
  def markovStationary(s: SparkSession, dir: String): DataFrame = {
    val rows = transitionMatrix(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = rows.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val n = states.length
    val cnt = Array.ofDim[Double](n, n)
    rows.foreach { case (f, t, c) => cnt(idx(f))(idx(t)) = c.toDouble }
    val rowTot = cnt.map(_.sum)
    val p = Array.tabulate(n, n)((i, j) =>
      if (rowTot(i) == 0.0) { if (i == j) 1.0 else 0.0 }
      else cnt(i)(j) / rowTot(i))
    var pi = Array.fill(n)(1.0 / n.toDouble)
    for (_ <- 0 until 60) {
      val nx = Array.tabulate(n)(j => (0 until n).map(i => pi(i) * p(i)(j)).sum)
      val mass = nx.sum
      pi = nx.map(_ / mass)
    }
    import s.implicits._
    states.zip(pi).toSeq.toDF("event_type", "stationary")
      .coalesce(1).write.mode("overwrite").parquet(markovDir(dir))
    val landed = s.read.parquet(markovDir(dir))
    val emp = Tables.events(s, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    val tot = emp.agg(sum(col("n_events")).as("tot"))
    emp.crossJoin(broadcast(tot))
      .join(broadcast(landed), Seq("event_type"), "left")
      .withColumn("st", coalesce(col("stationary"), lit(0.0)))
      .withColumn("emp",
        col("n_events").cast("double") / col("tot").cast("double"))
      .select(col("event_type"), col("n_events"),
        round(col("emp"), 6).as("empirical_share"),
        round(col("st"), 6).as("stationary_share"),
        (round(col("st") - col("emp"), 6) + lit(0.0)).as("delta"))
      .orderBy(col("event_type"))
  }

  /** CUSUM drift detector — the changepoint scan a spend-monitoring
    * pager runs over each campaign's daily revenue: S_t = Σ_{i≤t}(x_i −
    * x̄), reported as the scaled-integer S'_t = n·prefix_t − t·total so
    * every comparison is exact (revenue is DECIMAL(18,2) cents — no
    * float accumulates anywhere). The headline drift statistic is
    * (max S' − min S')/n cents and the changepoint is the EARLIEST day
    * attaining max |S'| — deterministic under ties in both engines.
    *
    * Scale shape: one combinable (campaign, day) aggregate over the
    * fact scan; every window below it is PARTITIONED BY campaign over
    * the bounded daily table (≤ campaigns × days rows — an aggregate,
    * not data), so no global window exists at any fact scale. */
  def cusumDrift(s: SparkSession, dir: String): DataFrame = {
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"), col("ts").cast("date").as("day"))
      .agg((sum(dec2(col("value"))) * lit(100)).cast("long").as("rev_cents"))
    val wOrd = Window.partitionBy(col("campaign")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("campaign"))
    daily
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("prefix_cents", sum(col("rev_cents")).over(wOrd))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total_cents", sum(col("rev_cents")).over(wAll))
      .withColumn("s_scaled",
        col("n_days") * col("prefix_cents") - col("t") * col("total_cents"))
      .withColumn("max_abs", max(abs(col("s_scaled"))).over(wAll))
      .groupBy(col("campaign"))
      .agg(max(col("n_days")).as("n_days"),
        round(max(col("total_cents")).cast("double") / lit(100.0), 2)
          .as("total_revenue"),
        round((max(col("s_scaled")) - min(col("s_scaled"))).cast("double")
          / lit(100.0) / max(col("n_days")).cast("double"), 6)
          .as("drift_stat"),
        min(when(abs(col("s_scaled")) === col("max_abs"), col("day")))
          .as("changepoint_day"))
      .orderBy(col("campaign"))
  }

  /** A/B power analysis — the "is this test even big enough" gate an
    * experimentation platform runs beside `ev_ab_srm_check`: per
    * campaign, user-level conversion rates under the same deterministic
    * md5 hash assignment, and the per-arm sample size required to
    * detect the OBSERVED delta at α=0.05 / 80% power
    * (n = ⌈(z_{α/2}+z_β)²·(p_a(1−p_a)+p_b(1−p_b))/δ²⌉; the z constant
    * is the shared literal (1.959964+0.841621)² so both engines run
    * the identical exactly-rounded float chain). δ=0 → NULL (no
    * detectable effect, nothing to power).
    *
    * One scan → per-(campaign, user) combinable conversion flag → two
    * combinable counts onto the bounded campaign space. */
  def powerAnalysis(s: SparkSession, dir: String): DataFrame = {
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    val perUser = Tables.events(s, dir)
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"), col("user_id"))
      .agg((count(when(col("event_type") === "purchase", 1)) > 0)
        .as("converted"))
      .withColumn("in_a",
        substring(md5(concat(lit("assign:"),
          col("user_id").cast("string"))), 1, 1) < lit("8"))
    val pA = col("conv_a").cast("double") /
      nullif(col("n_a"), lit(0L)).cast("double")
    val pB = col("conv_b").cast("double") /
      nullif(col("n_b"), lit(0L)).cast("double")
    val delta = pA - pB
    val s2 = pA * (lit(1.0) - pA) + pB * (lit(1.0) - pB)
    val nReq = when(delta =!= lit(0.0),
      ceil(lit(7.8488784725122245) * s2 / (delta * delta)))
    perUser.groupBy(col("campaign"))
      .agg(count(when(col("in_a"), 1)).as("n_a"),
        count(when(!col("in_a"), 1)).as("n_b"),
        count(when(col("in_a") && col("converted"), 1)).as("conv_a"),
        count(when(!col("in_a") && col("converted"), 1)).as("conv_b"))
      .select(col("campaign"), col("n_a"), col("n_b"),
        col("conv_a"), col("conv_b"),
        round(pA, 6).as("p_a"), round(pB, 6).as("p_b"),
        (round(delta, 6) + lit(0.0)).as("delta"),
        nReq.as("n_required"),
        (col("n_a") >= nReq && col("n_b") >= nReq).as("powered"))
      .orderBy(col("campaign"))
  }

  /** Simple-exponential-smoothing revenue level (α = 1/2) — the
    * one-number forecast a budget pacer carries per campaign. Over the
    * last ≤16 active days (oldest→newest index t, T days total):
    * s_T = [Σ_{t≥2} 2^{t−1}·x_t + 2·x_1] / 2^T — the standard SES
    * recursion s_t = αx_t + (1−α)s_{t−1} with s_1 = x_1, cleared of
    * float accumulation entirely: cents × dyadic integer weights sum
    * EXACTLY in BIGINT (≤2^15·Σcents ≪ 2^53, so even the final
    * scaled/denom division is one exactly-rounded IEEE op in both
    * engines). The flat SES forecast for tomorrow IS the level.
    *
    * Scale shape: same bounded (campaign, day) aggregate as the CUSUM
    * op; the rank/count windows are campaign-partitioned over that
    * bounded table — nothing global, nothing data-sized. */
  def forecastSes(s: SparkSession, dir: String): DataFrame = {
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"), col("ts").cast("date").as("day"))
      .agg((sum(dec2(col("value"))) * lit(100)).cast("long").as("rev_cents"))
    val wDesc = Window.partitionBy(col("campaign"))
      .orderBy(col("day").desc)
    val last = daily
      .withColumn("r", row_number().over(wDesc).cast("long"))
      .filter(col("r") <= 16)
      .withColumn("n_days_used",
        count(lit(1)).over(Window.partitionBy(col("campaign"))))
      .withColumn("t", col("n_days_used") - col("r") + lit(1L))
      .withColumn("w", when(col("t") === 1L, lit(2L))
        .otherwise(expr(
          "cast(shiftleft(cast(1 as bigint), cast(t - 1 as int)) as bigint)")))
    last.groupBy(col("campaign"))
      .agg(max(col("n_days_used")).as("n_days_used"),
        max(col("day")).as("last_day"),
        sum(col("w") * col("rev_cents")).as("scaled"),
        max(when(col("r") === 1L, col("rev_cents"))).as("last_cents"))
      .withColumn("denom", expr(
        "cast(shiftleft(cast(1 as bigint), cast(n_days_used as int)) as bigint)"))
      .select(col("campaign"), col("n_days_used"), col("last_day"),
        round(col("last_cents").cast("double") / lit(100.0), 2)
          .as("last_revenue"),
        round(col("scaled").cast("double") / col("denom").cast("double")
          / lit(100.0), 6).as("ses_level"),
        (round(col("scaled").cast("double") / col("denom").cast("double")
          / lit(100.0)
          - col("last_cents").cast("double") / lit(100.0), 6) + lit(0.0))
          .as("residual"))
      .orderBy(col("campaign"))
  }

  /** Event-type co-occurrence lift — the association matrix behind
    * "users who X also Y" targeting: for every unordered type pair,
    * lift = P(both)/(P(a)·P(b)) over users, with the exact user counts
    * that produced it. The per-user type-set is one combinable
    * aggregate (5 indicator maxes — the taxonomy is closed); a second
    * one-row aggregate computes all 16 scalars in one pass and the
    * 10-row pair grid explodes from it. Lift shares the exact operand
    * order cross-engine, so the matrix hashes. */
  def cooccurrenceLift(s: SparkSession, dir: String): DataFrame =
    cooccurrenceLiftOf(Tables.events(s, dir))

  /** Every synthetic user touches every type (all lifts exactly 1) —
    * the spec injects a skewed feed through this seam to prove the
    * lift actually discriminates. */
  private[graft] def cooccurrenceLiftOf(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pairs = for { a <- types; b <- types if a < b } yield (a, b)
    val hasCols = types.map(t =>
      max(when(col("event_type") === t, 1L).otherwise(0L)).as(s"has_$t"))
    val perUser = events
      .groupBy(col("user_id"))
      .agg(hasCols.head, hasCols.tail: _*)
    // ONE pass over the per-user table computes all 16 scalars; the
    // 10-row pair grid then explodes out of that single row
    val totals = perUser.agg(
      count(lit(1)).as("n_users"),
      types.map(t => sum(col(s"has_$t")).as(s"n_$t")) ++
        pairs.map { case (a, b) =>
          sum(col(s"has_$a") * col(s"has_$b")).as(s"nb_${a}_$b")
        }: _*)
    val grid = totals.select(col("n_users"),
      explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("type_a"), lit(b).as("type_b"),
          col(s"n_$a").as("n_a"), col(s"n_$b").as("n_b"),
          col(s"nb_${a}_$b").as("n_both"))
      }: _*)).as("p"))
    grid.select(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"),
        col("p.n_both").as("n_both"),
        round(col("p.n_both").cast("double") * col("n_users").cast("double")
          / nullif(col("p.n_a") * col("p.n_b"), lit(0L)).cast("double"), 6)
          .as("lift"),
        round(col("p.n_both").cast("double")
          / nullif(col("p.n_a"), lit(0L)).cast("double"), 6)
          .as("p_b_given_a"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** MAD-based daily revenue anomaly gate — the robust twin of
    * `ev_hourly_anomaly`'s z-scores (a single whale day inflates a
    * mean/σ gate into silence; medians shrug): per day, the deviation
    * from the median daily revenue and the alarm at deviation >
    * 3×MAD. Medians are DISCRETE order statistics (the element at
    * ceil(m/2) of the sorted list — funnelLatency's exact-BIGINT
    * discipline, no interpolation ulps) over the CALENDAR-BOUNDED
    * daily table, so the two collect-sort passes are aggregate-sized;
    * the raw feed only ever sees one combinable groupBy. All
    * comparisons exact integer cents. */
  def anomalyMad(s: SparkSession, dir: String): DataFrame =
    anomalyMadOf(Tables.events(s, dir))

  /** The synthetic feed has no revenue spikes — the spec injects one
    * through this seam to prove the alarm fires. */
  private[graft] def anomalyMadOf(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg((sum(dec2(col("value"))) * lit(100)).cast("long").as("rev_cents"))
    def discreteMedian(c: Column): Column =
      element_at(array_sort(collect_list(c)),
        expr(s"(count(1) + 1) div 2").cast("int"))
    val med = daily.agg(discreteMedian(col("rev_cents")).as("med_cents"))
    val withMed = daily.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("rev_cents") - col("med_cents")))
    val mad = withMed.agg(discreteMedian(col("dev")).as("mad_cents"))
    withMed.crossJoin(broadcast(mad))
      .select(col("day"),
        round(col("rev_cents").cast("double") / lit(100.0), 2)
          .as("day_revenue"),
        round(col("med_cents").cast("double") / lit(100.0), 2)
          .as("median_revenue"),
        round(col("dev").cast("double") / lit(100.0), 2).as("deviation"),
        round(col("mad_cents").cast("double") / lit(100.0), 2).as("mad"),
        (col("dev") > lit(3L) * col("mad_cents")).as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Frequency-capping audit — the over-exposure report an ads server
    * tunes its cap from: per (campaign, user, day), view counts; per
    * campaign, how many user-days exceeded the cap (3/day), how many
    * impressions the cap would have saved, and the waste fraction.
    * Two combinable aggregates — (campaign, user, day) then campaign —
    * one scan, integer-exact except the one rounded division. */
  def frequencyCapping(s: SparkSession, dir: String): DataFrame = {
    val cap = 3L
    val campaign =
      get_json_object(col("props"), "$.k").cast("int") % lit(10)
    Tables.events(s, dir)
      .filter(col("event_type") === "view")
      .withColumn("campaign", campaign)
      .groupBy(col("campaign"), col("user_id"),
        col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_views"))
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_user_days"),
        sum(col("n_views")).as("n_impressions"),
        count(when(col("n_views") > cap, 1)).as("n_capped_user_days"),
        coalesce(sum(when(col("n_views") > cap, col("n_views") - cap)),
          lit(0L)).as("n_wasted"))
      .withColumn("waste_fraction",
        round(col("n_wasted").cast("double")
          / col("n_impressions").cast("double"), 6))
      .orderBy(col("campaign"))
  }

  /** Attribution-window sweep — the lookback-tuning artifact behind
    * `ev_attribution`: for each candidate window (15m / 1h / 6h / 24h),
    * how many purchases have ANY prior click within the window, and
    * the conversion coverage that window buys. The click→purchase
    * match is ONE user-keyed join with a time-range predicate (the
    * attribution shape); the 4-window sweep is a bounded explode over
    * the matched gap — no per-window rescan. */
  def conversionWindows(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
    // per purchase: the smallest click gap within 24h (one join pass)
    val gaps = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_us") <= col("p_us") &&
        col("c_us") >= col("p_us") - lit(86400000000L))
      .groupBy(col("purchase_id"))
      .agg(min(col("p_us") - col("c_us")).as("best_gap_us"))
    val windows = Seq(
      ("15m", 900000000L), ("1h", 3600000000L),
      ("6h", 21600000000L), ("24h", 86400000000L))
    val nPurch = purchases.groupBy().agg(count(lit(1)).as("n_purchases"))
    val swept = gaps.select(explode(array(windows.map { case (lbl, us) =>
      struct(lit(lbl).as("window_label"), lit(us).as("window_us"),
        (col("best_gap_us") <= us).as("hit"))
    }: _*)).as("w"))
      .groupBy(col("w.window_label").as("window_label"),
        col("w.window_us").as("window_us"))
      .agg(count(when(col("w.hit"), 1)).as("n_attributed"))
    swept.crossJoin(broadcast(nPurch))
      .select(col("window_label"), col("window_us"),
        col("n_attributed"), col("n_purchases"),
        round(col("n_attributed").cast("double")
          / col("n_purchases").cast("double"), 6).as("coverage"))
      .orderBy(col("window_us"))
  }

  /** Churn-label generation — the supervised-label table a retention
    * model trains on: per (user, active week), whether the user is
    * seen again in the NEXT calendar week (label 0) or goes silent
    * (label 1, churn-at-week), rolled up to the weekly churn-rate
    * report. The week grid is (user, week) DISTINCT — one combinable
    * exchange — and "seen next week" is a self equi-join on
    * (user, week+7d): linear, gap-correct (a user active in weeks 1
    * and 3 churns at 1), no window anywhere. The LAST observed week is
    * excluded from the report — its future is unobserved, and leaving
    * it in would fabricate 100% churn. */
  def churnLabels(s: SparkSession, dir: String): DataFrame =
    churnLabelsOf(Tables.events(s, dir))

  /** Seam for the spec: the dense synthetic feed may never churn, so
    * the spec injects a user with a gap week to prove the label-1 and
    * gap-correctness paths. */
  private[graft] def churnLabelsOf(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val next = weeks.select(col("user_id"),
      date_sub(col("week"), 7).as("week"), lit(1).as("seen_next"))
      .distinct()
    val maxWeek = weeks.agg(max(col("week")).as("max_week"))
    weeks.join(next, Seq("user_id", "week"), "left")
      .crossJoin(broadcast(maxWeek))
      .filter(col("week") < col("max_week"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active_users"),
        count(when(col("seen_next").isNull, 1)).as("n_churned"))
      .withColumn("churn_rate",
        round(col("n_churned").cast("double")
          / col("n_active_users").cast("double"), 6))
      .orderBy(col("week"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_churn_labels" -> (churnLabels _),
    "ev_frequency_capping" -> (frequencyCapping _),
    "ev_conversion_windows" -> (conversionWindows _),
    "ev_anomaly_mad" -> (anomalyMad _),
    "ev_cooccurrence_lift" -> (cooccurrenceLift _),
    "ev_cusum_drift" -> (cusumDrift _),
    "ev_power_analysis" -> (powerAnalysis _),
    "ev_forecast_ses" -> (forecastSes _),
    "ev_markov_stationary" -> (markovStationary _),
    "ev_ab_srm_check" -> (abSrmCheck _),
    "ev_inactivity_gaps" -> (inactivityGaps _),
    "ev_cohort_ltv" -> (cohortLtv _),
    "ev_bot_detection" -> (botDetection _),
    "ev_tumbling_window" -> (tumblingWindow _),
    "ev_sessionize" -> (sessionize _),
    "ev_session_stats" -> (sessionStats _),
    "ev_funnel" -> (funnel _),
    "ev_funnel_latency" -> (funnelLatency _),
    "ev_attribution" -> (attribution _),
    "ev_attribution_multi" -> (attributionMulti _),
    "ev_attribution_decay" -> (attributionDecay _),
    "ev_feature_snapshot" -> (featureSnapshot _),
    "ev_forecast_baseline" -> (forecastBaseline _),
    "ev_type_pivot" -> (typePivot _),
    "ev_new_vs_returning" -> (newVsReturning _),
    "ev_seasonality" -> (seasonality _),
    "ev_lag_features" -> (lagFeatures _),
    "ev_retention" -> (retention _),
    "ev_campaign_stats" -> (campaignStats _),
    "ev_dau_wau" -> (dauWau _),
    "ev_hourly_anomaly" -> (hourlyAnomaly _),
    "ev_session_window" -> (sessionWindow _),
    "ev_topk_heavy_hitters" -> (topkHeavyHitters _),
    "ev_transition_matrix" -> (transitionMatrix _),
    "ev_path_topk" -> (pathTopk _),
    "ev_ab_significance" -> (abSignificance _),
    "ev_rolling_revenue" -> (rollingRevenue _),
    "ev_rfm_segments" -> (rfmSegments _))

  val oracles: Map[String, String] = Map(
    // (user, week) distinct + a self equi-join on week+7d; the last
    // week is censored in both engines
    "ev_churn_labels" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |n AS (
        |  SELECT DISTINCT user_id, week - 7 AS week, 1 AS seen_next
        |  FROM w),
        |mx AS (SELECT MAX(week) AS max_week FROM w)
        |SELECT w.week, COUNT(*) AS n_active_users,
        |  COUNT(CASE WHEN n.seen_next IS NULL THEN 1 END) AS n_churned,
        |  ROUND(CAST(COUNT(CASE WHEN n.seen_next IS NULL THEN 1 END)
        |      AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS churn_rate
        |FROM w LEFT JOIN n ON w.user_id = n.user_id AND w.week = n.week
        |CROSS JOIN mx
        |WHERE w.week < max_week
        |GROUP BY w.week ORDER BY w.week""".stripMargin,
    // two combinable aggregates, integer cap arithmetic
    "ev_frequency_capping" ->
      """WITH ud AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |      AS campaign,
        |    user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_views
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2, 3)
        |SELECT campaign, COUNT(*) AS n_user_days,
        |  CAST(SUM(n_views) AS BIGINT) AS n_impressions,
        |  COUNT(CASE WHEN n_views > 3 THEN 1 END) AS n_capped_user_days,
        |  CAST(COALESCE(SUM(CASE WHEN n_views > 3 THEN n_views - 3 END),
        |    0) AS BIGINT) AS n_wasted,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN n_views > 3
        |        THEN n_views - 3 END), 0) AS DOUBLE)
        |    / CAST(SUM(n_views) AS DOUBLE), 6) AS waste_fraction
        |FROM ud GROUP BY campaign ORDER BY campaign""".stripMargin,
    // one user-keyed range join → best gap per purchase → bounded
    // 4-window sweep
    "ev_conversion_windows" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |g AS (
        |  SELECT p.purchase_id, MIN(p.p_us - c.c_us) AS best_gap_us
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 86400000000
        |  GROUP BY p.purchase_id),
        |n AS (SELECT COUNT(*) AS n_purchases FROM p),
        |w AS (SELECT * FROM (VALUES
        |  ('15m', CAST(900000000 AS BIGINT)),
        |  ('1h', CAST(3600000000 AS BIGINT)),
        |  ('6h', CAST(21600000000 AS BIGINT)),
        |  ('24h', CAST(86400000000 AS BIGINT)))
        |  AS w(window_label, window_us)),
        |s AS (
        |  SELECT window_label, window_us,
        |    COUNT(CASE WHEN best_gap_us <= window_us THEN 1 END)
        |      AS n_attributed
        |  FROM w CROSS JOIN g GROUP BY window_label, window_us)
        |SELECT window_label, window_us, n_attributed, n_purchases,
        |  ROUND(CAST(n_attributed AS DOUBLE)
        |    / CAST(n_purchases AS DOUBLE), 6) AS coverage
        |FROM s CROSS JOIN n ORDER BY window_us""".stripMargin,
    // discrete order-statistic medians over the bounded daily table;
    // exact integer cents throughout, alarm threshold integer-exact
    "ev_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS rev_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (
        |  SELECT list_sort(list(rev_cents))[
        |    CAST((COUNT(*) + 1) // 2 AS INT)] AS med_cents FROM daily),
        |d AS (
        |  SELECT daily.*, med_cents,
        |    abs(rev_cents - med_cents) AS dev
        |  FROM daily, m),
        |md AS (
        |  SELECT list_sort(list(dev))[
        |    CAST((COUNT(*) + 1) // 2 AS INT)] AS mad_cents FROM d)
        |SELECT day,
        |  ROUND(CAST(rev_cents AS DOUBLE) / 100.0, 2) AS day_revenue,
        |  ROUND(CAST(med_cents AS DOUBLE) / 100.0, 2) AS median_revenue,
        |  ROUND(CAST(dev AS DOUBLE) / 100.0, 2) AS deviation,
        |  ROUND(CAST(mad_cents AS DOUBLE) / 100.0, 2) AS mad,
        |  dev > 3 * mad_cents AS is_anomaly
        |FROM d, md ORDER BY day""".stripMargin,
    // per-user indicator grid → one-row scalar pass → 10-pair grid;
    // identical float chain for lift and the conditional rate
    "ev_cooccurrence_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS has_click,
        |    MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS has_error,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS has_purchase,
        |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS has_signup,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS has_view
        |  FROM events GROUP BY user_id),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(has_click) AS BIGINT) AS n_click,
        |    CAST(SUM(has_error) AS BIGINT) AS n_error,
        |    CAST(SUM(has_purchase) AS BIGINT) AS n_purchase,
        |    CAST(SUM(has_signup) AS BIGINT) AS n_signup,
        |    CAST(SUM(has_view) AS BIGINT) AS n_view,
        |    CAST(SUM(has_click * has_error) AS BIGINT) AS nb_click_error,
        |    CAST(SUM(has_click * has_purchase) AS BIGINT)
        |      AS nb_click_purchase,
        |    CAST(SUM(has_click * has_signup) AS BIGINT)
        |      AS nb_click_signup,
        |    CAST(SUM(has_click * has_view) AS BIGINT) AS nb_click_view,
        |    CAST(SUM(has_error * has_purchase) AS BIGINT)
        |      AS nb_error_purchase,
        |    CAST(SUM(has_error * has_signup) AS BIGINT)
        |      AS nb_error_signup,
        |    CAST(SUM(has_error * has_view) AS BIGINT) AS nb_error_view,
        |    CAST(SUM(has_purchase * has_signup) AS BIGINT)
        |      AS nb_purchase_signup,
        |    CAST(SUM(has_purchase * has_view) AS BIGINT)
        |      AS nb_purchase_view,
        |    CAST(SUM(has_signup * has_view) AS BIGINT) AS nb_signup_view
        |  FROM u),
        |g AS (
        |  SELECT n_users, p.* FROM t, LATERAL (VALUES
        |    ('click', 'error', n_click, n_error, nb_click_error),
        |    ('click', 'purchase', n_click, n_purchase, nb_click_purchase),
        |    ('click', 'signup', n_click, n_signup, nb_click_signup),
        |    ('click', 'view', n_click, n_view, nb_click_view),
        |    ('error', 'purchase', n_error, n_purchase, nb_error_purchase),
        |    ('error', 'signup', n_error, n_signup, nb_error_signup),
        |    ('error', 'view', n_error, n_view, nb_error_view),
        |    ('purchase', 'signup', n_purchase, n_signup,
        |      nb_purchase_signup),
        |    ('purchase', 'view', n_purchase, n_view, nb_purchase_view),
        |    ('signup', 'view', n_signup, n_view, nb_signup_view))
        |    AS p(type_a, type_b, n_a, n_b, n_both))
        |SELECT type_a, type_b, n_a, n_b, n_both,
        |  ROUND(CAST(n_both AS DOUBLE) * CAST(n_users AS DOUBLE)
        |    / CAST(NULLIF(n_a * n_b, 0) AS DOUBLE), 6) AS lift,
        |  ROUND(CAST(n_both AS DOUBLE)
        |    / CAST(NULLIF(n_a, 0) AS DOUBLE), 6) AS p_b_given_a
        |FROM g ORDER BY type_a, type_b""".stripMargin,
    // integer-cents CUSUM: every window value BIGINT-exact, the two
    // final divisions the only float steps (identical operand order)
    "ev_cusum_drift" ->
      """WITH daily AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |      AS campaign,
        |    CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS rev_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |sc AS (
        |  SELECT campaign, day,
        |    CAST(row_number() OVER wo AS BIGINT) AS t,
        |    SUM(rev_cents) OVER wo AS prefix_cents,
        |    COUNT(*) OVER wa AS n_days,
        |    SUM(rev_cents) OVER wa AS total_cents
        |  FROM daily
        |  WINDOW wo AS (PARTITION BY campaign ORDER BY day),
        |    wa AS (PARTITION BY campaign)),
        |s2 AS (SELECT *,
        |  n_days * prefix_cents - t * total_cents AS s_scaled FROM sc),
        |s3 AS (SELECT *,
        |  MAX(ABS(s_scaled)) OVER (PARTITION BY campaign) AS max_abs
        |  FROM s2)
        |SELECT campaign, MAX(n_days) AS n_days,
        |  ROUND(CAST(MAX(total_cents) AS DOUBLE) / 100.0, 2)
        |    AS total_revenue,
        |  ROUND(CAST(MAX(s_scaled) - MIN(s_scaled) AS DOUBLE) / 100.0
        |    / CAST(MAX(n_days) AS DOUBLE), 6) AS drift_stat,
        |  MIN(CASE WHEN ABS(s_scaled) = max_abs THEN day END)
        |    AS changepoint_day
        |FROM s3 GROUP BY campaign ORDER BY campaign""".stripMargin,
    // identical hash assignment and the identical float chain for the
    // required-n formula (the z-sum squared is a shared literal)
    "ev_power_analysis" ->
      """WITH u AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |      AS campaign,
        |    user_id,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
        |      AS converted
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT *,
        |  substr(md5('assign:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |    AS in_a FROM u),
        |g AS (
        |  SELECT campaign,
        |    COUNT(CASE WHEN in_a THEN 1 END) AS n_a,
        |    COUNT(CASE WHEN NOT in_a THEN 1 END) AS n_b,
        |    COUNT(CASE WHEN in_a AND converted THEN 1 END) AS conv_a,
        |    COUNT(CASE WHEN NOT in_a AND converted THEN 1 END) AS conv_b
        |  FROM a GROUP BY campaign),
        |p AS (SELECT *,
        |  CAST(conv_a AS DOUBLE) / CAST(NULLIF(n_a, 0) AS DOUBLE) AS pa,
        |  CAST(conv_b AS DOUBLE) / CAST(NULLIF(n_b, 0) AS DOUBLE) AS pb
        |  FROM g),
        |q AS (SELECT *,
        |  CASE WHEN pa - pb <> 0.0 THEN
        |    CAST(CEIL(7.8488784725122245
        |      * (pa * (1.0 - pa) + pb * (1.0 - pb))
        |      / ((pa - pb) * (pa - pb))) AS BIGINT) END AS n_required
        |  FROM p)
        |SELECT campaign, n_a, n_b, conv_a, conv_b,
        |  ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
        |  ROUND(pa - pb, 6) + 0.0 AS delta, n_required,
        |  n_a >= n_required AND n_b >= n_required AS powered
        |FROM q ORDER BY campaign""".stripMargin,
    // dyadic-weight SES: BIGINT weight sums, one exactly-rounded
    // division per output value
    "ev_forecast_ses" ->
      """WITH daily AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |      AS campaign,
        |    CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS rev_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY campaign
        |    ORDER BY day DESC) AS BIGINT) AS r
        |  FROM daily),
        |lastw AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY campaign)
        |    AS n_days_used
        |  FROM rk WHERE r <= 16),
        |wt AS (SELECT *,
        |  n_days_used - r + 1 AS t,
        |  CASE WHEN n_days_used - r + 1 = 1 THEN CAST(2 AS BIGINT)
        |    ELSE CAST(1 AS BIGINT)
        |      << CAST(n_days_used - r AS INT) END AS w
        |  FROM lastw),
        |g AS (
        |  SELECT campaign, MAX(n_days_used) AS n_days_used,
        |    MAX(day) AS last_day,
        |    SUM(w * rev_cents) AS scaled,
        |    MAX(CASE WHEN r = 1 THEN rev_cents END) AS last_cents,
        |    CAST(1 AS BIGINT) << CAST(MAX(n_days_used) AS INT) AS denom
        |  FROM wt GROUP BY campaign)
        |SELECT campaign, n_days_used, last_day,
        |  ROUND(CAST(last_cents AS DOUBLE) / 100.0, 2) AS last_revenue,
        |  ROUND(CAST(scaled AS DOUBLE) / CAST(denom AS DOUBLE) / 100.0, 6)
        |    AS ses_level,
        |  ROUND(CAST(scaled AS DOUBLE) / CAST(denom AS DOUBLE) / 100.0
        |    - CAST(last_cents AS DOUBLE) / 100.0, 6) + 0.0 AS residual
        |FROM g ORDER BY campaign""".stripMargin,
    // identical hash split (single hex char string compare) and
    // chi-square arithmetic, term for term
    "ev_ab_srm_check" ->
      """WITH a AS (
        |  SELECT DISTINCT
        |    CAST(json_extract_string(props, '$.k') AS INT) % 10
        |      AS campaign,
        |    user_id,
        |    substr(md5('assign:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      AS in_a
        |  FROM events),
        |g AS (
        |  SELECT campaign,
        |    COUNT(CASE WHEN in_a THEN 1 END) AS n_a,
        |    COUNT(CASE WHEN NOT in_a THEN 1 END) AS n_b
        |  FROM a GROUP BY campaign),
        |x AS (SELECT campaign, n_a, n_b,
        |  CAST(n_a + n_b AS DOUBLE) / 2.0 AS e FROM g)
        |SELECT campaign, n_a, n_b,
        |  ROUND((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |    + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e, 6)
        |    AS chi2,
        |  COALESCE(((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |    + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e)
        |    > 3.841459, false) AS srm_alarm
        |FROM x ORDER BY campaign""".stripMargin,
    // stationary vector from the landed parquet; empirical shares and
    // the drift recomputed with identical float steps
    "ev_markov_stationary" ->
      s"""WITH st AS (SELECT event_type, stationary
        |  FROM '${markovDir("__SFDIR__")}/*.parquet'),
        |emp AS (SELECT event_type, COUNT(*) AS n_events
        |  FROM events GROUP BY event_type),
        |tot AS (SELECT SUM(n_events) AS tot FROM emp)
        |SELECT e.event_type, e.n_events,
        |  ROUND(CAST(e.n_events AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |    AS empirical_share,
        |  ROUND(COALESCE(stationary, 0.0), 6) AS stationary_share,
        |  ROUND(COALESCE(stationary, 0.0)
        |    - CAST(e.n_events AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0
        |    AS delta
        |FROM emp e CROSS JOIN tot LEFT JOIN st USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "ev_inactivity_gaps" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (
        |  SELECT user_id, date_diff('day',
        |    lag(day) OVER (PARTITION BY user_id ORDER BY day), day)
        |    AS gap_days
        |  FROM days)
        |SELECT CAST(gap_days AS BIGINT) AS gap_days, COUNT(*) AS n_gaps,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM g WHERE gap_days IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "ev_cohort_ltv" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id),
        |per AS (
        |  SELECT cohort_day,
        |    CAST(date_diff('day', cohort_day, CAST(e.ts AS DATE)) AS INT)
        |      AS day_offset,
        |    COUNT(DISTINCT e.user_id) AS n_buyers,
        |    COUNT(*) AS n_purchases,
        |    SUM(CAST(e.value AS DECIMAL(18,2))) AS rev_dec
        |  FROM events e JOIN cohort c USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, n_buyers, n_purchases,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER (PARTITION BY cohort_day
        |    ORDER BY day_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS cum_revenue
        |FROM per ORDER BY cohort_day, day_offset""".stripMargin,
    "ev_bot_detection" ->
      """WITH gaps AS (
        |  SELECT user_id, ts, event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |agg AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    COUNT(DISTINCT event_type) AS n_types,
        |    MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us,
        |    MIN(gap_us) AS min_gap_us,
        |    COUNT(CASE WHEN gap_us < 1000000 THEN 1 END) AS n_subsec_gaps
        |  FROM gaps GROUP BY user_id)
        |SELECT user_id, n_events, n_types, span_us, min_gap_us,
        |  n_subsec_gaps,
        |  (n_events >= 20 AND (n_subsec_gaps * 5 >= n_events * 2
        |    OR n_types = 1)) AS is_bot
        |FROM agg""".stripMargin,
    "ev_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    "ev_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    // the sessionize CTE plus the depth histogram
    "ev_session_stats" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_id
        |  FROM flagged),
        |per AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |    epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT n_events AS session_depth, COUNT(*) AS n_sessions,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  ROUND(CAST(SUM(duration_us) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS avg_duration_us
        |FROM per GROUP BY n_events ORDER BY session_depth""".stripMargin,
    "ev_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        |    JOIN v ON e.user_id = v.user_id
        |    WHERE e.event_type = 'click' AND e.ts > v.t_view
        |    GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        |    JOIN c ON e.user_id = c.user_id
        |    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |    GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "ev_funnel_latency" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        |    JOIN v ON e.user_id = v.user_id
        |    WHERE e.event_type = 'click' AND e.ts > v.t_view
        |    GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        |    JOIN c ON e.user_id = c.user_id
        |    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |    GROUP BY e.user_id),
        |f AS (SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |  FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  LEFT JOIN p ON v.user_id = p.user_id)
        |SELECT date_trunc('week', t_view) AS cohort_week,
        |  COUNT(*) AS n_viewed, COUNT(vc) AS n_clicked,
        |  COUNT(cp) AS n_purchased,
        |  CASE WHEN COUNT(vc) = 0 THEN NULL ELSE
        |    (array_agg(vc ORDER BY vc) FILTER (WHERE vc IS NOT NULL))
        |      [CAST(ceil(0.5 * CAST(COUNT(vc) AS DOUBLE)) AS INT)]
        |  END AS p50_view_to_click_us,
        |  CASE WHEN COUNT(vc) = 0 THEN NULL ELSE
        |    (array_agg(vc ORDER BY vc) FILTER (WHERE vc IS NOT NULL))
        |      [CAST(ceil(0.9 * CAST(COUNT(vc) AS DOUBLE)) AS INT)]
        |  END AS p90_view_to_click_us,
        |  CASE WHEN COUNT(cp) = 0 THEN NULL ELSE
        |    (array_agg(cp ORDER BY cp) FILTER (WHERE cp IS NOT NULL))
        |      [CAST(ceil(0.5 * CAST(COUNT(cp) AS DOUBLE)) AS INT)]
        |  END AS p50_click_to_purchase_us,
        |  CASE WHEN COUNT(cp) = 0 THEN NULL ELSE
        |    (array_agg(cp ORDER BY cp) FILTER (WHERE cp IS NOT NULL))
        |      [CAST(ceil(0.9 * CAST(COUNT(cp) AS DOUBLE)) AS INT)]
        |  END AS p90_click_to_purchase_us
        |FROM (SELECT t_view,
        |    epoch_us(t_click) - epoch_us(t_view) AS vc,
        |    epoch_us(t_purchase) - epoch_us(t_click) AS cp
        |  FROM f)
        |GROUP BY date_trunc('week', t_view)
        |ORDER BY cohort_week""".stripMargin,
    "ev_feature_snapshot" ->
      """WITH feats AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS n_purchases,
        |    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
        |      AS spend,
        |    epoch_us(TIMESTAMP '2024-01-20') - epoch_us(MAX(ts))
        |      AS recency_us,
        |    COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days
        |  FROM events WHERE ts < TIMESTAMP '2024-01-20'
        |  GROUP BY user_id),
        |lbl AS (
        |  SELECT DISTINCT user_id, 1 AS label FROM events
        |  WHERE event_type = 'purchase'
        |    AND ts >= TIMESTAMP '2024-01-20'
        |    AND ts < TIMESTAMP '2024-01-27')
        |SELECT f.user_id, n_events, n_views, n_clicks, n_purchases,
        |  spend, recency_us, n_active_days,
        |  COALESCE(label, 0) AS label
        |FROM feats f LEFT JOIN lbl USING (user_id)""".stripMargin,
    "ev_type_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "ev_seasonality" ->
      """SELECT isodow(ts) AS dow, hour(ts) AS hod,
        |  COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    AS n_purchases,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
        |    AS revenue
        |FROM events GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin,
    "ev_new_vs_returning" ->
      """WITH fs AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
        |SELECT day,
        |  COUNT(CASE WHEN day = first_day THEN 1 END) AS new_users,
        |  COUNT(CASE WHEN day > first_day THEN 1 END) AS returning_users,
        |  COUNT(*) AS dau
        |FROM d JOIN fs USING (user_id)
        |GROUP BY day ORDER BY day""".stripMargin,
    "ev_forecast_baseline" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT d.day, d.n_events, f.n_events AS forecast_events,
        |  abs(d.n_events - f.n_events) AS abs_err,
        |  ROUND(CAST(abs(d.n_events - f.n_events) AS DOUBLE)
        |    / CAST(d.n_events AS DOUBLE), 6) AS ape
        |FROM daily d JOIN daily f ON d.day = f.day + INTERVAL 7 DAY
        |ORDER BY d.day""".stripMargin,
    // same dyadic weight ladder 2^(4-k): exact under any accumulation
    // order in both engines
    "ev_attribution_decay" ->
      """WITH t AS (
        |  SELECT p.event_id AS purchase_id, p.user_id,
        |    c.event_id AS click_id, c.ts AS click_ts, p.value,
        |    epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |  FROM events p JOIN events c ON p.user_id = c.user_id
        |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR),
        |k AS (
        |  SELECT *, least(gap_us // 900000000, 4) AS decay_bucket FROM t),
        |w AS (
        |  SELECT *,
        |    ([16, 8, 4, 2, 1])[CAST(decay_bucket AS INT) + 1] AS w_int,
        |    row_number() OVER (PARTITION BY user_id, purchase_id
        |      ORDER BY click_ts, click_id) AS position
        |  FROM k),
        |s AS (
        |  SELECT *, SUM(w_int) OVER (PARTITION BY user_id, purchase_id)
        |    AS sw
        |  FROM w)
        |SELECT purchase_id, user_id, click_id,
        |  CAST(position AS BIGINT) AS position, gap_us,
        |  CAST(decay_bucket AS BIGINT) AS decay_bucket,
        |  ROUND(CAST(w_int AS DOUBLE) / CAST(sw AS DOUBLE), 6) AS share,
        |  ROUND(CAST(w_int AS DOUBLE) / CAST(sw AS DOUBLE)
        |    * CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 6) AS credit
        |FROM s""".stripMargin,
    "ev_lag_features" ->
      """SELECT event_id, user_id, event_type,
        |  lag(event_type) OVER w AS prev_type,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |  COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |    >= 1800000000, TRUE) AS is_session_start
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "ev_attribution_multi" ->
      """WITH t AS (
        |  SELECT p.event_id AS purchase_id, p.user_id,
        |    c.event_id AS click_id,
        |    CAST(row_number() OVER w AS BIGINT) AS position,
        |    COUNT(*) OVER (PARTITION BY p.user_id, p.event_id)
        |      AS n_touches,
        |    CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS v
        |  FROM events p JOIN events c
        |    ON p.user_id = c.user_id
        |    AND p.event_type = 'purchase' AND c.event_type = 'click'
        |    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |  WINDOW w AS (PARTITION BY p.user_id, p.event_id
        |    ORDER BY c.ts, c.event_id)),
        |sh AS (
        |  SELECT *, CASE WHEN n_touches = 1 THEN 1.0
        |    WHEN n_touches = 2 THEN 0.5
        |    WHEN position = 1 THEN 0.4
        |    WHEN position = n_touches THEN 0.4
        |    ELSE 0.2 / (CAST(n_touches AS DOUBLE) - 2.0) END AS s
        |  FROM t)
        |SELECT purchase_id, user_id, click_id, position, n_touches,
        |  ROUND(s, 6) AS share, ROUND(s * v, 6) AS credit
        |FROM sh""".stripMargin,
    "ev_attribution" ->
      """WITH touch AS (
        |  SELECT *, CASE WHEN event_type = 'click' THEN event_id END
        |    AS click_id
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), attributed AS (
        |  SELECT *, last_value(click_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS attributed_click_id
        |  FROM touch)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value,
        |  attributed_click_id
        |FROM attributed WHERE event_type = 'purchase'""".stripMargin,
    "ev_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day
        |  FROM events)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, act_day) AS INT) AS day_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY cohort_day, date_diff('day', cohort_day, act_day)""".stripMargin,
    "ev_dau_wau" ->
      """WITH daily AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |anchors AS (SELECT DISTINCT day AS anchor FROM daily),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
        |  FROM daily GROUP BY day),
        |wau AS (
        |  SELECT a.anchor, COUNT(DISTINCT d.user_id) AS wau
        |  FROM anchors a JOIN daily d
        |    ON d.day BETWEEN a.anchor - 6 AND a.anchor
        |  GROUP BY a.anchor)
        |SELECT dau.day, dau.dau, wau.wau
        |FROM dau JOIN wau ON dau.day = wau.anchor""".stripMargin,
    "ev_hourly_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
        |  FROM events GROUP BY date_trunc('hour', ts)),
        |stats AS (
        |  SELECT hour, n,
        |    COUNT(n) OVER w AS w_cnt,
        |    SUM(n) OVER w AS sn,
        |    SUM(n * n) OVER w AS snsq
        |  FROM hourly
        |  WINDOW w AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |scored AS (
        |  SELECT hour, n,
        |    CAST(sn AS DOUBLE) / CAST(w_cnt AS DOUBLE) AS mean_24h,
        |    (CAST(snsq AS DOUBLE)
        |      - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(w_cnt AS DOUBLE))
        |      / (CAST(w_cnt AS DOUBLE) - 1.0) AS var_24h
        |  FROM stats WHERE w_cnt = 24)
        |SELECT hour, n, ROUND(mean_24h, 6) AS mean_24h,
        |  ROUND((CAST(n AS DOUBLE) - mean_24h)
        |    / NULLIF(CASE WHEN var_24h > 0 THEN sqrt(var_24h) END, 0.0), 6) AS z,
        |  COALESCE(abs((CAST(n AS DOUBLE) - mean_24h)
        |    / NULLIF(CASE WHEN var_24h > 0 THEN sqrt(var_24h) END, 0.0)) > 3.0,
        |    false) AS is_anomaly
        |FROM scored""".stripMargin,
    "ev_campaign_stats" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS campaign,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        |  ROUND(CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE)
        |    / CAST(NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS DOUBLE), 6) AS ctr,
        |  ROUND(CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
        |    / CAST(NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS DOUBLE), 6) AS cvr,
        |  CAST(SUM(CASE WHEN event_type = 'purchase'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue
        |FROM events
        |GROUP BY CAST(json_extract_string(props, '$.k') AS INT) % 10""".stripMargin,
    // session_window semantics: an event's window is [ts, ts+gap) and
    // sessions merge only on strict overlap, so an exactly-gap-apart
    // event starts a NEW session (>=, where ev_sessionize uses >); the
    // window end is last event + gap
    "ev_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS window_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "ev_rolling_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS day_rev_dec
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY CAST(ts AS DATE)),
        |numbered AS (
        |  SELECT day, day_rev_dec,
        |    date_diff('day', DATE '1970-01-01', day) AS day_num
        |  FROM daily)
        |SELECT day,
        |  CAST(day_rev_dec AS DOUBLE) AS day_revenue,
        |  CAST(SUM(day_rev_dec) OVER (ORDER BY day_num
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rolling_7d_revenue
        |FROM numbered ORDER BY day""".stripMargin,
    "ev_rfm_segments" ->
      """WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS a FROM events),
        |per AS (
        |  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS monetary_dec
        |  FROM events GROUP BY user_id),
        |scored AS (
        |  SELECT user_id, frequency, monetary_dec,
        |    date_diff('day', last_day, a) AS recency_days
        |  FROM per, anchor),
        |tiled AS (
        |  SELECT monetary_dec,
        |    ntile(4) OVER (ORDER BY recency_days, user_id) AS r_q,
        |    ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
        |    ntile(4) OVER (ORDER BY monetary_dec DESC, user_id) AS m_q
        |  FROM scored)
        |SELECT CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
        |    || CAST(m_q AS VARCHAR) AS rfm_segment,
        |  COUNT(*) AS n_users,
        |  CAST(SUM(monetary_dec) AS DOUBLE) AS segment_revenue
        |FROM tiled GROUP BY 1""".stripMargin,
    "ev_ab_significance" ->
      """WITH per AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS campaign,
        |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks
        |  FROM events
        |  GROUP BY CAST(json_extract_string(props, '$.k') AS INT) % 10),
        |tot AS (SELECT SUM(views) AS t_views, SUM(clicks) AS t_clicks FROM per),
        |j AS (
        |  SELECT campaign, views, clicks,
        |    CAST(t_views - views AS DOUBLE) AS r_views,
        |    CAST(t_clicks - clicks AS DOUBLE) AS r_clicks
        |  FROM per, tot),
        |sc AS (
        |  SELECT campaign, views, clicks,
        |    CAST(clicks AS DOUBLE) / NULLIF(CAST(views AS DOUBLE), 0.0) AS p1,
        |    r_clicks / NULLIF(r_views, 0.0) AS p2,
        |    (CAST(clicks AS DOUBLE) + r_clicks)
        |      / NULLIF(CAST(views AS DOUBLE) + r_views, 0.0) AS p_pool,
        |    r_views
        |  FROM j),
        |vc AS (
        |  SELECT campaign, views, clicks, p1, p2,
        |    p_pool * (1.0 - p_pool)
        |      * (1.0 / NULLIF(CAST(views AS DOUBLE), 0.0)
        |         + 1.0 / NULLIF(r_views, 0.0)) AS v
        |  FROM sc),
        |zc AS (
        |  SELECT campaign, views, clicks, p1,
        |    (p1 - p2) / NULLIF(CASE WHEN v > 0 THEN sqrt(v) END, 0.0) AS z
        |  FROM vc)
        |SELECT campaign, views, clicks, ROUND(p1, 6) AS ctr,
        |  ROUND(z, 6) AS z,
        |  COALESCE(abs(z) > 1.96, false) AS significant_95
        |FROM zc ORDER BY campaign""".stripMargin,
    "ev_path_topk" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t2
        |  FROM events)
        |SELECT event_type || '>' || t1 || '>' || t2 AS path,
        |  COUNT(*) AS n
        |FROM seq WHERE t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "ev_transition_matrix" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, COUNT(*) AS n_transitions
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY n_transitions DESC, from_type, to_type""".stripMargin,
    "ev_topk_heavy_hitters" ->
      """SELECT user_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |COUNT(*) AS n_events
        |FROM events GROUP BY user_id
        |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin)
}
