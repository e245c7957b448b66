package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** As-of (point-in-time) join (SURVEY §2C): for each left row, the latest
  * right row at-or-before (or strictly before) it, per key.
  *
  * Spark has no native as-of join; the scalable formulation is NOT a
  * range join (which explodes into an O(n·m) interval comparison) but a
  * union + one window over the shared key partitioning: tag both sides,
  * sort by (ts, side) inside each key, and carry the last right payload
  * forward with an IGNORE NULLS window. One shuffle, linear work —
  * survives 100 TB where a range join would not.
  */
object AsOf {

  /** Generic as-of join.
    *
    * @param left      left (probe) rows; all its columns are kept
    * @param right     right (state) rows
    * @param keys      equi-join keys present on both sides
    * @param ts        event-time column name present on both sides
    * @param payload   right columns attached to each left row (as
    *                  `asof_<name>`, null when no right row precedes)
    * @param tieBreak  extra right-side ordering columns so equal-ts right
    *                  rows resolve deterministically
    * @param strict    true → right.ts < left.ts; false → right.ts ≤ left.ts
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, payload: Seq[String], tieBreak: Seq[String],
      strict: Boolean = false): DataFrame = {
    val rTagged = right.select(
      (keys :+ ts).map(col) ++ tieBreak.map(col) :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    val lTagged = left.withColumn("__side", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // At equal ts: side order decides ≤ vs <. Non-strict sorts right rows
    // (side 0) before left so the frame (…, -1] still sees them; strict
    // sorts them after. Tie-break columns order equal-ts right rows.
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val order: Seq[Column] =
      (col(ts) +: sideOrder +: tieBreak.map(c =>
        col(c).asc_nulls_first)) :+ lit(1).asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__p", "__side")
      .withColumns(payload.map(p =>
        s"asof_$p" -> col("__asof").getField(p)).toMap)
      .drop("__asof")
  }

  /** Purchase-time state join: every purchase annotated with the user's
    * most recent strictly-prior engagement (any view/click) — the
    * point-in-time feature a bidding model trains on. */
  def evAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("value").cast(DecimalType(18, 2)).cast("double")
          .as("purchase_value"))
    val engagement = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    asofJoin(purchases, engagement,
      keys = Seq("user_id"), ts = "ts",
      payload = Seq("event_id", "event_type", "value"),
      tieBreak = Seq("event_id"), strict = true)
      .select(col("user_id"), col("purchase_id"),
        col("ts").as("purchase_ts"), col("purchase_value"),
        col("asof_event_id"), col("asof_event_type"),
        round(col("asof_value"), 2).as("asof_value"))
  }

  /** As-of join with a staleness tolerance — the production form of the
    * point-in-time feature join: state older than the tolerance is as
    * good as missing (a bid model must not act on an hours-old view).
    * Same linear union+window plan; the right-side event time rides in
    * the carried payload and a post-window predicate nulls out matches
    * older than the tolerance. Staleness is exact epoch-microseconds on
    * both engines — no second-truncation ambiguity. */
  def evAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 3600L * 1000000L // 1 hour
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"))
    val engagement = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"))
    val staleUs = unix_micros(col("ts")) - unix_micros(col("asof_ts"))
    val fresh = col("asof_ts").isNotNull && staleUs <= lit(tolUs)
    asofJoin(purchases, engagement,
      keys = Seq("user_id"), ts = "ts",
      payload = Seq("event_id", "ts"),
      tieBreak = Seq("event_id"), strict = true)
      .select(col("user_id"), col("purchase_id"),
        col("ts").as("purchase_ts"),
        when(fresh, col("asof_event_id")).as("recent_event_id"),
        when(fresh, staleUs).as("staleness_us"))
  }

  /** Nearest-event as-of join — the `direction='nearest'` variant of the
    * point-in-time join (pandas merge_asof's third direction): each left
    * row gets the right row closest in event time in EITHER direction.
    * Backward is non-strict (right.ts ≤ left.ts), forward strict
    * (right.ts > left.ts), so an exact-timestamp match always wins with
    * delta 0; distance ties prefer backward (never act on future state
    * when equally-stale past state exists).
    *
    * Same linear union plan as asofJoin, ONE shuffle: both directional
    * legs ride the same (key, ts, side, tieBreak) sort — a trailing
    * IGNORE NULLS `last` over (…, -1] and a leading `first` over
    * [1, …) — and the winner is chosen by exact epoch-microsecond
    * comparison. Emits `nearest_<payload>` columns plus
    * `nearest_direction` and `nearest_delta_us` (all null when the key
    * has no right rows at all). */
  def asofNearestJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, payload: Seq[String],
      tieBreak: Seq[String]): DataFrame = {
    val rTagged = right.select(
      (keys :+ ts).map(col) ++ tieBreak.map(col) :+
        struct((payload :+ ts).map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    val lTagged = left.withColumn("__side", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // side ASC: equal-ts right rows sort BEFORE left rows, so the
    // backward frame (…, -1] sees them (non-strict ≤) and the forward
    // frame [1, …) correctly excludes them (strict >)
    val order: Seq[Column] =
      (col(ts) +: col("__side").asc +: tieBreak.map(c =>
        col(c).asc_nulls_first)) :+ lit(1).asc
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val dB = unix_micros(col(ts)) - unix_micros(col("__b").getField(ts))
    val dF = unix_micros(col("__f").getField(ts)) - unix_micros(col(ts))
    val pickF = col("__b").isNull || (col("__f").isNotNull && dF < dB)
    unioned
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__n", when(pickF, col("__f")).otherwise(col("__b")))
      .withColumn("nearest_direction",
        when(col("__n").isNull, lit(null).cast("string"))
          .when(pickF, "forward").otherwise(lit("backward")))
      .withColumn("nearest_delta_us", when(pickF, dF).otherwise(dB))
      .withColumns(payload.map(p =>
        s"nearest_$p" -> col("__n").getField(p)).toMap)
      .drop("__p", "__side", "__b", "__f", "__n")
  }

  /** Purchase-time nearest-engagement annotation: every purchase with
    * the engagement event (view/click) closest in time, either side —
    * the feature a post-hoc attribution/quality model trains on when
    * "most recent prior" is too sparse. */
  def evAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"))
    val engagement = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"))
    asofNearestJoin(purchases, engagement,
      keys = Seq("user_id"), ts = "ts",
      payload = Seq("event_id"), tieBreak = Seq("event_id"))
      .select(col("user_id"), col("purchase_id"),
        col("ts").as("purchase_ts"), col("nearest_event_id"),
        col("nearest_direction"), col("nearest_delta_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_asof_join" -> (evAsofJoin _),
    "ev_asof_nearest" -> (evAsofNearest _),
    "ev_asof_tolerance" -> (evAsofTolerance _))

  val oracles: Map[String, String] = Map(
    // side ASC (non-strict backward / strict forward), the mirror of
    // asofNearestJoin's sort; winner chosen by exact epoch-microseconds
    "ev_asof_nearest" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
        |  FROM events WHERE event_type IN ('purchase', 'view', 'click')
        |), joined AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER wb AS b_id,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER wb AS b_ts,
        |    first_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER wf AS f_id,
        |    first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER wf AS f_ts
        |  FROM tagged
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wf AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |), chosen AS (
        |  SELECT user_id, event_id, ts,
        |    (b_ts IS NULL OR (f_ts IS NOT NULL
        |      AND epoch_us(f_ts) - epoch_us(ts)
        |        < epoch_us(ts) - epoch_us(b_ts))) AS pickf,
        |    b_id, b_ts, f_id, f_ts
        |  FROM joined WHERE side = 1)
        |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |  CASE WHEN pickf THEN f_id ELSE b_id END AS nearest_event_id,
        |  CASE WHEN pickf AND f_ts IS NULL THEN NULL
        |       WHEN pickf THEN 'forward' ELSE 'backward' END
        |    AS nearest_direction,
        |  CASE WHEN pickf THEN epoch_us(f_ts) - epoch_us(ts)
        |       ELSE epoch_us(ts) - epoch_us(b_ts) END AS nearest_delta_us
        |FROM chosen""".stripMargin,
    "ev_asof_tolerance" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
        |  FROM events WHERE event_type IN ('purchase', 'view', 'click')
        |), joined AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER w AS asof_event_id,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER w AS asof_ts
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, side DESC, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |  CASE WHEN asof_ts IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(asof_ts) <= 3600000000
        |    THEN asof_event_id END AS recent_event_id,
        |  CASE WHEN asof_ts IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(asof_ts) <= 3600000000
        |    THEN epoch_us(ts) - epoch_us(asof_ts) END AS staleness_us
        |FROM joined WHERE side = 1""".stripMargin,
    "ev_asof_join" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
        |    event_type, value
        |  FROM events WHERE event_type IN ('purchase', 'view', 'click')
        |), joined AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER w AS asof_event_id,
        |    last_value(CASE WHEN side = 0 THEN event_type END IGNORE NULLS)
        |      OVER w AS asof_event_type,
        |    last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
        |      OVER w AS asof_value
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, side DESC, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value,
        |  asof_event_id, asof_event_type, ROUND(asof_value, 2) AS asof_value
        |FROM joined WHERE side = 1""".stripMargin)
}
