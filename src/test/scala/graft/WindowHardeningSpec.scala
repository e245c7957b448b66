package graft

import org.apache.spark.sql.functions._

/** r19 window hardening (verdict item 7): q27_running_share /
  * ev_rolling_revenue / etl_late_arrivals carry TWO-REGIME cumulative/
  * rolling/suffix windows — the original bounded-domain global window
  * under the footer gate, a year-partitioned form past it. The bundled
  * SFs span ~one month, so the oracle never exercises the partitioned
  * regime's boundary context rows / year-offset joins: this spec pins
  * BOTH regimes equal on synthetic feeds that CROSS year boundaries. */
class WindowHardeningSpec extends SparkSpec {

  private def eventsOf(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "value")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        lit(1L).as("user_id"), lit("purchase").as("event_type"),
        col("value"), lit("{}").as("props"))
  }

  test("rolling 7d revenue: regimes agree across Dec 31") {
    val days = Seq(
      "2023-12-26", "2023-12-27", "2023-12-29", "2023-12-31",
      "2024-01-01", "2024-01-02", "2024-01-05", "2024-01-08",
      "2025-01-03")
    val ev = eventsOf(days.zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, s"$d 12:00:00", (i + 1) * 10.0 + 0.25) })
    def run(small: Boolean) =
      operators.Events.rollingRevenueOf(ev, smallDomain = small)
        .collect().map(r => (r.getDate(0).toString, r.getDouble(1),
          r.getDouble(2))).toSeq
    val small = run(true)
    val partitioned = run(false)
    assert(small == partitioned,
      s"regimes disagree:\n small=$small\n part =$partitioned")
    // Jan 1 2024 must see Dec 26-31 2023 (6-day reach across the year)
    val jan1 = partitioned.find(_._1 == "2024-01-01").get
    assert(jan1._3 > jan1._2, "Jan 1 rolling must include the Dec tail")
    // the isolated 2025 day sees only itself
    val iso = partitioned.find(_._1 == "2025-01-03").get
    assert(iso._3 == iso._2)
  }

  test("late-arrival thresholds: regimes agree across years") {
    // descending min_ids across years force cross-year thresholds
    val ev = eventsOf(Seq(
      (500L, "2023-12-30 01:00:00", 1.0),
      (510L, "2023-12-31 01:00:00", 1.0),
      (100L, "2024-01-01 01:00:00", 1.0),
      (120L, "2024-01-02 01:00:00", 1.0),
      (50L, "2025-01-01 01:00:00", 1.0))
      .map { case (id, ts, v) => (id, ts, v) })
    def run(small: Boolean) =
      operators.Etl.lateArrivalsOf(ev, smallDomain = small)
        .collect().map(r => (r.getDate(0).toString, r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val small = run(true)
    val partitioned = run(false)
    assert(small == partitioned,
      s"regimes disagree:\n small=$small\n part =$partitioned")
    // cross-year watermark: every 2023 event is late w.r.t. 2025's 50
    assert(partitioned.take(4).forall(_._3 == 50L))
    // global last day: NULL watermark in both regimes
    assert(partitioned.last == ("2025-01-01", 0L, -1L))
  }

  test("q27 cumulative share: regimes agree across years") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, "2023-05-10", 100.00), (2L, 11L, "2023-11-02", 50.00),
      (3L, 10L, "2024-01-15", 70.00), (4L, 11L, "2024-06-20", 30.00),
      (5L, 10L, "2025-02-05", 20.00))
      .toDF("o_orderkey", "o_custkey", "d", "p")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("date").as("o_orderdate"),
        col("p").as("o_totalprice"))
    val customer = Seq((10L, "BUILDING"), (11L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    def run(small: Boolean) =
      operators.Relational.q27Of(orders, customer, smallDomain = small)
        .collect().map(r => (r.getDate(0).toString, r.getString(1),
          r.getDouble(4))).toSeq
    val small = run(true)
    val partitioned = run(false)
    assert(small == partitioned,
      s"regimes disagree:\n small=$small\n part =$partitioned")
    // cumulative totals walk 100, 150, 220, 250, 270 across the years
    val want = Seq(
      ("2023-05-01", "BUILDING", 1.0),
      ("2023-11-01", "MACHINERY", math.rint(50.0 / 150.0 * 1e6) / 1e6),
      ("2024-01-01", "BUILDING", math.rint(170.0 / 220.0 * 1e6) / 1e6),
      ("2024-06-01", "MACHINERY", math.rint(80.0 / 250.0 * 1e6) / 1e6),
      ("2025-02-01", "BUILDING", math.rint(190.0 / 270.0 * 1e6) / 1e6))
    assert(partitioned == want, s"got=$partitioned\nwant=$want")
  }
}
