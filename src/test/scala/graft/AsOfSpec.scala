package graft

import org.apache.spark.sql.functions._

/** Randomized equivalence check: AsOf.asofJoin vs a quadratic in-memory
  * reference over seeded random data — covers equal timestamps, missing
  * right rows, multiple keys, both strictness modes. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id[, payload]) as tuples: encoders for class-nested case
  // classes are not derivable
  private val rnd = new scala.util.Random(42)
  private val lefts = (1L to 300L).map(i =>
    (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i))
  private val rights = (1L to 300L).map(i =>
    (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i, rnd.nextInt(100).toDouble))

  private def reference(strict: Boolean): Map[Long, Option[Long]] =
    lefts.map { case (k, ts, lid) =>
      val cands = rights.filter { case (rk, rts, _, _) =>
        rk == k && (if (strict) rts < ts else rts <= ts) }
      // latest ts, then largest rid — matches tieBreak = Seq("rid")
      lid -> cands.sortBy { case (_, rts, rid, _) => (rts, rid) }
        .lastOption.map(_._3)
    }.toMap

  test("tolerance as-of: stale matches nulled, fresh ones agree with " +
      "the unbounded as-of") {
    val tol = operators.AsOf.evAsofTolerance(spark, sfTiny)
    // staleness, when present, is positive and within the tolerance
    assert(tol.filter(col("staleness_us") > 3600L * 1000000L ||
      col("staleness_us") < 0).count() == 0)
    assert(tol.filter(col("recent_event_id").isNotNull &&
      col("staleness_us").isNull).count() == 0)
    // wherever tolerance keeps a match it must be the SAME event the
    // unbounded as-of picked; wherever it nulls one, the unbounded
    // as-of's match must genuinely be stale or absent
    val unbounded = operators.AsOf.evAsofJoin(spark, sfTiny)
      .select(col("purchase_id"), col("asof_event_id"),
        col("purchase_ts"))
    val j = tol.join(unbounded, "purchase_id")
    assert(j.filter(col("recent_event_id").isNotNull &&
      col("recent_event_id") =!= col("asof_event_id")).count() == 0)
    assert(tol.filter(col("recent_event_id").isNotNull).count() > 0,
      "fixture must exercise the fresh path")
    assert(tol.filter(col("recent_event_id").isNull).count() > 0,
      "fixture must exercise the stale/absent path")
  }

  test("asofNearestJoin matches the quadratic nearest reference") {
    val lts = lefts.toDF("k", "tsl", "lid")
      .select(col("k"), timestamp_micros(col("tsl")).as("ts"), col("lid"))
    val rts = rights.toDF("k", "tsl", "rid", "payload")
      .select(col("k"), timestamp_micros(col("tsl")).as("ts"), col("rid"))
    val got = operators.AsOf.asofNearestJoin(lts, rts,
      keys = Seq("k"), ts = "ts", payload = Seq("rid"),
      tieBreak = Seq("rid"))
      .select(col("lid"), col("nearest_rid"), col("nearest_direction"),
        col("nearest_delta_us")).collect()
    assert(got.length == lefts.size,
      s"exactly one output row per left row, got ${got.length}")
    // backward: non-strict, latest (ts, rid); forward: strict, earliest
    // (ts, rid); distance tie prefers backward — the operator's contract
    val want = lefts.map { case (k, ts, lid) =>
      val cands = rights.filter(_._1 == k)
      val back = cands.filter(_._2 <= ts)
        .sortBy { case (_, r, rid, _) => (r, rid) }.lastOption
      val fwd = cands.filter(_._2 > ts)
        .sortBy { case (_, r, rid, _) => (r, rid) }.headOption
      val pick = (back, fwd) match {
        case (None, f) => f.map(x => (x._3, "forward", x._2 - ts))
        case (b, None) => b.map(x => (x._3, "backward", ts - x._2))
        case (Some(b), Some(f)) =>
          if (f._2 - ts < ts - b._2) Some((f._3, "forward", f._2 - ts))
          else Some((b._3, "backward", ts - b._2))
      }
      lid -> pick
    }.toMap
    got.foreach { r =>
      val lid = r.getLong(0)
      val g = if (r.isNullAt(1)) None
        else Some((r.getLong(1), r.getString(2), r.getLong(3)))
      assert(g == want(lid), s"lid=$lid got=$g want=${want(lid)}")
    }
    assert(got.exists(r => !r.isNullAt(2) && r.getString(2) == "forward"))
    assert(got.exists(r => !r.isNullAt(2) && r.getString(2) == "backward"))
  }

  for (strict <- Seq(true, false)) {
    test(s"asofJoin(strict=$strict) matches the quadratic reference") {
      val collected = operators.AsOf.asofJoin(
        lefts.toDF("k", "ts", "lid"), rights.toDF("k", "ts", "rid", "payload"),
        keys = Seq("k"), ts = "ts", payload = Seq("rid", "payload"),
        tieBreak = Seq("rid"), strict = strict)
        .select(col("lid"), col("asof_rid")).collect()
      assert(collected.length == lefts.size,
        s"exactly one output row per left row, got ${collected.length}")
      val got = collected
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val want = reference(strict)
      val diffs = want.collect {
        case (lid, w) if got.getOrElse(lid, None) != w =>
          (lid, w, got.get(lid))
      }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
      assert(got.size == lefts.size)
    }
  }
}
