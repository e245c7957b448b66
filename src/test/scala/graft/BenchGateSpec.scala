package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-op contamination gate (Bench.medianOpInflation):
  * the r9 driver run shipped ~10 early ops inflated 2-7× under
  * `contaminated:false` because the old gate only watched
  * duckdb_total and post-run loadavg. The new gate compares each op
  * against the prior committed detail and flags on the MEDIAN
  * inflation — this spec is the "deliberately loaded run flags true,
  * clean rerun stays false" check in synthetic form. */
class BenchGateSpec extends AnyFunSuite {

  private val prior = (1 to 20).map(i => s"op$i" -> 0.5).toMap

  test("a loaded run (all comparable ops inflated 3x) flags; a clean " +
      "rerun does not") {
    val loaded = (1 to 20).map(i => s"op$i" -> 1.5)
    assert(Bench.medianOpInflation(loaded, prior).exists(_ > 1.5))
    val clean = (1 to 20).map(i => s"op$i" -> 0.55)
    assert(Bench.medianOpInflation(clean, prior).exists(_ <= 1.5))
  }

  test("the median ignores a handful of legitimately changed ops") {
    // 4 ops regressed 10x by a real code change; 16 unchanged — the
    // run as a whole is NOT contaminated and must not flag
    val mixed = (1 to 16).map(i => s"op$i" -> 0.5) ++
      (17 to 20).map(i => s"op$i" -> 5.0)
    assert(Bench.medianOpInflation(mixed, prior).exists(_ <= 1.5))
  }

  test("the r10 driver run (44.8s etl_compact stall under median 1.05) " +
      "flags through the tail-outlier gate") {
    // the literal r10 numbers: committed idle detail 3.87s / duck
    // 0.0164s; the driver's loaded run measured 48.645s with DuckDB
    // unchanged — median inflation stayed 1.05 (the other 189 ops were
    // near-clean) and the run shipped contaminated:false. The tail gate
    // must name etl_compact.
    val priorSpark = (1 to 19).map(i => s"op$i" -> 0.6).toMap +
      ("etl_compact" -> 3.87)
    val priorDuck = (1 to 19).map(i => s"op$i" -> 0.1).toMap +
      ("etl_compact" -> 0.0164)
    val curDuck = (1 to 19).map(i => s"op$i" -> 0.105).toMap +
      ("etl_compact" -> 0.0164)
    val r10Run = (1 to 19).map(i => s"op$i" -> 0.63) :+
      ("etl_compact" -> 48.645)
    // the median gate alone stays blind (this is the r10 failure), and
    // a nearest-rank p95 over 20 ops is too — 1 outlier in 20 sits
    // BEYOND the 95th percentile (this is why the telemetry alone was
    // never the gate)...
    assert(Bench.medianOpInflation(r10Run, priorSpark).exists(_ <= 1.5))
    assert(Bench.p95OpInflation(r10Run, priorSpark).exists(_ <= 1.5))
    // ...the tail gate is what names the stall
    assert(Bench.tailOffenders(r10Run, priorSpark, curDuck, priorDuck)
      == Seq("etl_compact"))
    // a clean rerun names nobody
    val clean = (1 to 19).map(i => s"op$i" -> 0.62) :+
      ("etl_compact" -> 4.1)
    assert(Bench.tailOffenders(clean, priorSpark, curDuck, priorDuck)
      .isEmpty)
  }

  test("tail gate defers to the whole-machine gates when the op's own " +
      "DuckDB time also blew up, and skips sub-0.5s denominators") {
    val priorSpark = Map("a" -> 3.0, "b" -> 0.3)
    val priorDuck = Map("a" -> 0.5, "b" -> 0.1)
    // a's duck ran 3x slower too: ambient load, duckdb_total/highLoad
    // gates own it — NOT a tail offender
    assert(Bench.tailOffenders(Seq("a" -> 15.0), priorSpark,
      Map("a" -> 1.5), priorDuck).isEmpty)
    // b inflated 5x but its 0.3s prior is below the stable-denominator
    // floor
    assert(Bench.tailOffenders(Seq("b" -> 1.5), priorSpark,
      Map("b" -> 0.1), priorDuck).isEmpty)
    // missing duck numbers: condition is vacuously true — still flagged
    assert(Bench.tailOffenders(Seq("a" -> 15.0), priorSpark,
      Map.empty, Map.empty) == Seq("a"))
  }

  test("millisecond duck noise cannot disarm the tail gate: the " +
      "absolute-delta escape treats |cd - pd| < 0.05s as stable") {
    // the r10 exhibit's own duck time was 0.0164s — at that scale
    // ordinary timing noise exceeds ±30%, so without the absolute
    // escape a real Spark-side stall would again ship
    // contaminated:false because its duck jitter 'destabilized' it
    val priorSpark = Map("stall_op" -> 3.87)
    val priorDuck = Map("stall_op" -> 0.0164)
    // duck jitters 0.0164 -> 0.030: ratio 1.83 (outside ±30%) but the
    // machine is fine — the 45s Spark time must still be named
    assert(Bench.tailOffenders(Seq("stall_op" -> 45.0), priorSpark,
      Map("stall_op" -> 0.030), priorDuck) == Seq("stall_op"))
    // a real whole-machine blowup (duck 0.5 -> 1.5, delta 1.0s) still
    // defers to the whole-machine gates
    assert(Bench.tailOffenders(Seq("stall_op" -> 45.0), priorSpark,
      Map("stall_op" -> 1.5), Map("stall_op" -> 0.5)).isEmpty)
  }

  test("p95 is nearest-rank: 100 inflations -> the 95th value, " +
      "not the 96th") {
    // 95 ops at 1.0x, 5 ops at 9.0x: nearest-rank p95 of n=100 is the
    // 95th sorted value = 1.0; the old (n*95)/100 index read the 96th
    // (= 9.0), reporting the outlier band instead of the percentile
    val priorSpark = (1 to 100).map(i => s"op$i" -> 1.0).toMap
    val run = (1 to 95).map(i => s"op$i" -> 1.0) ++
      (96 to 100).map(i => s"op$i" -> 9.0)
    assert(Bench.p95OpInflation(run, priorSpark).contains(1.0))
    // at the size floor (n=8) nearest-rank p95 is the max
    val p8 = (1 to 8).map(i => s"op$i" -> 1.0).toMap
    val r8 = (1 to 7).map(i => s"op$i" -> 1.0) :+ ("op8" -> 6.0)
    assert(Bench.p95OpInflation(r8, p8).contains(6.0))
  }

  test("canary gate: fires on real pre-sweep drift, stays quiet on " +
      "jitter, missing priors and tiny denominators") {
    // the r12 manual protocol's numbers: ~1.25s canary at sf0.1
    assert(Bench.canaryInflatedGate(Some((2.5, 1.25))), "2x drift must fire")
    assert(!Bench.canaryInflatedGate(Some((1.5, 1.25))), "1.2x is noise")
    // pre-r13 detail files carry no canary: gate disarmed, not crashed
    assert(!Bench.canaryInflatedGate(None))
    // millisecond denominators at tiny SFs never arm the gate
    assert(!Bench.canaryInflatedGate(Some((0.9, 0.1))))
  }

  test("canary compare: sums only ops present in both runs; a one-op " +
      "probe never reads as 2x drift") {
    val set = Set("a", "b")
    val prior = Map("a" -> 0.6, "b" -> 0.7)
    // healthy two-op compare (sums float: compare within an ulp band)
    val healthy = Bench.canaryCompare(Map("a" -> 0.65, "b" -> 0.7), prior,
      None, set)
    assert(healthy.exists { case (c, p) =>
      math.abs(c - 1.35) < 1e-9 && math.abs(p - 1.3) < 1e-9 })
    // the ADVICE exhibit: op b failed in the CURRENT probe — the r13
    // form compared 0.6 vs 1.3 (sum over different sets); now only the
    // shared op enters both sums, so a stable host reads stable
    assert(Bench.canaryCompare(Map("a" -> 0.6), prior, None, set)
      .contains((0.6, 0.6)))
    // op b failed in the PRIOR run: same shared-op rule
    assert(Bench.canaryCompare(Map("a" -> 0.62, "b" -> 0.7),
      Map("a" -> 0.6), None, set).contains((0.62, 0.6)))
    // legacy r13 detail (scalar only): compare only when the current
    // probe is complete, else disarm rather than mix op sets
    assert(Bench.canaryCompare(Map("a" -> 0.6, "b" -> 0.7), Map.empty,
      Some(1.3), set).exists { case (c, p) =>
        math.abs(c - 1.3) < 1e-9 && p == 1.3 })
    assert(Bench.canaryCompare(Map("a" -> 0.6), Map.empty,
      Some(1.3), set).isEmpty)
    // nothing comparable at all: disarmed
    assert(Bench.canaryCompare(Map.empty, Map.empty, None, set).isEmpty)
  }

  test("canary probe incompleteness: a prior-timed op missing from the " +
      "current probe is its own distress signal") {
    val set = Set("a", "b")
    val prior = Map("a" -> 0.6, "b" -> 0.7)
    // op b timed in the prior run but absent now: the shrunk compare
    // above reads stable, so THIS predicate must arm the retry loop
    // and the contamination flag instead (r14 advice)
    assert(Bench.canaryProbeIncomplete(Map("a" -> 0.6), prior, set))
    assert(Bench.canaryProbeIncomplete(Map("a" -> 0.6, "b" -> -1.0),
      prior, set), "a negative (failed) timing counts as missing")
    // complete probe: quiet
    assert(!Bench.canaryProbeIncomplete(Map("a" -> 0.6, "b" -> 0.7),
      prior, set))
    // op missing from the PRIOR (new canary, pre-r14 detail): quiet —
    // nothing establishes the op ever ran on this corpus
    assert(!Bench.canaryProbeIncomplete(Map("a" -> 0.6),
      Map("a" -> 0.6), set))
    assert(!Bench.canaryProbeIncomplete(Map.empty, Map.empty, set))
    // sub-0.25s priors are tiny-SF jitter, not a stable baseline
    assert(!Bench.canaryProbeIncomplete(Map("a" -> 0.6),
      Map("a" -> 0.6, "b" -> 0.1), set))
  }

  test("canary retry: re-probes above 1.15x prior (the act-don't-record " +
      "gate), not on noise or missing priors") {
    assert(Bench.canaryNeedsRetry(Some((1.6, 1.25))), "1.28x must re-probe")
    assert(!Bench.canaryNeedsRetry(Some((1.4, 1.25))), "1.12x is noise")
    assert(!Bench.canaryNeedsRetry(None), "no prior: nothing to compare")
    assert(!Bench.canaryNeedsRetry(Some((0.9, 0.1))),
      "tiny denominators never arm the retry loop")
  }

  test("sub-constant priors and failed ops are excluded; narrow runs " +
      "never trigger") {
    // priors under 0.2s are per-job-constant noise
    val tinyPrior = (1 to 20).map(i => s"op$i" -> 0.05).toMap
    assert(Bench.medianOpInflation(
      (1 to 20).map(i => s"op$i" -> 1.0), tinyPrior).isEmpty)
    // failed ops (-1) must not count as miraculous speedups
    val withFailures = (1 to 20).map(i =>
      s"op$i" -> (if (i <= 15) -1.0 else 2.0))
    val m = Bench.medianOpInflation(withFailures, prior)
    assert(m.isEmpty, "5 comparable ops is below the >=8 floor")
    // a 3-op SPARK_GRAFT_ONLY iteration loop: never enough evidence
    assert(Bench.medianOpInflation(
      Seq("op1" -> 9.0, "op2" -> 9.0, "op3" -> 9.0), prior).isEmpty)
  }
}
