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
    // the median gate alone stays blind (this is the r10 failure)...
    assert(Bench.medianOpInflation(r10Run, priorSpark).exists(_ <= 1.5))
    // ...the p95 telemetry and the tail gate are not
    assert(Bench.p95OpInflation(r10Run, priorSpark).exists(_ > 4.0))
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
