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
