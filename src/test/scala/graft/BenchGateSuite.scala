package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.overBudget]] — the pure decision behind the per-query
  * regression gate — so "the gate demonstrably fires" is a deterministic
  * test, not a hope. The end-to-end arm is the
  * `SPARK_GRAFT_BENCH_INJECT=<query>:<ms>` knob on Bench itself, which
  * injects a real sleep into one query's timed region (used once in r16
  * to demonstrate a confirmed FAIL line — SCALE.md).
  */
class BenchGateSuite extends AnyFunSuite {
  private val budgets = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0)

  test("fires above budget x tolerance + floor, and only there") {
    // a's threshold: 1.0 x 1.4 + 0.18 = 1.58
    assert(Bench.overBudget(Map("a" -> 1.59), budgets) === Seq("a"))
    assert(Bench.overBudget(Map("a" -> 1.57), budgets) === Nil)
    // a genuine 2x regression on a 1 s query trips (the r15 FS-port
    // shapes were 1.4-1.7x raw — the gate exists for exactly these)
    assert(Bench.overBudget(Map("a" -> 2.0), budgets) === Seq("a"))
  }

  test("the absolute floor keeps sub-second fixture queries from flapping") {
    // b's threshold: 0.1 x 1.4 + 0.18 = 0.32 — 2x jitter on a 0.1 s
    // query stays silent, a real blow-up does not
    assert(Bench.overBudget(Map("b" -> 0.2), budgets) === Nil)
    assert(Bench.overBudget(Map("b" -> 0.31), budgets) === Nil)
    assert(Bench.overBudget(Map("b" -> 0.34), budgets) === Seq("b"))
  }

  test("ambientRefStale: persistent out-of-band ratios flag a stale reference; " +
    "a single spike or an in-band run does not") {
    // the r17 failure mode: EVERY sample of every run sat at 0.74-0.87
    // against the stale 0.67 ref — internally consistent, silently wrong
    assert(Bench.ambientRefStale(Seq(0.74, 0.79, 0.76, 0.75)))
    assert(Bench.ambientRefStale(Seq(1.3, 1.4, 1.35)))
    // a load spike inside an otherwise calibrated run is NOT staleness
    assert(!Bench.ambientRefStale(Seq(1.0, 1.9, 1.05)))
    assert(!Bench.ambientRefStale(Seq(0.95, 1.1)))
    assert(!Bench.ambientRefStale(Nil))
    // boundary: the band is inclusive
    assert(!Bench.ambientRefStale(Seq(Bench.AmbientStaleLow, Bench.AmbientStaleHigh)))
  }

  test("unknown queries never gate; multiple failures sort stably") {
    assert(Bench.overBudget(Map("zz" -> 99.0), budgets) === Nil)
    assert(Bench.overBudget(Map("c" -> 9.0, "a" -> 9.0), budgets) === Seq("a", "c"))
  }

  test("every SparkEntry query has a committed budget (so the gate covers the surface)") {
    val missing = SparkEntry.queries.keySet -- BenchBudgets.normalizedSeconds.keySet
    assert(missing.isEmpty,
      s"queries without a bench budget (regenerate scripts/gen_bench_budgets.py): $missing")
  }
}
