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
    // a's threshold: 1.0 x 1.4 + 0.25 = 1.65
    assert(Bench.overBudget(Map("a" -> 1.66), budgets) === Seq("a"))
    assert(Bench.overBudget(Map("a" -> 1.64), budgets) === Nil)
    // a genuine 2x regression on a 1 s query trips (the r15 FS-port
    // shapes were 1.4-1.7x raw — the gate exists for exactly these)
    assert(Bench.overBudget(Map("a" -> 2.0), budgets) === Seq("a"))
  }

  test("the absolute floor keeps sub-second fixture queries from flapping") {
    // b's threshold: 0.1 x 1.4 + 0.25 = 0.39 — 2x jitter on a 0.1 s
    // query stays silent, a real blow-up does not
    assert(Bench.overBudget(Map("b" -> 0.2), budgets) === Nil)
    assert(Bench.overBudget(Map("b" -> 0.38), budgets) === Nil)
    assert(Bench.overBudget(Map("b" -> 0.41), budgets) === Seq("b"))
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
