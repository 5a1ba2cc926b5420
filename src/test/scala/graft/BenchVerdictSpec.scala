package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-integrity tests for Bench's per-query verdict (r14, verdict
  * ask #2): a sample that spent its wall time in GC must be rejected the
  * same way a CPU-starved sample is, so a polluted heap can never
  * produce a `converged` number again (BENCH_r13's sf1 d11 row —
  * 26.15 s "converged" with ~2.8 s GC per sample vs 3.50 s in a fresh
  * JVM — is the motivating forgery). Pure functions, no SparkSession.
  */
class BenchVerdictSpec extends AnyFunSuite {

  private val floor = 0.025 // quiet-host probe floor, seconds
  private def quiet(wall: Double, gcMs: Long = 0L) =
    Bench.Sample(wall, util = 0.5, probe = floor, gcMs = gcMs)
  private def starved(wall: Double) =
    Bench.Sample(wall, util = 0.1, probe = floor * 3, gcMs = 0L)

  test("isGcThrash: 25%-of-wall AND 500ms-absolute thresholds") {
    // routine young-gen pauses on a sub-second query: high fraction but
    // tiny absolute — NOT thrash
    assert(!Bench.isGcThrash(quiet(0.4, gcMs = 400)))
    // long query with proportionally small GC — NOT thrash
    assert(!Bench.isGcThrash(quiet(10.0, gcMs = 2000)))
    // the d11 shape: seconds of GC inside a tens-of-seconds sample
    assert(Bench.isGcThrash(quiet(26.0, gcMs = 11000)))
    assert(Bench.isGcThrash(quiet(3.0, gcMs = 900)))
  }

  test("verdict: gc-thrash samples cannot set the min or converge") {
    // two clean fast samples + one gc-thrashed slow one: min comes from
    // the clean pair and the row converges on them
    val v = Bench.verdict(
      Seq(quiet(3.4), quiet(27.0, gcMs = 11000), quiet(3.5)), floor)
    assert(v.best.wall == 3.4)
    assert(v.gcRejected == 1 && v.rejected == 0)
    assert(!v.gcThrash && !v.contended)
    // the thrash sample is invisible to convergence: the clean
    // subsequence (3.4, 3.5) plateaus — last set no new min, two within
    // 10%+30ms of the min
    assert(v.converged)
  }

  test("verdict: ALL samples gc-thrashed -> flagged, NEVER converged") {
    // the exact BENCH_r13 d11 failure: a GC-thrash plateau (27.2, 26.2,
    // 26.5) used to satisfy the convergence rule; now it is flagged and
    // the min is reported only as an upper bound
    val v = Bench.verdict(
      Seq(quiet(27.2, 9000), quiet(26.2, 11000), quiet(26.5, 10000)), floor)
    assert(v.gcThrash && !v.converged)
    assert(v.gcRejected == 3)
    assert(v.best.wall == 26.2) // upper-bound fallback, flagged
  }

  test("verdict: starved samples still rejected; mixed causes both counted") {
    val v = Bench.verdict(
      Seq(starved(1.0), quiet(2.0), quiet(2.05), quiet(9.0, 5000)), floor)
    assert(v.best.wall == 2.0)
    assert(v.rejected == 1 && v.gcRejected == 1)
    assert(v.converged && !v.contended && !v.gcThrash)
    // all-starved keeps the r9 contract
    val allStarved = Bench.verdict(Seq(starved(1.0), starved(1.2)), floor)
    assert(allStarved.contended && !allStarved.converged)
    assert(allStarved.best.wall == 1.0)
  }

  test("verdict: clean samples follow the r8 convergence rule unchanged") {
    // strictly decreasing: last sample set a new min -> not converged
    val desc = Bench.verdict(Seq(quiet(5.0), quiet(4.0), quiet(3.0)), floor)
    assert(!desc.converged)
    // plateau: reproduced min within slack -> converged
    val flat = Bench.verdict(Seq(quiet(3.0), quiet(3.02), quiet(3.3)), floor)
    assert(flat.converged && flat.best.wall == 3.0)
  }
}
