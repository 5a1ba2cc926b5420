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

  test("sf1Render fragments splice into valid JSON (fork-protocol tripwire)") {
    // the forked BenchSf1 ships its tier to the parent as two ","-led
    // fragments spliced VERBATIM into the artifact and the compact
    // stdout line — a malformed fragment would silently corrupt the
    // round's committed bench JSON. Parse both spliced forms with
    // Jackson (on Spark's classpath).
    val triples = Seq(
      ("d11_incremental_minhash_fast",
        Seq(quiet(3.5), quiet(3.6), quiet(30.0, 12000)), 12000L),
      ("q10_tpch_q1", Seq(starved(9.0), quiet(1.0), quiet(1.05)), 120L))
    val anchor = Map("d11_incremental_minhash_fast" -> 3.4, "q10_tpch_q1" -> 0.9)
    val (full, compact) = Bench.sf1Render(triples, floor, anchor,
      n => n.takeWhile(_ != '_'), gcTier = 12500L, forked = true)
    assert(full.startsWith(",") && compact.startsWith(","))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = om.readTree("""{"metric":"total","value":1.0""" + full + "}")
    assert(doc.get("sf1_forked").asBoolean())
    assert(doc.get("queries_sf1").get("d11_incremental_minhash_fast").asDouble() == 3.5)
    assert(doc.get("gc_thrash_sf1").get("d11_incremental_minhash_fast").asBoolean() == false)
    assert(doc.get("gc_rejected_sf1").get("d11_incremental_minhash_fast").asInt() == 1)
    assert(doc.get("gc_q_ms_sf1").get("d11_incremental_minhash_fast").asInt() == 12000)
    assert(doc.get("vs_anchor_sf1").get("q10_tpch_q1").asDouble() > 1.0)
    val cdoc = om.readTree("""{"metric":"total","value":1.0""" + compact + "}")
    assert(cdoc.get("total_sf1").asDouble() > 0)
    assert(cdoc.get("gc_thrash_sf1").isArray)
    // an all-thrash tier names itself in suspect_sf1 even when in-band
    // vs the anchor
    val allThrash = Seq(("x_q", Seq(quiet(5.0, 4000), quiet(5.1, 4100)), 8100L))
    val (f2, _) = Bench.sf1Render(allThrash, floor, Map("x_q" -> 5.0),
      identity, 8100L, forked = false)
    val d2 = om.readTree("""{"a":1""" + f2 + "}")
    assert(d2.get("suspect_sf1").toString.contains("x_q"))
    assert(d2.get("converged_sf1").get("x_q").asBoolean() == false)
  }

  test("retryAttribution: the three mechanical verdicts at their thresholds") {
    assert(Bench.retryAttribution(1.14) == "transient_host_noise")
    assert(Bench.retryAttribution(1.5) == "transient_host_noise")
    assert(Bench.retryAttribution(1.51) == "borderline")
    assert(Bench.retryAttribution(2.0) == "borderline")
    assert(Bench.retryAttribution(2.91) == "persistent_over_2x")
  }

  test("suspect rows carry an in-record retry: JSON shape, callback receives the suspects") {
    // r16 (r15 verdict ask #2): BENCH_r15's p05 read 2.91x while a
    // same-day check run read 1.14x, and the attribution lived in git
    // archaeology. The renderer must (a) hand the tier's suspects to
    // the retry callback, (b) splice the returned rows as
    // {value, vs_anchor, attribution} — valid JSON either way.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(om.readTree(Bench.retryJson(Seq.empty)).size() == 0)
    val j = om.readTree(Bench.retryJson(Seq(
      ("p05_curation_corpus_build", 8.728, 1.14),
      ("j04_edit_distance_join_k3", 9.1, 2.44))))
    assert(j.get("p05_curation_corpus_build").get("value").asDouble() == 8.728)
    assert(j.get("p05_curation_corpus_build").get("vs_anchor").asDouble() == 1.14)
    assert(j.get("p05_curation_corpus_build").get("attribution").asText() ==
      "transient_host_noise")
    assert(j.get("j04_edit_distance_join_k3").get("attribution").asText() ==
      "persistent_over_2x")
    // renderer wiring: a >2x row reaches the callback; its answer lands
    // in retry_sf1 in both fragments
    val triples = Seq(
      ("slow_q", Seq(quiet(9.0), quiet(9.1), quiet(9.2)), 100L),
      ("fine_q", Seq(quiet(1.0), quiet(1.0)), 50L))
    var asked: Seq[String] = null
    val (full, compact) = Bench.sf1Render(triples, floor,
      Map("slow_q" -> 3.0, "fine_q" -> 1.0), identity, 150L, forked = true,
      retryRun = sus => { asked = sus; sus.map(n => (n, 3.3, 1.1)) })
    assert(asked == Seq("slow_q"), s"callback must get exactly the suspects, got $asked")
    val doc = om.readTree("""{"a":1""" + full + "}")
    assert(doc.get("retry_sf1").get("slow_q").get("vs_anchor").asDouble() == 1.1)
    assert(doc.get("retry_sf1").get("slow_q").get("attribution").asText() ==
      "transient_host_noise")
    val cdoc = om.readTree("""{"a":1""" + compact + "}")
    assert(cdoc.get("retry_sf1").get("slow_q").asDouble() == 1.1)
    // no suspects -> callback still consulted with the empty list, empty map
    val (f3, _) = Bench.sf1Render(triples.filter(_._1 == "fine_q"), floor,
      Map("fine_q" -> 1.0), identity, 50L, forked = false)
    assert(om.readTree("""{"a":1""" + f3 + "}").get("retry_sf1").size() == 0)
  }

  test("settledProbe: min-of-2 discriminates self-noise from neighbor contention") {
    // r15 (r14 verdict ask #8): the all-core probe's settle logic as a
    // pure function. Self-noise (this JVM's own executor threads winding
    // down) inflates only the FIRST spin — the settled second one wins:
    val decaying = Iterator(0.080, 0.026)
    assert(Bench.settledProbe(() => decaying.next(), settleMs = 0) == 0.026)
    // neighbor contention inflates BOTH spins — the probe stays high and
    // the sample is rejected against a 0.025 floor
    val contended = Iterator(0.060, 0.055)
    val p = Bench.settledProbe(() => contended.next(), settleMs = 0)
    assert(p == 0.055 && Bench.isStarved(p, floor))
    // quiet host: both spins at the floor, sample accepted
    val q = Iterator(0.026, 0.025)
    assert(!Bench.isStarved(Bench.settledProbe(() => q.next(), settleMs = 0), floor))
    // exactly two spins per probe — no more, no fewer
    var n = 0
    Bench.settledProbe(() => { n += 1; 0.03 }, settleMs = 0)
    assert(n == 2)
  }

  test("verdict: clean samples follow the r8 convergence rule unchanged") {
    // strictly decreasing: last sample set a new min -> not converged
    val desc = Bench.verdict(Seq(quiet(5.0), quiet(4.0), quiet(3.0)), floor)
    assert(!desc.converged)
    // plateau: reproduced min within slack -> converged
    val flat = Bench.verdict(Seq(quiet(3.0), quiet(3.02), quiet(3.3)), floor)
    assert(flat.converged && flat.best.wall == 3.0)
  }

  // ---- r17: memory-bandwidth probe + widened suspect net ----

  private val memFloor = 0.015
  private def memQuiet(wall: Double) =
    Bench.Sample(wall, util = 0.5, probe = floor, gcMs = 0L, memProbe = memFloor)
  private def memBusy(wall: Double) =
    Bench.Sample(wall, util = 0.5, probe = floor, gcMs = 0L,
      memProbe = memFloor * 3) // bus contended, ALU probe CLEAN

  test("isMemStarved: 1.5x + 10ms slack; zero/absent probe never rejects") {
    assert(!Bench.isMemStarved(0.0, memFloor)) // not measured
    assert(!Bench.isMemStarved(memFloor, memFloor))
    assert(!Bench.isMemStarved(memFloor * 1.5 + 0.009, memFloor))
    assert(Bench.isMemStarved(memFloor * 1.5 + 0.011, memFloor))
    // no floor observed (old artifacts/unit paths): never rejects
    assert(!Bench.isMemStarved(9.9, Double.PositiveInfinity))
  }

  test("verdict: bus-contended samples rejected even when the ALU probe is clean") {
    // the r16 anchor-drift shape: ALU probes at the floor while the
    // memory bus is saturated — the inflated samples must not set the
    // min or converge the row
    val v = Bench.verdict(
      Seq(memBusy(6.1), memQuiet(1.9), memBusy(9.3), memQuiet(1.95)),
      floor, memFloor)
    assert(v.best.wall == 1.9)
    assert(v.rejected == 2)
    assert(v.converged) // clean pair (1.9, 1.95) plateaus
    // ALL samples bus-contended -> contended flag, never converged
    val all = Bench.verdict(Seq(memBusy(6.0), memBusy(6.1)), floor, memFloor)
    assert(all.contended && !all.converged && all.rejected == 2)
    // default memFloor (absent) keeps pre-r17 behavior: memProbe ignored
    val legacy = Bench.verdict(Seq(memBusy(6.0), memBusy(6.1)), floor)
    assert(!legacy.contended && legacy.best.wall == 6.0)
  }

  test("sf1 suspect net: unconverged rows at >=1.5x anchor now retried (r17)") {
    // a11's r16 escape: 1.88x anchor, unconverged, no retry. Descending
    // samples (never converges) at 1.88x the anchor row must now reach
    // the retry callback; a converged 1.88x row must NOT.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val unconverged188 = ("a11_like", Seq(quiet(2.6), quiet(2.2), quiet(1.88)), 10L)
    val converged188 = ("ok_188", Seq(quiet(1.88), quiet(1.9), quiet(1.92)), 10L)
    val converged12 = ("ok_12", Seq(quiet(1.2), quiet(1.21), quiet(1.3)), 10L)
    // r18 (verdict ask #3): the unconverged bar dropped 1.5x -> 1.3x —
    // j04's record rode unconverged two rounds without a retry
    val unconverged135 = ("j04_like", Seq(quiet(1.8), quiet(1.5), quiet(1.35)), 10L)
    var asked: Seq[String] = null
    val (full, _) = Bench.sf1Render(
      Seq(unconverged188, converged188, converged12, unconverged135), floor,
      Map("a11_like" -> 1.0, "ok_188" -> 1.0, "ok_12" -> 1.0, "j04_like" -> 1.0),
      identity, 0L, forked = false,
      retryRun = sus => { asked = sus; sus.map(n => (n, 1.9, 1.9)) })
    assert(asked == Seq("a11_like", "j04_like"),
      s"expected the unconverged 1.88x and 1.35x rows, got $asked")
    val doc = om.readTree("""{"a":1""" + full + "}")
    assert(doc.get("retry_sf1").get("a11_like").get("attribution").asText() == "borderline")
    // vs_prev_anchor_sf1 renders when a prev anchor is supplied
    val (f2, _) = Bench.sf1Render(Seq(converged12), floor,
      Map("ok_12" -> 1.0), identity, 0L, forked = false,
      prevAnchorQ1 = Map("ok_12" -> 2.4))
    val d2 = om.readTree("""{"a":1""" + f2 + "}")
    assert(d2.get("vs_prev_anchor_sf1").get("ok_12").asDouble() == 0.5)
    assert(d2.get("vs_anchor_sf1").get("ok_12").asDouble() == 1.2)
  }

  test("x10 scaling tier: render/parse roundtrip, flags classified (r18)") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val triples = Seq(
      ("g05_kcore", Seq(quiet(8.0), quiet(8.1), quiet(8.05)), 10L),
      ("j04_like", Seq(quiet(12.0), quiet(10.0), quiet(9.0)), 10L)) // descending
    val line = Bench.x10Render(triples, floor, Double.PositiveInfinity)
    om.readTree(line) // valid standalone JSON object
    val (pairs, unconv, cont) = Bench.parseX10(line)
    assert(pairs.toMap == Map("x10_g05_kcore" -> 8.0, "x10_j04_like" -> 9.0))
    assert(unconv == Seq("x10_j04_like") && cont.isEmpty)
    // absent/empty fragment parses to empty (fork failure degrades clean)
    assert(Bench.parseX10("{}") == ((Seq.empty, Seq.empty, Seq.empty)))
    assert(Bench.parseX10("") == ((Seq.empty, Seq.empty, Seq.empty)))
  }
}
