package graft

import org.scalatest.funsuite.AnyFunSuite

/** Chaos test of the bench noise defense (BenchCore), replaying the
  * round-5 driver incident deterministically: an ~18× host throttle that
  * covers a contiguous stretch of the run — long enough that EVERY pass
  * of the queries inside it is corrupted, which defeats median-of-3 and
  * the 5-pass escalation (they only reject minority-corrupted samples).
  * The post-run recovery layer must (a) notice via noise_index, (b) wait
  * out the throttle, (c) screen every query with a clean pass and
  * re-measure the inflated ones, and (d) land every final median within
  * 20% of the quiet-host truth. Spread-based selection is provably
  * insufficient here: a query whose every pass fell inside the window
  * times consistently slow (spread ≈ 0) — the screening sweep is what
  * catches those.
  *
  * The simulated host advances one tick per injected call (passes and
  * calibrations both), so "the throttle ends during the recovery wait" is
  * modeled honestly rather than assumed.
  */
class BenchChaosSpec extends AnyFunSuite {

  /** A simulated host: queries have true costs; calls made while the
    * throttle window covers the current tick run `factor`× slower. */
  private class Host(trueCost: Map[String, Double], throttleFrom: Int,
      throttleTo: Int, factor: Double) {
    var tick = 0
    var passCalls: List[String] = Nil
    private def throttled: Boolean = tick >= throttleFrom && tick < throttleTo
    def onePass(name: String): (Double, Boolean) = {
      tick += 1
      passCalls ::= name
      (trueCost(name) * (if (throttled) factor else 1.0), true)
    }
    def calibrate(): Double = {
      tick += 1
      0.5 * (if (throttled) factor else 1.0)
    }
  }

  private val names = (0 until 10).map(i => f"q$i%02d")
  private val trueCost = names.map(n => n -> (1.0 + n.drop(1).toInt / 10.0)).toMap

  test("an outlasting mid-run throttle is healed by the post-run recovery layer") {
    // Throttle ticks 10..28: with 3 passes/query + mid calibration, this
    // covers queries ~q03..q08 entirely — their every pass is dirty, so
    // spread inside each query is LOW (consistently slow) for the fully
    // covered ones and high at the edges. The window ends before the
    // recovery probes run out.
    val host = new Host(trueCost, throttleFrom = 10, throttleTo = 28, factor = 18.0)
    val out = BenchCore.measure(names, host.onePass, host.calibrate)
    assert(out.noiseIndex > BenchCore.NoiseThreshold, "mid calibration must expose the throttle")
    assert(out.rescueRan, "recovery layer must engage")
    for (q <- out.queries)
      assert(q.median <= trueCost(q.name) * 1.2,
        s"${q.name}: final median ${q.median} vs true ${trueCost(q.name)} — not healed")
    assert(out.queries.exists(_.rescued), "at least the worst-spread queries must be re-measured")
  }

  test("a calibration-blind window is caught by the failed-stabilization trigger") {
    // Throttle ticks 6..10 cover q01's last two passes AND both of its
    // escalation passes, then lift before the mid calibration — all three
    // calibration points read clean (noise_index 1.0), which is exactly
    // the round-6 real capture shape (noise 2.85 under the 3.0 threshold,
    // spreads 240–305% surviving 5 passes). The escalated-but-unstable
    // spread must trigger the rescue anyway.
    val host = new Host(trueCost, throttleFrom = 6, throttleTo = 10, factor = 18.0)
    val out = BenchCore.measure(names, host.onePass, host.calibrate)
    assert(out.noiseIndex <= BenchCore.NoiseThreshold, "calibrations must all miss the window")
    assert(out.rescueRan, "failed-stabilization spread must trigger the rescue")
    for (q <- out.queries)
      assert(q.median <= trueCost(q.name) * 1.2,
        s"${q.name}: final median ${q.median} vs true ${trueCost(q.name)} — not healed")
  }

  test("canonical noise gate: a throttled window cannot overwrite the canonical artifact") {
    def path(ni: Double, exit: Option[Double] = Some(1.0), dirty: Boolean = false) =
      BenchCore.detailsPathFor("bench_details.json", ni, exit, dirty)
    // quiet window → canonical, regardless of the exit state — including
    // the round-11 shape where the exit calibration is SKIPPED (None)
    // because the three passes cannot change a ≤gate verdict
    assert(path(1.0, exit = Some(9.9), dirty = true) === "bench_details.json")
    assert(path(1.0, exit = None, dirty = true) === "bench_details.json")
    assert(path(BenchCore.CanonicalNoiseGate, exit = None) === "bench_details.json")
    // elevated mid-run calibrations + recovered exit + stable queries =
    // the self-inflicted GC/heap drift every full-surface window shows
    // (incl. the round-9 "cleaner" capture at noise 2.40) → canonical
    assert(path(2.40, exit = Some(1.2)) === "bench_details.json")
    assert(path(2.40, exit = Some(BenchCore.RecoveredFactor)) === "bench_details.json")
    // …but an exit calibration still elevated = genuine external load
    assert(path(2.40, exit = Some(1.51)) === "bench_details.json.noisy")
    assert(path(18.44, exit = Some(3.0)) === "bench_details.json.noisy") // the round-5 capture
    // …and a query that escalated to 5 passes and STILL spread >50% is
    // direct per-query throttle evidence: divert even if the exit is clean
    assert(path(2.40, exit = Some(1.2), dirty = true) === "bench_details.json.noisy")
    // round-11 hard ceiling (ADVICE): a window the rescue layer itself
    // calls throttled (> NoiseThreshold) cannot become canonical even if
    // the throttle lifted before exit and only sub-floor queries took it
    assert(path(4.19, exit = Some(1.0)) === "bench_details.json.noisy")
    assert(path(BenchCore.CanonicalNoiseCeiling, exit = Some(1.0)) === "bench_details.json")
    // above the gate, a missing exit ratio can never accept
    assert(path(2.40, exit = None) === "bench_details.json.noisy")
    // the gate must be at least as strict as what the rescue layer calls
    // "recovered" — a window rescue would accept is one canonical accepts
    assert(BenchCore.CanonicalNoiseGate <= BenchCore.RecoveredFactor)
  }

  test("refusal telemetry: render/parse round-trip, corrupt-line drop, stdout cap") {
    val rs = (1 to 12).map(i =>
      BenchCore.Refusal(f"08-15T17:$i%02d:00", 1.5 + i * 0.1, 1.0 + i * 0.05,
        spreadDirty = i % 3 == 0))
    // sidecar round-trip: every rendered line parses back to itself
    for (r <- rs) {
      val line = BenchCore.renderRefusal(r)
      val back = BenchCore.parseRefusal(line)
      assert(back.nonEmpty, s"unparseable: $line")
      assert(back.get.ts === r.ts && back.get.spreadDirty === r.spreadDirty)
      assert(math.abs(back.get.noiseIndex - r.noiseIndex) < 0.005)
      assert(math.abs(back.get.exitRatio - r.exitRatio) < 0.005)
    }
    // a corrupt sidecar line drops instead of poisoning the artifact
    assert(BenchCore.parseRefusal("garbage").isEmpty)
    assert(BenchCore.parseRefusal("""{"ts":"x","ni":abc,"er":1.0,"sd":true}""").isEmpty)
    assert(BenchCore.parseRefusal("").isEmpty)
    // the stdout array keeps the LAST cap entries in chronological order
    val capped = BenchCore.refusalsJson(rs, cap = 8)
    assert(!capped.contains("17:04:00") && capped.contains("17:05:00")
      && capped.contains("17:12:00"))
    assert(capped.indexOf("17:05:00") < capped.indexOf("17:12:00"))
    // the full array is valid one-line JSON the details artifact embeds
    val full = BenchCore.refusalsJson(rs)
    assert(full.startsWith("[") && full.endsWith("]") && !full.contains("\n"))
    assert(full.split("\\},\\{").length === 12)
  }

  test("single-pass probe mode (basePasses=1) runs exactly one pass and never escalates") {
    // the dev-only sf100 tiered mode: one sample per query, honest
    // passes=1 in the artifact, no spread machinery (one sample has none)
    val host = new Host(trueCost, throttleFrom = 0, throttleTo = 0, factor = 1.0)
    val out = BenchCore.measure(names, host.onePass, host.calibrate, basePasses = 1)
    assert(host.passCalls.size == names.size)
    assert(out.queries.forall(q => q.passes == 1 && q.median == trueCost(q.name)))
    assert(!out.rescueRan)
  }

  test("a quiet host never pays the rescue phase") {
    val host = new Host(trueCost, throttleFrom = 0, throttleTo = 0, factor = 1.0)
    val out = BenchCore.measure(names, host.onePass, host.calibrate)
    assert(!out.rescueRan && out.recoveryProbes == 0, "no noise → no extra work")
    assert(out.queries.forall(q => q.median == trueCost(q.name)))
    // Steady-state cost stays 3 passes/query.
    assert(host.passCalls.size == names.size * 3)
  }

  test("a throttle that never lifts keeps first-round medians and reports honestly") {
    val host = new Host(trueCost, throttleFrom = 10, throttleTo = Int.MaxValue, factor = 18.0)
    val out = BenchCore.measure(names, host.onePass, host.calibrate)
    assert(out.noiseIndex > BenchCore.NoiseThreshold)
    assert(!out.rescueRan, "never-recovered host must not pretend to rescue")
    assert(out.recoveryProbes == BenchCore.MaxRecoveryProbes)
    assert(out.queries.forall(!_.rescued))
  }

  test("5-pass escalation alone still heals a single-pass glitch (layers 1+2 regression)") {
    // One corrupted pass inside a query: the median never sees it.
    val host = new Host(trueCost, throttleFrom = 4, throttleTo = 5, factor = 18.0)
    val out = BenchCore.measure(names, host.onePass, host.calibrate)
    for (q <- out.queries)
      assert(q.median <= trueCost(q.name) * 1.2, s"${q.name} median ${q.median}")
  }
}
