package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's measurement protocol: the stabilization rule is
  * a pure function ([[Bench.Protocol.needsAnotherWarm]]) so what the
  * shipped JSON's protocol string claims is what the sweep actually
  * runs — the r8 verdict found dead protocol branches (`w1 < 0.4 &&
  * !scale10` short-circuits that never fired in any shipped
  * configuration) and heavy rows whose min-only readings couldn't
  * show WHY two same-code sweeps disagreed 4-7×.
  */
class BenchProtocolSpec extends AnyFunSuite {
  import Bench.Protocol

  test("every heavy30 name resolves in SparkEntry.queries") {
    val missing = Bench.heavy30.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty,
      s"heavy30 names with no query: ${missing.mkString(", ")}")
    assert(Bench.heavy30.distinct.size == Bench.heavy30.size,
      "heavy30 holds duplicates")
  }

  test("protocol string derives from the constants that run") {
    // `floorMinWarm`: floor = cold + min-of-two-warm (r10's method,
    // tokenized in r11 so overhead_floor comparisons across rounds
    // are machine-distinguishable); `coldMin`: readings are min over
    // ALL successful runs including cold, cold_undercut flagged;
    // `retime3.3paired` (r12): post-sweep retimes re-time BOTH the
    // 30x numerator and the 10x denominator, so a sweep-inflated
    // denominator cannot understate growth; `retimeUnstable1x` (r14):
    // non-converged 1x rows re-time once on the drained post-sweep
    // host, reading = min(sweep, retime), history appends so the
    // unstable flag clears only when the best two runs overall agree
    assert(Bench.protocolName ==
      s"noop-full-plan,min${Protocol.minWarm1x}warm,stabilize20pct," +
        "floorMinWarm,coldMin,retime3.3paired,retimeUnstable1x")
    assert(Protocol.agreeRatio == 1.2 &&
      math.round((Protocol.agreeRatio - 1) * 100) == 20)
  }

  test("30x retime selection: strictly above the 10%-over-linear bar") {
    val ratios = Seq("a" -> 2.9, "b" -> 3.3, "c" -> 3.31, "d" -> 10.19)
    assert(Protocol.retimeCandidates(ratios) == Seq("c", "d"))
    assert(Protocol.retimeCandidates(Seq.empty) == Seq.empty)
  }

  test("cold-undercut flag: converged-slow warm history with a fast cold run") {
    // the r10 q17 signature: cold 1.35, warm converged at 5.55/6.28 —
    // warm min > 2× cold → flagged (and the reading ships the cold)
    assert(Protocol.coldUndercut(Seq(1.351, 5.553, 6.278)))
    // normal history: cold slower than warm (codegen amortizes) → no flag
    assert(!Protocol.coldUndercut(Seq(4.238, 4.118, 2.872, 2.627)))
    // cold faster but within 2× → legitimate warm-up variance, no flag
    assert(!Protocol.coldUndercut(Seq(1.0, 1.8, 1.9)))
    // warm history NOT converged → the unstable list owns it, not
    // cold_undercut (an unconverged min is already suspect)
    assert(!Protocol.coldUndercut(Seq(1.0, 5.0, 9.0, 13.0, 17.0)))
    // failed cold → nothing to undercut with
    assert(!Protocol.coldUndercut(Seq(-1.0)))
    assert(!Protocol.coldUndercut(Seq.empty))
    // exactly-2× boundary: strictly-greater triggers
    assert(!Protocol.coldUndercut(Seq(1.0, 2.0, 2.1)))
    assert(Protocol.coldUndercut(Seq(1.0, 2.5, 2.6)))
  }

  test("stabilization: min warm count enforced, then agreement") {
    // under the minimum → always another run
    assert(Protocol.needsAnotherWarm(Seq.empty, minWarm = 3))
    assert(Protocol.needsAnotherWarm(Seq(1.0), minWarm = 3))
    assert(Protocol.needsAnotherWarm(Seq(1.0, 1.0), minWarm = 3))
    // at the minimum with agreeing runs → stop
    assert(!Protocol.needsAnotherWarm(Seq(1.0, 1.05, 1.1), minWarm = 3))
    // the q17/q160 signature — two warm runs disagreeing well past
    // 20% — triggers a re-run even past the minimum
    assert(Protocol.needsAnotherWarm(Seq(1.79, 12.26), minWarm = 2))
    assert(Protocol.needsAnotherWarm(Seq(0.90, 3.67, 3.5), minWarm = 3))
    // ...but agreement is judged on the two SMALLEST: one outlier
    // among agreeing runs does not re-run forever
    assert(!Protocol.needsAnotherWarm(Seq(1.0, 12.0, 1.1), minWarm = 3))
    // floor-bound readings: the absolute tolerance absorbs
    // scheduler-ms noise on ~0.1s rows (0.10 vs 0.16 is within
    // 0.10*1.2+0.05)
    assert(!Protocol.needsAnotherWarm(Seq(0.10, 0.16, 0.12), minWarm = 3))
  }

  test("stabilization: hard cap and failure short-circuit") {
    // never past maxWarm even when still disagreeing
    val noisy = Seq(1.0, 5.0, 9.0, 13.0, 17.0)
    assert(noisy.size == Protocol.maxWarm)
    assert(!Protocol.needsAnotherWarm(noisy, minWarm = 3))
    // a failed (-1.0) or timed-out (-2.0) warm run stops the loop —
    // retrying a broken plan fails identically and doubles the cost
    assert(!Protocol.needsAnotherWarm(Seq(1.0, -1.0), minWarm = 3))
    assert(!Protocol.needsAnotherWarm(Seq(-2.0), minWarm = 2))
  }

  test("convergence flag: exhausted-cap disagreement is visible") {
    // agreeing smallest pair → converged (reading is corroborated)
    assert(Protocol.converged(Seq(1.0, 1.05, 1.1)))
    assert(Protocol.converged(Seq(1.0, 12.0, 1.1)))
    // maxWarm exhausted still disagreeing → NOT converged; the min
    // ships but the artifact's `unstable` list names the row
    assert(!Protocol.converged(Seq(1.0, 5.0, 9.0, 13.0, 17.0)))
    // fewer than two successful warm runs → nothing to corroborate
    assert(!Protocol.converged(Seq.empty))
    assert(!Protocol.converged(Seq(1.0)))
    assert(!Protocol.converged(Seq(1.0, -1.0)))
    // floor-bound rows: absolute tolerance applies here too
    assert(Protocol.converged(Seq(0.10, 0.16)))
  }
}
