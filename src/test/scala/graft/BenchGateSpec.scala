package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Bench.runGate]] certification — the run-level contention verdict
  * published in the bench headline. The r14 driver run is the regression
  * fixture: it poisoned a whole round's driver-to-driver diff (probe
  * median 0.1105 on floor 0.0662, every key shifted ~1.155× in lockstep)
  * while its headline cal read clean, and an early cut of this gate with
  * calThreshold's 0.2 s absolute grace would ALSO have read it clean.
  */
class BenchGateSpec extends AnyFunSuite {

  test("the r14 poisoned run flags contended") {
    // per-pass probe medians from BENCH_r14's detail: hot throughout
    val probes = Seq(0.095, 0.102, 0.1105, 0.118, 0.131, 0.1105, 0.108)
    val (median, contended) = Bench.runGate(probes, 0.0662)
    assert(median == 0.1105)
    assert(contended, "the r14 run must flag (1.67x the floor)")
    // ...and the 0.2s-grace variant this gate replaced would have
    // silently passed it — the reason the grace is gone
    assert(median <= math.max(0.2, 1.3 * 0.0662))
  }

  test("a clean run does not flag") {
    // probes hugging the floor, one mild burst
    val (median, contended) =
      Bench.runGate(Seq(0.066, 0.068, 0.071, 0.067, 0.12), 0.066)
    assert(!contended)
    assert(median == 0.068)
  }

  test("boundary: exactly 1.3x the floor is NOT contended (strict >)") {
    val (_, contended) = Bench.runGate(Seq(0.13, 0.13, 0.13), 0.1)
    assert(!contended)
    val (_, over) = Bench.runGate(Seq(0.131, 0.131, 0.131), 0.1)
    assert(over)
  }

  test("no probes: median falls back to the floor, never flags") {
    val (median, contended) = Bench.runGate(Nil, 0.09)
    assert(median == 0.09)
    assert(!contended)
  }

  test("median is order-independent (interpolated for even counts)") {
    val shuffled = Seq(0.2, 0.05, 0.11, 0.08)
    val (median, _) = Bench.runGate(shuffled, 0.05)
    assert(math.abs(median - 0.095) < 1e-12,
      "even count takes the mean of the two middles")
    assert(Bench.runGate(shuffled.reverse, 0.05)._1 == median)
  }

  test("even-count median is not lenient: a straddling run flags") {
    // two cool probes, two hot — the lower middle (the r15 ADVICE hole)
    // would read 0.068 and pass; the interpolated median reads the
    // straddle and flags
    val probes = Seq(0.066, 0.068, 0.12, 0.13)
    val (median, contended) = Bench.runGate(probes, 0.066)
    assert(math.abs(median - 0.094) < 1e-12)
    assert(contended, "straddling run must flag (0.094 > 1.3 * 0.066)")
    assert(0.068 <= 1.3 * 0.066, "the lower middle would have passed it")
  }

  /** [[Bench.normMin]] certification — the per-key contention
    * normalization published as queries_norm. The r15 shift (probe
    * median 0.128 on floor 0.084, every key ~1.5x) is the fixture: a
    * sample taken in a hot segment, divided by its segment heat, must
    * land where a cool segment would have put it.
    */
  test("normMin divides out segment heat (r15 uniform-shift fixture)") {
    // one key, one sample, taken while the host ran at 0.128 cal on a
    // 0.084 floor: observed 1.5s normalizes to 1.5 * 0.084/0.128
    val (norm, heat) = Bench.normMin(Seq((1.5, 0.128)), 0.084)
    assert(math.abs(norm - 1.5 * 0.084 / 0.128) < 1e-12)
    assert(heat == 0.128)
  }

  test("normMin picks the best heat-adjusted sample, not the raw min") {
    // raw min 0.9s ran hot (heat 2x floor); the 1.0s sample ran at the
    // floor — heat-adjusted, 0.9/2 = 0.45 < 1.0, so the hot sample wins
    // and is published at its normalized value
    val (norm, heat) = Bench.normMin(Seq((1.0, 0.07), (0.9, 0.14)), 0.07)
    assert(math.abs(norm - 0.45) < 1e-12)
    assert(heat == 0.14)
    // ...and when the cool sample is genuinely better (0.4 < 0.9/2), it wins
    val (n2, h2) = Bench.normMin(Seq((0.4, 0.07), (0.9, 0.14)), 0.07)
    assert(n2 == 0.4 && h2 == 0.07)
  }

  test("normMin skips failed samples and degrades to (-1,-1)") {
    assert(Bench.normMin(Seq((-1.0, 0.1)), 0.07) == ((-1.0, -1.0)))
    assert(Bench.normMin(Nil, 0.07) == ((-1.0, -1.0)))
    // a failed sample among good ones is ignored
    val (norm, _) = Bench.normMin(Seq((-1.0, 0.1), (2.0, 0.07)), 0.07)
    assert(norm == 2.0)
  }

  test("normMin at floor heat is the identity") {
    val (norm, heat) = Bench.normMin(Seq((1.234, 0.084)), 0.084)
    assert(math.abs(norm - 1.234) < 1e-12 && heat == 0.084)
  }
}
