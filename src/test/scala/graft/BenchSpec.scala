package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's stall-detection signature — the r17
 *  verdict's one `weak` was a starved draw escaping annotation
 *  because the jit guard used wall as its only denominator. */
class BenchSpec extends AnyFunSuite {

  // 32-core box throughout; cpu/wall/jit from real artifact draws
  private val cores = 32

  test("starved: low own-CPU and jit small vs wall (the classic " +
    "r15 q26 starved draw: 23.9 s wall on ~1.6 busy cores)") {
    assert(Bench.starvedSignature(23.9, 38.0, 900L, cores))
  }

  test("NOT starved: flat-out cores (the r16 q234 contention mode — " +
    "cpu and wall scale together, signature must not fire)") {
    // 7.85 s wall, 120 s cpu = ~48% of 32 cores: not starved
    assert(!Bench.starvedSignature(7.85, 120.0, 800L, cores))
  }

  test("NOT starved: cold-JIT draw (jit ~ wall AND ~ cpu — the r14 " +
    "q234 signature; best-of-N absorbs these, the stall arm must not)") {
    // 12 s wall, 14 s cpu (mostly compiler threads), 10 s of jit:
    // jit is 83% of wall and 71% of cpu — both denominators reject
    assert(!Bench.starvedSignature(12.0, 14.0, 10000L, cores))
  }

  test("starved: the r17 q343 boundary draw — jit 25.8% of a " +
    "trigger-wait-dominated wall but tiny next to cpu (the fixed arm)") {
    // the exact draw that escaped r17's arm: wall 6.42 s, cpu
    // 18.06 s, jit 1655 ms. jit > 25% of wall (old arm: not
    // starved) but < 25% of cpu (new arm: starved) — 18 s of cpu
    // over a 6.4 s wall is not cold code.
    assert(!oldSignature(6.42, 18.06, 1655L))
    assert(Bench.starvedSignature(6.42, 18.06, 1655L, cores))
  }

  test("starved boundary algebra: jit disqualifies only when it is " +
    "large relative to BOTH wall and cpu") {
    // low-cpu draw where jit exceeds 25% of both: a genuinely
    // cold-and-starved draw stays unflagged (conservative)
    assert(!Bench.starvedSignature(10.0, 4.0, 9000L, cores))
    // jit just under 25% of wall, cpu tiny: starved via the wall arm
    assert(Bench.starvedSignature(10.0, 4.0, 2400L, cores))
    // negative jit (platform bean unavailable): never starved —
    // the signature requires evidence, not absence of it
    assert(!Bench.starvedSignature(10.0, 4.0, -1L, cores))
    // failed draw (wall -1): never starved
    assert(!Bench.starvedSignature(-1.0, 0.0, 0L, cores))
  }

  /** The r15–r17 arm, reproduced for the regression pin above. */
  private def oldSignature(wallS: Double, cpuS: Double,
                           jitMs: Long): Boolean =
    wallS > 0 && cpuS < 0.2 * cores * wallS && jitMs >= 0 &&
      jitMs < 250.0 * wallS

  test("calibration spin returns a positive, fixed-work wall time") {
    val ms = Bench.calibrationSpinMs(2)
    assert(ms > 0.0 && ms < 60000.0)
  }
}
