package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention guard's math: `load_suspect` must fire exactly when
  * no two passes agree within the threshold — a loaded machine shows
  * wild pass-to-pass spread, a code regression shows consistent slow
  * passes (the BENCH_r04 post-mortem distinction). */
class BenchSpec extends AnyFunSuite {

  test("consistent passes: spread ≈ 1, never suspect") {
    assert(math.abs(Bench.passSpread(Seq(1.0, 1.1)) - 1.1) < 1e-9)
    assert(Bench.passSpread(Seq(2.0, 2.0, 2.0)) === 1.0)
  }

  test("one contended pass among agreeing passes: min is trusted") {
    // pass1 fast, pass2 loaded 10×, pass3 agrees with pass1 →
    // second-smallest/smallest ≈ 1.05, under the 3× trigger
    assert(Bench.passSpread(Seq(1.0, 10.0, 1.05)) < 3.0)
  }

  test("no two passes agree: spread stays pathological") {
    assert(Bench.passSpread(Seq(1.0, 10.0, 7.0)) > 3.0)
    assert(Bench.passSpread(Seq(1.0, 3.5)) > 3.0)
  }

  test("crashed and missing passes are ignored; degenerate inputs are calm") {
    assert(Bench.passSpread(Seq(-1.0, 5.0)) === 1.0)   // one success only
    assert(Bench.passSpread(Seq.empty) === 1.0)
    assert(Bench.passSpread(Seq(0.0, 0.0)) === 1.0)    // sub-resolution times
    assert(Bench.passSpread(Seq(-1.0, 4.0, 5.0)) === 1.25)
  }
}
