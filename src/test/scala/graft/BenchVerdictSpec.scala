package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forced-contamination unit test of the bench box-health verdict
 * (VERDICT r11 #5): the verdict logic is pure ([[Bench.boxVerdict]]) so
 * every contamination mode — canary band breach, pass-spread breach,
 * missing canary — is exercised without running a bench. */
class BenchVerdictSpec extends AnyFunSuite {

  private val band = 0.55

  test("clean: canary inside 1.5x band, pass spread <= 2x") {
    val v = Bench.boxVerdict(0.32, band, Seq(10.0, 11.0, 10.5))
    assert(v.verdict == "clean" && v.canaryOk && v.spreadOk)
  }

  test("contaminated: canary min above 1.5x band (the r10/r11 capture mode)") {
    // r11's driver capture: canary 1.04 vs band 0.55 -> 1.9x, over the 1.5x line
    val v = Bench.boxVerdict(1.04, band, Seq(10.0, 11.0, 10.5))
    assert(v.verdict == "contaminated" && !v.canaryOk && v.spreadOk)
  }

  test("contaminated: pass spread above 2x even with a clean canary (r10's 105/60/215 mode)") {
    val v = Bench.boxVerdict(0.32, band, Seq(105.0, 60.0, 215.0))
    assert(v.verdict == "contaminated" && v.canaryOk && !v.spreadOk)
    assert(math.abs(v.passSpread - 215.0 / 60.0) < 1e-9)
  }

  test("canary exactly at 1.5x band is still clean (boundary inclusive)") {
    val v = Bench.boxVerdict(1.5 * band, band, Seq(10.0, 10.0, 10.0))
    assert(v.verdict == "clean")
  }

  test("unknown, not contaminated, when the canary sample is absent (subset run)") {
    // ADVICE r11: a SPARK_GRAFT_ONLY subset excluding the whisper scan has
    // canaryMin = -1; calling that contaminated burned roundclose's retry
    // budget on clean runs. No evidence -> "unknown"; gates key on the
    // explicit "contaminated" only.
    val v = Bench.boxVerdict(-1.0, band, Seq(10.0, 10.0, 10.0))
    assert(v.verdict == "unknown" && !v.canaryOk)
  }

  test("unknown wins over a broken pass-totals vector too") {
    assert(Bench.boxVerdict(-1.0, band, Seq.empty).verdict == "unknown")
    assert(Bench.boxVerdict(-1.0, band, Seq(0.0, 5.0)).verdict == "unknown")
  }

  test("contaminated, not unknown, when the canary is absent but the spread breaches (ADVICE r12)") {
    // a failed canary fixture plus a 10x pass spread is positive evidence
    // of contamination; "unknown" is reserved for NO signal either way
    val v = Bench.boxVerdict(-1.0, band, Seq(10.0, 100.0, 12.0))
    assert(v.verdict == "contaminated" && !v.canaryOk && !v.spreadOk)
  }

  test("contaminated when canary present but pass totals unusable") {
    // all-error passes (totals 0) with a live canary: the record cannot
    // vouch for its mins, and the canary existing means the box WAS
    // measured -- not an evidence vacuum
    val v = Bench.boxVerdict(0.32, band, Seq(0.0, 0.0, 0.0))
    assert(v.verdict == "contaminated" && !v.spreadOk && v.passSpread == -1.0)
  }
}
