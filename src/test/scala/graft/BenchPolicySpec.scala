package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decision-table spec for the bench suite's contention policy (r13).
  * The r12 failure this guards: a 34× machine-load spike
  * (q_dunning_llr 19.786 s vs 0.587 s drained) entered the graded
  * artifact because min-of-reps had nothing clean to keep. The policy
  * must reject exactly that — and nothing that looks like honest
  * variance.
  */
class BenchPolicySpec extends AnyFunSuite {
  import BenchPolicy._

  test("honest warm variance is never suspect") {
    assert(!suspect(runningMin = 0.50, repS = 0.90))   // 1.8x, heavy-ish
    assert(!suspect(runningMin = 2.00, repS = 2.90))   // +0.9s, < floor+ratio
    assert(!suspect(runningMin = 0.05, repS = 0.90))   // tiny query, +0.85s < 1s floor
  }

  test("the r12 spike shape is suspect; sub-second noise is not") {
    assert(suspect(runningMin = 0.587, repS = 19.786)) // the actual r12 case
    assert(suspect(runningMin = 1.0, repS = 3.5))
    // ratio alone is NOT enough below the absolute floor: a 0.1s query
    // reading 0.4s is 4x but only +0.3s — thrashing on that would burn
    // the retry budget on scheduler jitter
    assert(!suspect(runningMin = 0.1, repS = 0.4))
  }

  test("rejection requires confirmed external load") {
    // suspect + idle machine → KEEP (may be real variance; dropping it
    // with no evidence would bias the suite fast)
    assert(!reject(0.587, 19.786, extBusy = 0.02, extrasUsed = 0,
      suiteExtrasLeft = 30, budgetOk = true))
    // suspect + busy machine → reject and re-run
    assert(reject(0.587, 19.786, extBusy = 0.40, extrasUsed = 0,
      suiteExtrasLeft = 30, budgetOk = true))
    // a failed busy sample (-1 outside procfs) reads as no evidence
    assert(!reject(0.587, 19.786, extBusy = -1.0, extrasUsed = 0,
      suiteExtrasLeft = 30, budgetOk = true))
  }

  test("retries are bounded per query, per suite, and by budget") {
    assert(!reject(0.587, 19.786, 0.40, extrasUsed = MaxExtrasPerQuery,
      suiteExtrasLeft = 30, budgetOk = true))
    assert(!reject(0.587, 19.786, 0.40, extrasUsed = 0,
      suiteExtrasLeft = 0, budgetOk = true))
    assert(!reject(0.587, 19.786, 0.40, extrasUsed = 0,
      suiteExtrasLeft = 30, budgetOk = false))
  }

  test("cold attribution (r14): routine warmup quiet, real spike flagged, never vs no warm") {
    // 2-3x warm IS the value cold exists to carry (codegen + AQE warmup)
    assert(!coldSuspect(warmMin = 0.2, coldS = 0.6))
    assert(!coldSuspect(warmMin = 1.0, coldS = 2.9))
    // 4x on a sub-second query: above the warm ratio, under the cold
    // floor — flagging this class would spam the contention map with
    // every ordinary warmup
    assert(!coldSuspect(warmMin = 0.3, coldS = 1.2))
    // the attributable shape: well past both the 5x ratio and +2s floor
    assert(coldSuspect(warmMin = 1.0, coldS = 8.0))
    assert(coldSuspect(warmMin = 0.5, coldS = 4.0))
    // no successful warm rep → no baseline → never suspect
    assert(!coldSuspect(warmMin = -1.0, coldS = 60.0))
  }

  test("simulated suite walk: the spike is rejected, the clean reps win, caps hold") {
    // reps as the loop would see them: cold 0.6, then [18.0 busy, 0.55,
    // 17.5 busy, 0.58] with a 2-extra cap — both spikes rejected, two
    // clean reps accepted, running min tracks every observation
    var runningMin = 0.6
    var extras = 0
    val accepted = Seq.newBuilder[Double]
    for ((t, busy) <- Seq((18.0, 0.5), (0.55, 0.0), (17.5, 0.6), (0.58, 0.0))) {
      val drop = suspect(runningMin, t) &&
        reject(runningMin, t, busy, extras, suiteExtrasLeft = 30 - extras, budgetOk = true)
      runningMin = math.min(runningMin, t)
      if (drop) extras += 1 else accepted += t
    }
    assert(accepted.result() == Seq(0.55, 0.58) && extras == 2)
    // and the unresolved check on the surviving p50 stays quiet
    assert(!suspect(runningMin, 0.58))
  }
}
