package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's self-defense against machine-load contamination
  * (rounds 8–10 each shipped a driver bench with one query inflated 15×
  * by a concurrent process). [[Bench.cleanWarm]] is pure over the rep
  * thunk, so the whole policy is testable with scripted durations.
  */
class BenchPolicySpec extends AnyFunSuite {

  private def scripted(ds: Double*): () => Double = {
    val it = ds.iterator
    () => { assert(it.hasNext, "policy asked for more reps than scripted"); it.next() }
  }

  test("idle machine: exactly 3 reps, old median-of-3 behavior, no flag") {
    val w = Bench.cleanWarm(scripted(1.0, 1.2, 1.1))
    assert(w == Bench.Warm(1.1, 0.2000000000000002, 0, false) ||
      (w.median == 1.1 && w.extra == 0 && !w.dirty))
  }

  test("small absolute jitter under 0.5 s never triggers re-measurement") {
    // sub-floor queries bounce by tens of ms; 50%-of-min alone would fire
    val w = Bench.cleanWarm(scripted(0.08, 0.3, 0.09))
    assert(w.extra == 0 && !w.dirty && w.median == 0.09)
  }

  test("one load-contaminated rep is re-measured away (the g2 shape: 1.8 s real, 20 s loaded)") {
    val w = Bench.cleanWarm(scripted(1.8, 20.4, 1.9, 1.7))
    assert(w.extra == 1, s"one extra rep replaces the dirty one: $w")
    assert(!w.dirty && w.median == 1.8, s"median of the clean best-3: $w")
    assert(w.spread <= 0.5, s"published spread is of the clean reps: $w")
  }

  test("sustained load: gives up after maxExtra reps and flags the query") {
    val reps = Seq(2.0, 9.0, 30.0, 8.0, 25.0, 11.0, 40.0)
    val w = Bench.cleanWarm(scripted(reps: _*), maxExtra = 4)
    assert(w.dirty && w.extra == 4)
    // still publishes the most defensible number: median of the best 3
    assert(w.median == 8.0, s"$w")
  }

  test("load that clears mid-query converges on the clean tail") {
    val w = Bench.cleanWarm(scripted(12.0, 25.0, 11.0, 2.0, 2.1, 1.9))
    assert(!w.dirty && w.extra == 3, s"$w")
    assert(w.median == 2.0, s"best-3 are the post-load reps: $w")
  }

  test("genuinely bimodal-but-proportional reps (JIT) are reported, not laundered") {
    // spread 0.4 < max(0.5, 0.5*0.9): inside tolerance, no extra reps,
    // the spread column still carries the variance for the drift gate
    val w = Bench.cleanWarm(scripted(0.9, 1.3, 1.0))
    assert(w.extra == 0 && !w.dirty && w.spread > 0.39)
  }
}
