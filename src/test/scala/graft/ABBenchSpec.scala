package graft

import org.scalatest.funsuite.AnyFunSuite

/** The A/B reproduction gate's decision function (r15 verdict queue
  * #2): a mover in ONE interleaved run is host-window noise by
  * protocol; the same query beyond the band ON THE SAME SIDE in two
  * independent runs is a real code delta. Pure-function spec — the
  * main wires it to the prior committed artifact. */
class ABBenchSpec extends AnyFunSuite {
  private val band = 1.3

  test("a mover reproduces only when both runs clear the band on the same side") {
    val prev = Map("slow" -> 1.5, "fast" -> 0.7, "noise" -> 1.4, "flip" -> 1.6)
    val cur = Map(
      "slow" -> 1.35,  // regression in both → reproduced
      "fast" -> 0.75,  // improvement in both → reproduced (recorded, not gating)
      "noise" -> 1.05, // inside the band now → one-run noise
      "flip" -> 0.7,   // crossed sides → not a reproduction
      "new" -> 2.0)    // no prior → single-run mover
    val got = ABBench.reproducedMovers(prev, cur, band)
    assert(got == Map("slow" -> ((1.5, 1.35)), "fast" -> ((0.7, 0.75))))
    // The regression side is what gates (mirrors the main's exit rule).
    assert(got.filter(_._2._2 > 1.0).keySet == Set("slow"))
  }

  test("no prior artifact / different comparison = nothing reproduces") {
    assert(ABBench.reproducedMovers(Map.empty, Map("q" -> 9.0), band).isEmpty)
  }
}
