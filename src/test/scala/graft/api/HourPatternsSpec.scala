package graft.api

import org.scalatest.funsuite.AnyFunSuite

class HourPatternsSpec extends AnyFunSuite {

  test("template selection follows the reference's keyword precedence") {
    assert(HourPatterns.templateFor(Seq("Coffee", "Retail")) == HourPatterns.Restaurant)
    assert(HourPatterns.templateFor(Seq("Nightlife")) == HourPatterns.Bar)
    assert(HourPatterns.templateFor(Seq("Store")) == HourPatterns.Retail)
    assert(HourPatterns.templateFor(Seq("Plumbing")) == HourPatterns.Default)
    assert(HourPatterns.templateFor(Nil) == HourPatterns.Default)
  }

  test("scaling: peak equals observed max day count, truncating like the reference") {
    val out = HourPatterns.hourDistribution(Seq("restaurant"), Seq(10L, 50L, 30L))
    assert(out.length == 24)
    assert(out.max == 50L) // template peak 25 -> factor 2
    assert(out(12) == 50L && out(6) == 2L)
  }

  test("empty/zero day distribution falls back to peak 100") {
    val out = HourPatterns.hourDistribution(Seq("bar"), Seq(0L, 0L))
    assert(out.max == 100L) // template peak 40 -> factor 2.5
    assert(out(0) == 12L)   // 5 * 2.5 = 12.5 -> truncates to 12
  }

  test("deterministic: same inputs, same output") {
    val a = HourPatterns.hourDistribution(Seq("cafe"), Seq(7L, 3L))
    val b = HourPatterns.hourDistribution(Seq("cafe"), Seq(7L, 3L))
    assert(a == b)
  }
}
