package graft

/** Every registered query must run end-to-end on the smallest SF and
  * (for the flagship) return rows — the local twin of the driver's t1
  * smoke gate. The DuckDB value-equality gate is tools/check.py.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 without error") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, SparkSpec.Sf0001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL exists for every query or is explicitly absent") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Queries without an oracle only get the driver's rows>0 smoke —
    // keep the list deliberate. q_sketch_builtin surfaces Spark's own
    // HLL++/percentile_approx sketches, whose layouts no other engine
    // reproduces; KMinSpec bounds their error against exact aggregation.
    assert(noOracle == Set("q_sketch_builtin"),
      s"unexpected oracle-less queries: $noOracle")
  }
}
