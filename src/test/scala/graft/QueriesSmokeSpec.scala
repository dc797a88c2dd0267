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

  test("every query has a DuckDB oracle") {
    // Since round 6 even q_sketch_builtin is oracle-checked (its output
    // is deterministic error-bound booleans, not raw sketch values), so
    // the oracle-less set must stay EMPTY — a new query without an
    // oracle gets only the driver's weaker rows>0 smoke and fails here.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
  }
}
