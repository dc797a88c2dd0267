package graft.plans

import graft.SparkSpec
import graft.operators.VectorOps

class NativeKernelRulesSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.0), Array(2.0, 2.0))
    ).toDF("a", "b")
  }

  test("portable dot-product fold is rewritten to the native kernel") {
    // range (not a LocalRelation) so constant folding can't collapse the
    // whole projection before we inspect it.
    val q = spark.range(3)
      .selectExpr(
        "transform(sequence(0, 4), i -> CAST(i + id AS DOUBLE)) AS a",
        "transform(sequence(0, 4), i -> CAST(i * 2 AS DOUBLE)) AS b")
      .selectExpr(s"${VectorOps.dotApprox("a", "b")} AS d")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"),
      s"expected native kernel in optimized plan:\n$optimized")
    assert(!optimized.contains("aggregate("), "HOF fold should be gone")
  }

  test("rewrite is result-identical to the un-rewritten fold") {
    // Mismatched lengths + null elements: the SQL fold yields NULL; the
    // kernel must too.
    val s = spark
    import s.implicits._
    val edge = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0))),            // length mismatch
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),       // plain
      (None: Option[Array[Double]], Some(Array(1.0)))       // null array
    ).toDF("a", "b")
    val viaRule = edge.selectExpr(s"${VectorOps.dotApprox("a", "b")} AS d")
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(viaRule == Seq(null, 11.0, null))
    // Second row sanity vs direct kernel call.
    val direct = edge.selectExpr("graft_dot(a, b) AS d")
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(direct == viaRule)
  }

  test("null elements inside arrays yield NULL (fold semantics preserved)") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)), " +
      "array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("unrelated folds are left alone") {
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(q.collect()(0).getDouble(0) == 21.0)
  }
}
