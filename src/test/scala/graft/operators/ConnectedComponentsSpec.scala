package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  test("components labeled by min member id; chains converge; isolated pairs separate") {
    val s = spark
    import s.implicits._
    // Components: {1,2,3,4} (a chain), {10,11}, {20,21,22} (a triangle).
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("src", "dst")
    val out = GraphOps.connectedComponents(spark, edges, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge set yields empty labels (no NPE)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.connectedComponents(spark, empty, maxIter = 3).count() == 0)
  }

  test("maxIter bounds propagation depth on long chains") {
    val s = spark
    import s.implicits._
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val full = GraphOps.connectedComponents(spark, chain, maxIter = 10)
      .collect().map(r => r.getLong(1)).distinct
    assert(full sameElements Array(1L))
    val truncated = GraphOps.connectedComponents(spark, chain, maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // After one pass node 8 has only seen its neighbor's initial label.
    assert(truncated(8L) == 7L)
  }
}
