package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  // Membership table: groups {1:(1,2), 2:(2,3), 3:(3,4), 4:(5,6)} — a
  // path 1-2-3-4 plus a disconnected pair 5-6.
  private def membership = {
    val s = spark
    import s.implicits._
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 4L), (4L, 5L), (4L, 6L))
      .toDF("grp", "item")
  }

  test("level-set BFS over groups computes min hop distances") {
    val out = GraphOps.shortestPathsOverGroups(
      spark, membership, "grp", "item", source = 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("maxHops bounds the search") {
    val out = GraphOps.shortestPathsOverGroups(
      spark, membership, "grp", "item", source = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L))
  }

  test("edge-list BFS agrees with the bipartite formulation") {
    val edges = GraphOps.coOccurrenceEdges(membership, "grp", "item")
    val viaEdges = GraphOps.shortestPaths(spark, edges, 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaGroups = GraphOps.shortestPathsOverGroups(
      spark, membership, "grp", "item", 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaEdges == viaGroups)
  }

  test("disconnected nodes are not reached") {
    val out = GraphOps.shortestPathsOverGroups(
      spark, membership, "grp", "item", source = 5L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(5L -> 0L, 6L -> 1L))
  }
}
