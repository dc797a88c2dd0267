package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph-shaped operators over edge DataFrames (edge = join key — see
  * SURVEY.md §1.1). The reference's Cypher patterns (J10-J17,
  * webapp/neo4j_routes.py) are self-joins plus, for variable-length
  * paths, a bounded iterative BFS.
  */
object GraphOps {

  /** Bounded-depth single-source BFS: minimum hop distance from `source`
    * to every reachable node within `maxHops` (reference shortestPath
    * ≤6 hops: webapp/neo4j_routes.py:768-777 — J17).
    *
    * `edges` must be a directed edge list `(src, dst)`; pass both
    * directions for an undirected graph. Each iteration is one
    * distributed hash join + anti-join against the visited set — the
    * standard scalable BFS (frontier and visited stay distributed; no
    * driver-side collection). Iterations are bounded (≤ maxHops) and
    * each frontier is persisted to keep lineage linear.
    */
  def shortestPaths(spark: SparkSession, edges: DataFrame,
                    source: Long, maxHops: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited.select("node")
    var d = 0L
    var done = false
    while (d < maxHops && !done) {
      d += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (next.isEmpty) done = true
      else {
        visited = visited
          .unionByName(next.select(col("node"), lit(d).as("dist")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** Undirected co-occurrence edges: items sharing a group key, one row
    * per (group, a, b) with a != b in both directions. J10/J15 shape.
    */
  def coOccurrenceEdges(items: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val a = items.select(col(groupCol).as("__g"), col(itemCol).as("src"))
    val b = items.select(col(groupCol).as("__g"), col(itemCol).as("dst"))
    a.join(b, "__g").filter(col("src") =!= col("dst")).select("src", "dst").distinct()
  }
}
