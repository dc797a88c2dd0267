package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.InternalCheckpoint
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
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](e, visited)
    var frontier = visited.select("node")
    var d = 0L
    var done = false
    while (d < maxHops && !done) {
      d += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      caches += next
      if (next.isEmpty) done = true
      else {
        visited = visited
          .unionByName(next.select(col("node"), lit(d).as("dist")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        caches += visited
        frontier = next
      }
    }
    // Hand back off the cache manager (see connectedComponents): the
    // returned set otherwise reads per-hop caches the caller can't
    // release. InternalCheckpoint.pin — no Row round-trip.
    val (out, outRdd) = InternalCheckpoint.pin(spark, visited)
    outRdd.count()
    caches.foreach(_.unpersist())
    out
  }

  /** Connected components by min-label propagation: every node adopts
    * the smallest label reachable within `maxIter` hops (for true
    * components, maxIter ≥ graph diameter; near-dup clusters are
    * near-cliques, so a handful of iterations converges). Each
    * iteration is one shuffle on node id — the standard large-scale
    * alternative to a driver-side union-find, used to turn near-dup
    * PAIRS into dedup GROUPS. Converges early when a pass changes no
    * label. Output: (node, component = min node id in component);
    * isolated nodes absent from `edges` don't appear.
    */
  /** Per-iteration convergence: labels only decrease, so an unchanged
    * label SUM (one cheap aggregate on the cached frame) means done.
    * The aggregate also serves a second, load-bearing purpose: it
    * MATERIALIZES each iteration's cache before the next one builds on
    * it. A fully lazy chain (no action until the caller's) measured
    * ~45× slower here — the un-materialized persisted frames get
    * recomputed through the deep lineage instead of reused. Iterative
    * Spark algorithms need an action per iteration.
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int): DataFrame = {
    // CALLER CONTRACT: pass `edges` with SHALLOW lineage (a staged
    // LogicalRDD, a just-written table, a localCheckpoint). Every
    // action inside this loop re-ANALYZES the input's logical plan even
    // when its data is cached; with a deep pipeline as lineage that
    // cost ~3 s per action — 20 s for a 100-edge fold (measured,
    // DedupIndex.append round 7).
    //
    // The undirected closure references `edges` TWICE (one union branch
    // per direction): persist the input first or its whole upstream
    // pipeline (for dedup components, the capped-index candidate
    // generation + Jaccard verify — seconds of work) executes once per
    // branch.
    val eIn = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val undWide = eIn
      .unionByName(eIn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Small-graph fast path: verified near-dup edge sets are usually a
    // tiny fraction of the corpus, but each loop iteration still pays
    // full multi-partition job overhead — dominating wall-clock when the
    // graph is a few hundred edges. Coalescing the CACHED frame to one
    // partition (a re-map, no shuffle) turns every iteration into a
    // 1-task job; above the threshold the plan is unchanged.
    val und =
      if (undWide.count() <= 100000L) undWide.coalesce(1) else undWide
    // `labelsCache` is the persisted handle of the CURRENT labels (the
    // lineage-cut `labels` frame reads it but cannot unpersist it).
    var labelsCache = und.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels: DataFrame = labelsCache
    // sum() over zero rows is NULL — coalesce so an empty edge set
    // (nothing passed the caller's pair filter) converges immediately
    // instead of NPE-ing.
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("component"))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = labelSum(labelsCache)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      iter += 1
      val viaNeighbor = und
        .join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("component"))
      val nextWide = labels.select(col("node"), col("component"))
        .unionByName(viaNeighbor)
        .groupBy(col("node")).agg(min(col("component")).as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(nextWide) // also materializes next's cache
      labelsCache.unpersist() // superseded; nextWide is materialized above
      labelsCache = nextWide
      // Lineage cut (see shortestPathsOverGroups): without it iteration
      // k's analyzer pass re-resolves all k-1 previous join/agg layers —
      // quadratic DRIVER time that dominates converged loops. wrap =
      // LogicalRDD over the cached rows, no Row conversion per read.
      labels = InternalCheckpoint.wrap(spark, nextWide)
      if (nextSum == prevSum) converged = true
      prevSum = nextSum
    }
    // Hand the result back OFF the cache manager: the returned frame
    // used to read the final iteration's persisted cache, which the
    // caller had no handle to release — every lifecycle invocation
    // leaked one cached label frame into the session. localCheckpoint
    // materializes the labels from the still-cached frame into RDD
    // blocks the ContextCleaner reclaims when the frame is dropped,
    // and the cache entry itself is released here.
    val (out, outRdd) = InternalCheckpoint.pin(spark, labelsCache)
    outRdd.count() // materialize before the cache below it goes away
    labelsCache.unpersist()
    undWide.unpersist(); eIn.unpersist()
    out
  }

  /** Undirected co-occurrence edges: items sharing a group key, one row
    * per (group, a, b) with a != b in both directions. J10/J15 shape.
    *
    * NOTE: materializes the full pairwise edge list — O(Σ groupSize²).
    * For BFS over a co-occurrence graph prefer [[shortestPathsOverGroups]],
    * which never builds the quadratic list.
    */
  def coOccurrenceEdges(items: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val a = items.select(col(groupCol).as("__g"), col(itemCol).as("src"))
    val b = items.select(col(groupCol).as("__g"), col(itemCol).as("dst"))
    a.join(b, "__g").filter(col("src") =!= col("dst")).select("src", "dst").distinct()
  }

  /** BFS over the *implicit* co-occurrence graph of a bipartite membership
    * table `(group, item)` — two items are adjacent iff they share a group.
    *
    * Equivalent to `shortestPaths(coOccurrenceEdges(m), …)` but never
    * materializes the O(Σ groupSize²) edge list: each co-occurrence hop is
    * two linear joins against the membership table (item-frontier → groups
    * → items), so per-iteration cost is O(|membership|) shuffle, not
    * O(edges). At 100 TB the membership table is the fact table itself and
    * the quadratic edge list would dwarf it — this is the only BFS shape
    * that survives. Self-loops are excluded for free: the source is in
    * `visited` before the first expansion.
    */
  def shortestPathsOverGroups(spark: SparkSession, membership: DataFrame,
                              groupCol: String, itemCol: String,
                              source: Long, maxHops: Int,
                              broadcastFrontier: Boolean = true,
                              stopAtNode: Option[Long] = None): DataFrame = {
    val m = membership
      .select(col(groupCol).cast("long").as("grp"), col(itemCol).cast("long").as("item"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Monotone level-set BFS: reach_d = N(reach_{d-1}) (N(S) ⊇ S because
    // every item shares its groups with itself), and the BFS distance is
    // the first level an item appears in — computed as one min(dist) agg
    // at the end. Compared to frontier+anti-join BFS this runs as a
    // SINGLE lazy plan: no per-hop emptiness action, no anti-joins, just
    // maxHops × (2 map-side joins + 2 small distincts) and one final agg.
    //
    // Reach sets are node sets — orders of magnitude smaller than the
    // membership fact — so broadcasting them keeps every m-join map-side
    // (m itself NEVER shuffles). For graphs whose node set exceeds
    // broadcast size, pass broadcastFrontier = false for shuffle joins.
    // Each level persists because it feeds both the next expansion and
    // the final union; materialization happens inside the caller's one
    // action.
    def bc(df: DataFrame): DataFrame = if (broadcastFrontier) broadcast(df) else df
    var reach = spark.range(1).select(lit(source).as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](m, reach)
    var levels = Vector(reach.select(col("node"), lit(0L).as("dist")))
    // reach_d = N(reach_{d-1}) ⊇ reach_{d-1}, so an unchanged count
    // means the set is stable and every later level is identical — stop.
    // The count also eagerly materializes each level's cache (iterative
    // persisted chains recompute through lineage otherwise).
    var prevCount = 1L
    var d = 0
    var saturated = false
    while (d < maxHops && !saturated) {
      d += 1
      val groups = m.join(bc(reach), m("item") === reach("node"))
        .select(col("grp")).distinct()
      val nextWide = m.join(bc(groups), "grp")
        .select(col("item").as("node")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      caches += nextWide
      // ONE action per level (§2.6-adjacent: fewer sequential jobs):
      // the level count (which materializes the cache) and the
      // point-to-point early-exit probe ride the same aggregate —
      // the separate per-hop filter/limit job this replaces doubled
      // the level's fixed job latency.
      val stats = nextWide.agg(count(lit(1)).as("n"),
          stopAtNode.map(tgt => sum(when(col("node") === tgt, 1L)))
            .getOrElse(lit(null).cast("long")).as("hit"))
        .collect()(0)
      val n = stats.getLong(0)
      val hitTarget = !stats.isNullAt(1) && stats.getLong(1) > 0
      // Lineage cut on the MATERIALIZED level: persist() caches the
      // DATA but the logical plan still contains the whole BFS history,
      // and every subsequent Dataset operation re-runs the analyzer
      // (DeduplicateRelations over the d self-joined copies of m) on
      // that growing tree — measured ~3 s of pure DRIVER time by level
      // 6, dwarfing the actual jobs. A LogicalRDD over the cached rows
      // keeps analysis O(one level).
      val next = InternalCheckpoint.wrap(spark, nextWide)
      if (n == prevCount) saturated = true
      else {
        levels = levels :+ next.select(col("node"), lit(d.toLong).as("dist"))
        reach = next
        prevCount = n
        // Point-to-point early exit: once the caller's target is in the
        // reach set its distance is final (BFS level property), so
        // deeper expansions — including the full-graph saturating level,
        // the most expensive one — are pure waste.
        if (hitTarget) saturated = true
      }
    }
    // Result handed back OFF the cache manager (see the same pattern in
    // connectedComponents): the min-dist fold reads every level cache,
    // so materialize it into checkpoint blocks first, then release all
    // per-level caches — the caller has no handles to them.
    val resWide = levels.reduce(_ unionByName _)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    val (out, outRdd) = InternalCheckpoint.pin(spark, resWide)
    outRdd.count()
    caches.foreach(_.unpersist())
    out
  }

  /** BFS that ALSO captures each node's deterministic predecessor,
    * fused into the level expansion. Parent(n first reached at level d)
    * = min over n's groups of the min reach-item in that group — equal
    * to the oracle's "MIN neighbor at dist d-1" because a group
    * containing n cannot hold any node of dist ≤ d-2 (n would have been
    * reached earlier), so "min over reach" IS "min over exact level
    * d-1". The per-level joins are the SAME two the distance BFS runs;
    * only the distincts become min-aggregates — no separate parent-map
    * build over the membership table afterwards.
    *
    * `broadcastFrontier` gates the reach-set and per-level group-minima
    * broadcasts exactly like [[shortestPathsOverGroups]] — on a large
    * saturating graph those frames approach the node set and an
    * unconditional broadcast would exceed driver/executor memory with no
    * fallback; `false` switches both joins to shuffles.
    *
    * Returns (node, dist, parent) with parent NULL for the source —
    * PERSISTED and already materialized: the per-level caches this BFS
    * accumulates are unpersisted before returning (they are consumed by
    * the one materializing count here), so the caller owns exactly one
    * cache entry and unpersists it when done.
    */
  private def distWithParents(spark: SparkSession, membership: DataFrame,
                              groupCol: String, itemCol: String,
                              source: Long, maxHops: Int,
                              stopAtNode: Long,
                              broadcastFrontier: Boolean = true): DataFrame = {
    val m = membership
      .select(col(groupCol).cast("long").as("grp"), col(itemCol).cast("long").as("item"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def bc(df: DataFrame): DataFrame = if (broadcastFrontier) broadcast(df) else df
    val levelCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var reach = spark.range(1).select(lit(source).as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    levelCaches += reach
    var levels = Vector(reach.select(col("node"), lit(0L).as("dist"),
      lit(null).cast("long").as("parent")))
    var prevCount = 1L
    var d = 0
    var saturated = false
    while (d < maxHops && !saturated) {
      d += 1
      // min reach-item per touched group (was: distinct grp).
      val gmin = m.join(bc(reach), m("item") === reach("node"))
        .groupBy(col("grp")).agg(min(col("node")).as("gmin"))
      // all items of touched groups with their min-over-groups parent
      // candidate (was: distinct item).
      val nextWide = m.join(bc(gmin), "grp")
        .groupBy(col("item")).agg(min(col("gmin")).as("parent"))
        .select(col("item").as("node"), col("parent"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      levelCaches += nextWide
      // One action per level: count + target probe fused (see
      // shortestPathsOverGroups).
      val stats = nextWide.agg(count(lit(1)).as("n"),
          sum(when(col("node") === stopAtNode, 1L)).as("hit"))
        .collect()(0)
      val n = stats.getLong(0)
      val hitTarget = !stats.isNullAt(1) && stats.getLong(1) > 0
      val next = InternalCheckpoint.wrap(spark, nextWide) // lineage cut
      if (n == prevCount) saturated = true
      else {
        levels = levels :+ next.select(col("node"), lit(d.toLong).as("dist"), col("parent"))
        reach = next.select(col("node"))
        prevCount = n
        if (hitTarget) saturated = true
      }
    }
    // First appearance wins: dist is the struct's leading field, so the
    // min picks the earliest level's (dist, parent) pair.
    val out = levels.reduce(_ unionByName _)
      .groupBy(col("node"))
      .agg(min(struct(col("dist"), col("parent"))).as("dp"))
      .select(col("node"), col("dp.dist").as("dist"), col("dp.parent").as("parent"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize BEFORE dropping the level caches it reads
    levelCaches.foreach(_.unpersist())
    m.unpersist()
    out
  }

  /** Shortest-path NODE SEQUENCE source→target over the implicit
    * co-occurrence graph — the reference's shortestPath returns the
    * path's nodes, not just the distance
    * (webapp/neo4j_routes.py:768-777 `UNWIND nodes(path)`).
    *
    * Deterministic among equal-length paths: every node's predecessor is
    * its MINIMUM-id neighbor at distance d-1, so the reconstructed path
    * is unique — and an oracle can reproduce it relationally
    * (parent(n) = MIN(src) over edges with dist(src) = dist(n) - 1).
    *
    * Scale shape: distances AND parents come out of one fused BFS
    * ([[distWithParents]] — per-level membership joins only, no
    * quadratic edge list, no post-hoc parent-map pass), and the
    * back-walk folds over a single map<node,parent> row in one job.
    *
    * Output: one row per path position `(step, node)`, step 0 = source;
    * empty if `target` is unreachable within `maxHops`.
    */
  def shortestPathNodesOverGroups(spark: SparkSession, membership: DataFrame,
                                  groupCol: String, itemCol: String,
                                  source: Long, target: Long, maxHops: Int,
                                  broadcastFrontier: Boolean = true): DataFrame = {
    import spark.implicits._
    // Already persisted + materialized by distWithParents (which owns
    // and frees its per-level caches); this function owns `dp`.
    val dp = distWithParents(spark, membership, groupCol, itemCol,
        source, maxHops, stopAtNode = target, broadcastFrontier)
    val targetDist = dp.filter(col("node") === target).select(col("dist")).collect()
    if (targetDist.isEmpty) {
      dp.unpersist()
      return Seq.empty[(Long, Long)].toDF("step", "node")
    }
    val d = targetDist(0).getLong(0)
    if (d == 0) {
      dp.unpersist()
      return Seq((0L, target)).toDF("step", "node")
    }
    val reachedSmall = dp.count() <= 5000000L
    // Path ancestors live at dist 1..d — deeper nodes never enter the
    // walk map.
    val pmWide = dp.filter(col("dist") <= d && col("dist") >= 1)
      .select(col("node").as("item"), col("parent"))
    // The back-walk. Small reached set (the common case, same guard as
    // the broadcasts): the parent map collapses to a single
    // map<node,parent> row and the whole ≤ maxHops walk is a fold over
    // it inside one projection — ONE job, no per-hop actions (the
    // round-3 shape collected once per hop), no d-deep lazy join chain
    // (measured slower than the collect loop: d² tiny join stages of
    // pure overhead). Huge reached set: fall back to ≤ maxHops
    // distributed point lookups on the cached map — bounded by the hop
    // limit, never by data size.
    val path: Seq[(Long, Long)] =
      if (reachedSmall) {
        pmWide
          .groupBy()
          .agg(map_from_entries(collect_list(struct(col("item"), col("parent")))).as("pm"))
          .selectExpr(
            s"""aggregate(sequence(CAST(1 AS BIGINT), CAST($d AS BIGINT)),
               |  array(CAST($target AS BIGINT)),
               |  (acc, x) -> array_append(acc, element_at(pm, element_at(acc, -1))))
               |AS nodes""".stripMargin)
          .selectExpr("posexplode(nodes) AS (i, node)")
          .selectExpr(s"CAST($d - i AS BIGINT) AS step", "node")
          .collect().map { r =>
            require(!r.isNullAt(1),
              s"BFS invariant broken: no parent at step ${r.getLong(0)}")
            (r.getLong(0), r.getLong(1))
          }.toSeq
      } else {
        val pm = pmWide.persist(StorageLevel.MEMORY_AND_DISK)
        val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
        var cur = target
        var step = d
        buf += ((step, cur))
        while (step > 0) {
          val p = pm.filter(col("item") === cur).select(col("parent")).collect()
          require(p.nonEmpty, s"BFS invariant broken: no parent for $cur at step $step")
          cur = p(0).getLong(0)
          step -= 1
          buf += ((step, cur))
        }
        pm.unpersist()
        buf.toSeq
      }
    require(path.length == d + 1,
      s"BFS invariant broken: expected ${d + 1} path nodes, got ${path.length}")
    dp.unpersist()
    path.sortBy(_._1).toDF("step", "node")
  }
}
