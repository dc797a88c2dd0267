package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.GraphOps
import graft.sources.Tables

/** Graph-family queries (SURVEY.md §2.3 J10-J17, §2.4 A18-A20): the
  * reference's Neo4j patterns re-expressed as distributed self-joins,
  * with variable-length shortestPath as bounded iterative BFS.
  *
  * The graph here: parts are nodes; co-purchase (same order) is the
  * edge relation; customers are the linking entities — mirroring the
  * reference's business/category/user graph
  * (webapp/neo4j_routes.py:442-468,516-602).
  */
object GraphQueries {

  private val TargetPart = 1L
  private val TargetCustomer = 1L
  // Path-reconstruction destination: dist 2 from part 1 at sf0.001/0.01,
  // dist 3 at sf0.1 — exercises a multi-hop walk at every test SF.
  private val PathDstPart = 150L

  /** Distinct customer ids that bought `partkey` — a tiny set built from
    * pushed-down scans only (lineitem filtered on the part, orders
    * semi-joined on those orderkeys), safe to broadcast at any scale.
    */
  private def buyersOf(t: Tables, partkey: Long): DataFrame =
    broadcast(t.orders
      .join(t.lineitem.filter(col("l_partkey") === partkey).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_custkey").as("custkey")).distinct())

  /** Distinct `(custkey, partkey)` purchases restricted to a broadcast
    * customer set: orders shrink via semi-join BEFORE touching lineitem,
    * so the one fact⋈fact join runs over the restricted orders only —
    * never the full purchases view. This filter-first shape is what keeps
    * the 4-hop graph patterns linear at 100 TB.
    */
  private def purchasesBy(t: Tables, custs: DataFrame): DataFrame =
    t.lineitem
      .join(t.orders.join(custs, col("o_custkey") === custs("custkey"), "left_semi"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .distinct()

  val defs: Seq[QueryDef] = Seq(

    // J15 (category co-occurrence w/ theta dedup `a < b`) — top co-purchased
    // part pairs. Self-join on the order key; countDistinct dedupes repeated
    // parts within one order. Ref: webapp/neo4j_routes.py:860-866.
    QueryDef(
      "q_graph_copurchase_pairs",
      t => {
        // Dedup (order, part) BEFORE the self-join: each pair then occurs
        // once per order, so the agg is a plain count — no countDistinct
        // expand, and the self-join input is the smallest it can be.
        // (An r17 rewrite to per-order collect_set + row-local pair
        // expansion — 2 exchanges instead of 4 — MEASURED SLOWER here,
        // 1.25 s -> 1.45-1.75 s at sf0.1 across two interleaved A/B
        // windows: the ObjectHashAggregate set buffers cost more than
        // the whole-stage-codegen'd hash self-join on this shape, so the
        // join form stays. See OPTIMIZATION_r17.md.)
        val m = t.lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        m.select(col("ok"), col("p").as("p1"))
          .join(m.select(col("ok"), col("p").as("p2")), "ok")
          .filter(col("p1") < col("p2"))
          .groupBy(col("p1"), col("p2"))
          .agg(count(lit(1)).as("co_cnt"))
          .orderBy(col("co_cnt").desc, col("p1").asc, col("p2").asc)
          .limit(20)
      },
      Some("""
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
          COUNT(DISTINCT a.l_orderkey) AS co_cnt
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY p1, p2
        ORDER BY co_cnt DESC, p1, p2
        LIMIT 20""")),

    // J11 ("customers who bought X also bought") — 4-hop pattern:
    // part → orders → customers → orders → parts.
    // Ref: webapp/neo4j_routes.py:458-468,577-591.
    QueryDef(
      "q_graph_also_bought",
      t => purchasesBy(t, buyersOf(t, TargetPart))
        .filter(col("partkey") =!= TargetPart)
        .groupBy(col("partkey"))
        .agg(count(lit(1)).as("shared_customers"))
        .orderBy(col("shared_customers").desc, col("partkey").asc)
        .limit(10),
      Some(s"""
        WITH purchases AS (
          SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        buyers AS (SELECT DISTINCT custkey FROM purchases WHERE partkey = $TargetPart)
        SELECT partkey, COUNT(DISTINCT p.custkey) AS shared_customers
        FROM purchases p JOIN buyers USING (custkey)
        WHERE partkey <> $TargetPart
        GROUP BY partkey
        ORDER BY shared_customers DESC, partkey
        LIMIT 10""")),

    // J12 (complementary = also-bought MINUS same-category) — co-purchased
    // parts whose p_type differs from the target's (the anti-join on
    // shared category). Ref: webapp/neo4j_routes.py:553-571.
    QueryDef(
      "q_graph_complementary",
      t => {
        val targetType = t.part.filter(col("p_partkey") === TargetPart)
          .select(col("p_type").as("__target_type"))
        purchasesBy(t, buyersOf(t, TargetPart))
          .filter(col("partkey") =!= TargetPart)
          .join(t.part, col("partkey") === col("p_partkey"))
          .crossJoin(broadcast(targetType))
          .filter(col("p_type") =!= col("__target_type"))
          .groupBy(col("partkey"), col("p_type"))
          .agg(count(lit(1)).as("shared_customers"))
          .orderBy(col("shared_customers").desc, col("partkey").asc)
          .limit(10)
      },
      Some(s"""
        WITH purchases AS (
          SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        buyers AS (SELECT DISTINCT custkey FROM purchases WHERE partkey = $TargetPart)
        SELECT partkey, p_type, COUNT(DISTINCT p.custkey) AS shared_customers
        FROM purchases p
        JOIN buyers USING (custkey)
        JOIN part ON partkey = p_partkey
        WHERE partkey <> $TargetPart
          AND p_type <> (SELECT p_type FROM part WHERE p_partkey = $TargetPart)
        GROUP BY partkey, p_type
        ORDER BY shared_customers DESC, partkey
        LIMIT 10""")),

    // J13/J14 (collaborative filtering with anti-join on own history):
    // customer → parts → co-buyers → their parts, minus the customer's own.
    // Ref: webapp/neo4j_routes.py:640-677.
    QueryDef(
      "q_graph_cf_recommend",
      t => {
        // Filter-first: the target customer's parts come from their own
        // (few) orders; co-buyers from lineitem restricted to those parts;
        // the only unrestricted fact join is over co-buyers' orders.
        val mine = broadcast(t.lineitem
          .join(t.orders.filter(col("o_custkey") === TargetCustomer)
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .select(col("l_partkey").as("partkey")).distinct())
        val coBuyers = broadcast(t.orders
          .join(t.lineitem.join(mine, col("l_partkey") === mine("partkey"), "left_semi")
            .select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .filter(col("o_custkey") =!= TargetCustomer)
          .select(col("o_custkey").as("custkey")).distinct())
        purchasesBy(t, coBuyers)
          .join(mine, Seq("partkey"), "left_anti")
          .groupBy(col("partkey"))
          .agg(count(lit(1)).as("co_buyer_cnt"))
          .orderBy(col("co_buyer_cnt").desc, col("partkey").asc)
          .limit(10)
      },
      Some(s"""
        WITH purchases AS (
          SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        mine AS (SELECT DISTINCT partkey FROM purchases WHERE custkey = $TargetCustomer),
        cobuyers AS (
          SELECT DISTINCT custkey FROM purchases
          WHERE partkey IN (SELECT partkey FROM mine) AND custkey <> $TargetCustomer)
        SELECT partkey, COUNT(DISTINCT custkey) AS co_buyer_cnt
        FROM purchases
        WHERE custkey IN (SELECT custkey FROM cobuyers)
          AND partkey NOT IN (SELECT partkey FROM mine)
        GROUP BY partkey
        ORDER BY co_buyer_cnt DESC, partkey
        LIMIT 10""")),

    // A18/A20/T4 (degree centrality + edge-type distribution via union).
    // Ref: webapp/neo4j_routes.py:48-53,812-839.
    QueryDef(
      "q_graph_nation_degree",
      t => {
        val edges = t.customer
          .select(col("c_nationkey").as("nk"), lit("customer").as("edge_type"))
          .unionByName(t.supplier
            .select(col("s_nationkey").as("nk"), lit("supplier").as("edge_type")))
        edges.groupBy(col("nk"))
          .agg(
            count(when(col("edge_type") === "customer", lit(1))).as("customer_edges"),
            count(when(col("edge_type") === "supplier", lit(1))).as("supplier_edges"),
            count(lit(1)).as("total_edges"))
          .join(t.nation, col("nk") === col("n_nationkey"))
          .select(col("n_name"), col("customer_edges"), col("supplier_edges"), col("total_edges"))
          .orderBy(col("total_edges").desc, col("n_name").asc)
          .limit(5)
      },
      Some("""
        WITH edges AS (
          SELECT c_nationkey AS nk, 'customer' AS edge_type FROM customer
          UNION ALL
          SELECT s_nationkey AS nk, 'supplier' AS edge_type FROM supplier)
        SELECT n_name,
          COUNT(CASE WHEN edge_type = 'customer' THEN 1 END) AS customer_edges,
          COUNT(CASE WHEN edge_type = 'supplier' THEN 1 END) AS supplier_edges,
          COUNT(*) AS total_edges
        FROM edges JOIN nation ON nk = n_nationkey
        GROUP BY n_name
        ORDER BY total_edges DESC, n_name
        LIMIT 5""")),

    // J16 (connection paths): enumerate the linking entities between two
    // given nodes — customers who bought both parts, with per-linker
    // evidence counts. Two pushed-down scans semi-join shrunken orders;
    // no unrestricted fact join. Ref: webapp/neo4j_routes.py:733-765.
    QueryDef(
      "q_graph_connectors",
      t => {
        val other = 2L
        purchasesBy(t, buyersOf(t, TargetPart))
          .filter(col("partkey").isin(TargetPart, other))
          .groupBy(col("custkey"))
          .agg(countDistinct(col("partkey")).as("linked_parts"))
          .filter(col("linked_parts") === 2)
          .join(t.customer, col("custkey") === col("c_custkey"))
          .select(col("custkey"), col("c_name"))
          .orderBy(col("custkey"))
      },
      Some(s"""
        WITH purchases AS (
          SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT custkey, c_name
        FROM (
          SELECT custkey FROM purchases
          WHERE partkey IN ($TargetPart, 2)
          GROUP BY custkey
          HAVING COUNT(DISTINCT partkey) = 2)
        JOIN customer ON custkey = c_custkey
        ORDER BY custkey""")),

    // A1 (global counts per table — the /api/debug cross-store check,
    // webapp/utility_routes.py:32-129) as one unioned plan.
    QueryDef(
      "q_table_counts",
      t => Seq(
          "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
          "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
          "lineitem" -> t.lineitem)
        .map { case (n, df) => df.groupBy().agg(count(lit(1)).as("row_cnt"))
          .select(lit(n).as("table_name"), col("row_cnt")) }
        .reduce(_ unionByName _)
        .orderBy(col("table_name")),
      Some("""
        SELECT * FROM (
          SELECT 'region' AS table_name, COUNT(*) AS row_cnt FROM region
          UNION ALL SELECT 'nation', COUNT(*) FROM nation
          UNION ALL SELECT 'customer', COUNT(*) FROM customer
          UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
          UNION ALL SELECT 'part', COUNT(*) FROM part
          UNION ALL SELECT 'orders', COUNT(*) FROM orders
          UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem)
        ORDER BY table_name""")),

    // J17 (variable-length shortestPath ≤6 hops, matching the reference bound) — bounded BFS over the
    // co-purchase graph from the target part. The only operator with no
    // single relational form (SURVEY.md §7.4.1); iterative join loop in
    // Spark, recursive CTE in the oracle. Ref: webapp/neo4j_routes.py:768-777.
    QueryDef(
      "q_graph_shortest_paths",
      t => GraphOps.shortestPathsOverGroups(
          t.spark, t.lineitem.select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", TargetPart, maxHops = 6)
        .select(col("node"), col("dist"))
        .orderBy(col("node")),
      Some(s"""
        WITH RECURSIVE edges AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a
          JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey <> b.l_partkey),
        bfs(node, dist) AS (
          SELECT CAST($TargetPart AS BIGINT), 0
          UNION
          SELECT e.dst, b.dist + 1
          FROM bfs b JOIN edges e ON e.src = b.node
          WHERE b.dist < 6)
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        FROM bfs GROUP BY node ORDER BY node""")),

    // J17b — the actual path NODE SEQUENCE source→target, matching the
    // reference's `UNWIND nodes(path)` output shape
    // (webapp/neo4j_routes.py:768-777). Deterministic tiebreak: each
    // node's predecessor is its min-id neighbor one level closer, so
    // Spark's group-minima reconstruction and the oracle's MIN(src)
    // walk produce the identical unique path.
    QueryDef(
      "q_graph_shortest_path_nodes",
      t => GraphOps.shortestPathNodesOverGroups(
          t.spark, t.lineitem.select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", TargetPart, PathDstPart, maxHops = 6)
        .select(col("step"), col("node"))
        .orderBy(col("step")),
      Some(s"""
        WITH RECURSIVE edges AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a
          JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey <> b.l_partkey),
        bfs(node, dist) AS (
          SELECT CAST($TargetPart AS BIGINT), 0
          UNION
          SELECT e.dst, b.dist + 1
          FROM bfs b JOIN edges e ON e.src = b.node
          WHERE b.dist < 6),
        d AS (SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node),
        parent AS (
          SELECT d1.node AS node, MIN(e.src) AS parent
          FROM d d1
          JOIN edges e ON e.dst = d1.node
          JOIN d d0 ON d0.node = e.src AND d0.dist = d1.dist - 1
          GROUP BY d1.node),
        walk(step, node) AS (
          SELECT dist, node FROM d WHERE node = $PathDstPart
          UNION ALL
          SELECT w.step - 1, p.parent
          FROM walk w JOIN parent p ON p.node = w.node
          WHERE w.step > 0)
        SELECT CAST(step AS BIGINT) AS step, node
        FROM walk ORDER BY step"""))
  )
}
