package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** The IVF claim made concrete: with codes PARTITIONED BY cell, probing
  * is partition pruning — the scan plans with PartitionFilters on the
  * probed cells and never lists the others. Runs in the isolated
  * plan-audit JVM (build.sbt groups *PlanAuditSpec), AQE off.
  */
class PQIndexPlanAuditSpec extends SparkSpec {

  override lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = SparkSpec.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  test("probed-cell scan prunes partitions at the codes table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqaud").toString
    val t = Tables(spark, SparkSpec.Sf0001)
    val vecs = t.embeddings
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS e")
      .persist()
    PQIndex.buildIVF(spark, vecs, dir, m = 8, dsub = 8, ksub = 8, iters = 2,
      nq = 5, coarseK = 8, coarseIters = 3)
    val scan = PQIndex.prunedCodesScan(spark, dir, cells = Seq(0L, 3L))
    val plan = scan.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell filter did not reach the scan as a partition filter:\n$plan")
    // The filter must be a metadata operation: no post-scan Filter node
    // re-checking cell (Spark drops it when pruning fully covers it).
    // Partition columns come back type-inferred from directory names
    // (int here) — normalize before comparing.
    val cells = scan.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(Set(0L, 3L)), s"pruned scan leaked cells: $cells")
    vecs.unpersist()
  }

  test("q_embed_ivfpq_index_search: the SERVING plan scans pruned cells, no cross join") {
    // The registered query (not just the raw scan helper): its plan must
    // carry the probed-cell PartitionFilters at the codes table and stay
    // free of cross joins — the shape a 100 TB deployment executes.
    spark.sharedState.cacheManager.clearCache()
    val df = graft.SparkEntry.queries("q_embed_ivfpq_index_search")(
      spark, SparkSpec.Sf0001)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probed cells did not reach the codes scan as partition filters:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"serving search regressed to a cross join:\n$plan")
  }
}
