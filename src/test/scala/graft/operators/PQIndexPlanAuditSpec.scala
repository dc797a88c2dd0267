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

  test("q_embed_ivfpq_tx_search: manifest-backed serving reads only planned codes files") {
    // The TxTable layout's twin of the PartitionFilters assertion:
    // probing prunes by per-file manifest bounds, so the registered
    // query's plan must read a strict subset of the codes table's
    // files (and stay cross-join-free).
    spark.sharedState.cacheManager.clearCache()
    val df = graft.SparkEntry.queries("q_embed_ivfpq_tx_search")(
      spark, SparkSpec.Sf0001)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"),
      s"manifest-backed serving search regressed to a cross join:\n$plan")
    val codeFiles = df.inputFiles.filter(_.contains("/codes/data/")).toSet
    assert(codeFiles.nonEmpty, "no codes files in the serving scan")
    val cd = codeFiles.head.stripPrefix("file:")
      .replaceAll("/data/[^/]+/[^/]+$", "")
    val all = graft.sources.TxTable
      .dataFiles(cd, graft.sources.TxTable.snapshot(cd)).size
    // 5 queries × 2 probes can legitimately cover every cell — the
    // registered query's scan may read all files. Per-QUERY pruning is
    // the claim: a single query's 2 probed cells must plan a strict
    // file subset on the same stored index.
    assert(codeFiles.size <= all)
    val t = Tables(spark, SparkSpec.Sf0001)
    val vecs = t.embeddings
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS e")
    val one = PQIndexTx.searchIVF(spark, cd.stripSuffix("/codes"),
      vecs.filter(col("vec_id") === 0), rerankVecs = vecs,
      dsub = 8, nprobe = 2, shortlist = 40, topK = 5)
    val oneFiles = one.inputFiles.filter(_.contains("/codes/data/")).toSet
    assert(oneFiles.nonEmpty && oneFiles.size < all,
      s"single-query probe did not prune: ${oneFiles.size} of $all files")
  }
}
