package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the properties that make the flagship
  * queries scale are asserted, not just eyeballed once — a refactor that
  * silently loses a pushdown or broadcast fails here, not at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = SparkSpec.Sf0001

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q1_agg: filter pushed to parquet, pruned read schema, map-side partial agg") {
    val plan = formatted("q1_agg")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("l_comment"), "read schema not pruned")
    assert(plan.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q_revenue_by_nation_year: dims broadcast, fact scans stay shuffle-free pre-agg") {
    val plan = formatted("q_revenue_by_nation_year")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dim join degenerated to SMJ at tiny SF")
  }

  test("q_graph_also_bought: semi-join shrinking present") {
    val plan = formatted("q_graph_also_bought")
    assert(plan.contains("LeftSemi"), s"expected semi-joins:\n$plan")
  }

  test("q_search_documents: limit becomes TakeOrderedAndProject, filter reaches scan") {
    val plan = formatted("q_search_documents")
    assert(plan.contains("TakeOrderedAndProject"), s"limit not fused with sort:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      "range predicate not pushed")
  }

  test("embedding prefilter keeps the native kernel in the pair stage") {
    val plan = formatted("q_embed_neardup")
    assert(plan.contains("graft_dot"), s"native prefilter kernel missing:\n$plan")
  }
}
