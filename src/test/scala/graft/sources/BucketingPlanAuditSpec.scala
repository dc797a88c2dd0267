package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the load-once/join-forever layout. Runs in
  * the isolated plan-audit JVM (build.sbt groups *PlanAuditSpec) with
  * AQE off for deterministic static plans.
  */
class BucketingPlanAuditSpec extends SparkSpec {

  override lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = SparkSpec.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // Force the shuffle-join path: broadcast would hide the exchange
    // this audit is about (real fact↔fact joins are not broadcastable).
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  private def setup(): Unit = {
    val t = Tables(spark, SparkSpec.Sf0001)
    Bucketing.writeBucketed(t.orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(t.lineitem, "lineitem_b", "l_orderkey", 4)
  }

  test("same-bucketed join plans with zero Exchange on either side") {
    setup()
    val joined = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b",
      "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"scan did not use the bucket layout:\n$plan")
  }

  test("bucketed join result equals the plain join") {
    setup()
    val t = Tables(spark, SparkSpec.Sf0001)
    val bucketed = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b",
      "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(bucketed === plain)
  }

  test("mismatched bucket counts fall back to a shuffled join (no silent wrong plan)") {
    setup()
    val t = Tables(spark, SparkSpec.Sf0001)
    Bucketing.writeBucketed(t.orders, "orders_b8", "o_orderkey", 8)
    val joined = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b8",
      "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // Spark shuffles ONE side to align bucket counts (or both; either
    // way an Exchange must appear — correctness over co-location).
    assert(plan.contains("Exchange"),
      s"mismatched buckets must introduce an exchange:\n$plan")
  }
}
