package graft.sources

import graft.SparkSpec
import graft.etl.Layout
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Static-plan audit of the bucketed co-located join layout
  * (etl/Layout.writeBucketed) — complements LayoutSpec's functional
  * check with the deterministic-plan assertions that need the isolated
  * plan-audit JVM (build.sbt groups *PlanAuditSpec) and AQE off:
  * bucket-scan usage, zero-exchange shape, and the safe shuffled
  * fallback when bucket counts diverge.
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
    Layout.writeBucketed(t.orders, "orders_b", "o_orderkey", 4)
    Layout.writeBucketed(t.lineitem, "lineitem_b", "l_orderkey", 4)
  }

  private def joined(right: String) = {
    val l = spark.table("lineitem_b")
    val r = spark.table(right)
    l.join(r, l("l_orderkey") === r("o_orderkey"))
  }

  test("same-bucketed join plans with zero Exchange on either side") {
    setup()
    val plan = joined("orders_b").queryExecution
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
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    val bucketed = agg(joined("orders_b"))
    val plain = agg(t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey")))
    assert(bucketed === plain)
  }

  test("mismatched bucket counts fall back to a shuffled join (no silent wrong plan)") {
    setup()
    val t = Tables(spark, SparkSpec.Sf0001)
    Layout.writeBucketed(t.orders, "orders_b8", "o_orderkey", 8)
    val plan = joined("orders_b8").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // Spark shuffles (at least) one side to align bucket counts — an
    // Exchange must appear: correctness over co-location.
    assert(plan.contains("Exchange"),
      s"mismatched buckets must introduce an exchange:\n$plan")
  }
}
