package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("date-partitioned fact: year filter prunes partitions at the scan") {
    val t = Tables(spark, graft.SparkSpec.Sf0001)
    val path = Files.createTempDirectory("graft_part").toString + "/orders"
    Layout.writePartitionedByYear(t.orders, "o_orderdate", path)
    val q = spark.read.parquet(path).filter(col("part_year") === 1997)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("part_year"),
      s"expected partition filters in:\n$scan")
    // Pruned result matches the unpartitioned filter.
    val expected = t.orders.filter(year(col("o_orderdate")) === 1997).count()
    assert(q.count() == expected)
  }

  test("bucketed tables join without an exchange") {
    val t = Tables(spark, graft.SparkSpec.Sf0001)
    Layout.writeBucketed(t.customer.select("c_custkey", "c_name"), "b_customer", "c_custkey", 8)
    Layout.writeBucketed(t.orders.select("o_custkey", "o_totalprice"), "b_orders", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a non-broadcast join so co-location is what's being tested.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == t.orders.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
