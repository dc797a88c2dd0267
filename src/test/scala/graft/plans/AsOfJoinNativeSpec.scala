package graft.plans

import graft.SparkSpec
import graft.operators.{AsOfJoin, AsOfJoinNativeApi}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class AsOfJoinNativeSpec extends SparkSpec {

  test("native exec matches the composed union+window operator on real tables") {
    val t = Tables(spark, graft.SparkSpec.Sf0001)
    val composed = AsOfJoin.lastValueAsOf(
        t.events, col("user_id"), col("ts"),
        t.orders, col("o_custkey"), col("o_orderdate"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd"), "last_order_date")
      .select(col("event_id"), col("last_order_date"))
    val native = AsOfJoinNativeApi.lastValueAsOf(
        t.events, col("user_id"), col("ts"),
        t.orders, col("o_custkey"), col("o_orderdate"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd"), "last_order_date")
      .select(col("event_id"), col("last_order_date"))
    assert(rows(native.orderBy("event_id")) == rows(composed.orderBy("event_id")))
  }

  test("native exec matches composed operator on random data incl. ties and missing keys") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val gen = Gen.listOfN(30, for {
      k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 50L); v <- Gen.chooseNum(0L, 9L)
    } yield (k, t, v))
    (0 until 5).foreach { i =>
      val lRows = gen.pureApply(Gen.Parameters.default, Seed(1L + i))
      val rRows = gen.pureApply(Gen.Parameters.default, Seed(100L + i))
      val left = lRows.zipWithIndex.map { case ((k, t, _), id) => (id.toLong, k, ts(t)) }
        .toDF("id", "k", "t")
      val right = rRows.map { case (k, t, v) => (k, ts(t), s"v$v") }.toDF("k", "t", "v")
      val composed = AsOfJoin.lastValueAsOf(left, col("k"), col("t"),
          right, col("k"), col("t"), col("v"), "vv")
        .select("id", "vv")
      val native = AsOfJoinNativeApi.lastValueAsOf(left, col("k"), col("t"),
          right, col("k"), col("t"), col("v"), "vv")
        .select("id", "vv")
      assert(rows(native.orderBy("id")) == rows(composed.orderBy("id")), s"iteration $i")
    }
  }

  test("physical plan contains the custom exec node") {
    val t = Tables(spark, graft.SparkSpec.Sf0001)
    val native = AsOfJoinNativeApi.lastValueAsOf(
      t.events, col("user_id"), col("ts"),
      t.orders, col("o_custkey"), col("o_orderdate"), col("o_orderkey"), "ok")
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }
}
