package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RankOps must agree EXACTLY with the single-task window formulations
  * it replaces — the window versions are the fixture oracle here, and
  * the DuckDB gate replays the same ntile semantics for q_customer_rfm.
  */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  // Unsorted input with a non-trivial order: value has ties, id breaks
  // them (the uniqueness RankOps requires).
  private def fixture(n: Int) =
    (0 until n).map(i => ((i * 37) % 11, (i * 53) % n)).toDF("v", "id")
      .distinct() // (v, id) pairs unique by construction of id cycle

  test("withGlobalRowNumber == row_number over the same unique order") {
    for (n <- Seq(1, 2, 17, 103)) {
      val df = fixture(n)
      val order = Seq(col("v").desc, col("id"))
      val got = RankOps.withGlobalRowNumber(df, order, "rn")
        .select(col("v"), col("id"), col("rn"))
      val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      assert(rows(got.orderBy("rn")) == rows(want.orderBy("rn")), s"n=$n")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("withGlobalNtile == ntile over the same unique order (incl. n < tiles)") {
    for ((n, tiles) <- Seq((1, 5), (3, 5), (17, 5), (103, 5), (100, 7))) {
      val df = fixture(n)
      val got = RankOps.withGlobalNtile(df,
        Seq(col("v").desc, col("id")), "t", tiles)
        .select(col("v"), col("id"), col("t"))
      val want = df.withColumn("t",
        ntile(tiles).over(Window.orderBy(col("v").desc, col("id"))))
      assert(rows(got.orderBy("v", "id")) == rows(want.orderBy("v", "id")),
        s"n=$n tiles=$tiles")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("exactPercentiles matches Spark's buffering percentile aggregate bit-for-bit") {
    for (n <- Seq(1, 2, 17, 103, 1000)) {
      // Ties included: values repeat every 11 — values-at-rank stay
      // deterministic regardless of tie order.
      val df = fixture(n).select(col("v").cast("double").as("x"))
      val (cnt, got) = RankOps.exactPercentiles(df, col("x"), Seq(0.5, 0.9, 0.99))
      val want = df.agg(expr("percentile(x, array(0.5, 0.9, 0.99))")).collect()(0)
        .getSeq[Double](0)
      assert(cnt == df.count())
      assert(got(0.5) == want(0), s"n=$n p50")
      assert(got(0.9) == want(1), s"n=$n p90")
      assert(got(0.99) == want(2), s"n=$n p99")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("exactPercentilesBy matches the grouped percentile aggregate bit-for-bit") {
    val df = fixture(500)
      .select((col("id") % 7).as("g"), col("v").cast("double").as("x"))
    val got = RankOps.exactPercentilesBy(df, col("g"), col("x"), Seq(0.5, 0.9))
    val want = df.groupBy(col("g"))
      .agg(expr("percentile(x, array(0.5, 0.9))").as("p"), count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (g, (p, n)) =>
      val (gn, gp) = got(g)
      assert(gn == n, s"g=$g count")
      assert(gp(0.5) == p(0) && gp(0.9) == p(1), s"g=$g values")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("row numbers are a permutation of 1..n regardless of partition skew") {
    val df = fixture(103)
    // More partitions than rows → many empty range partitions.
    val got = RankOps.withGlobalRowNumber(df,
      Seq(col("v"), col("id")), "rn", partitions = 64)
    val rns = got.select("rn").collect().map(_.getLong(0)).sorted
    assert(rns.toSeq == (1L to 103L))
    spark.sharedState.cacheManager.clearCache()
  }
}
