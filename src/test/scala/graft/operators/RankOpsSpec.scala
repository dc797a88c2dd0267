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

  test("exactPercentiles ignores NULLs exactly like the percentile aggregate") {
    // 1 in 3 values NULL: n must be the non-null count and no boundary
    // rank may land on a NULL row (the aggregate it replaces skips them).
    val df = (0 until 200)
      .map(i => (i, if (i % 3 == 0) None else Some(((i * 37) % 91).toDouble)))
      .toDF("id", "x")
    val (cnt, got) = RankOps.exactPercentiles(df, col("x"), Seq(0.25, 0.5, 0.95))
    val want = df.agg(expr("percentile(x, array(0.25, 0.5, 0.95))")).collect()(0)
      .getSeq[Double](0)
    assert(cnt == df.filter(col("x").isNotNull).count())
    assert(got(0.25) == want(0) && got(0.5) == want(1) && got(0.95) == want(2))
    // Grouped variant: per-group n is the non-null count too.
    val gGot = RankOps.exactPercentilesBy(df, col("id") % 4, col("x"), Seq(0.5))
    val gWant = df.groupBy((col("id") % 4).as("g"))
      .agg(expr("percentile(x, 0.5)").as("p"), count(col("x")).as("n"))
      .collect().map(r => r.get(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(gGot.keySet == gWant.keySet)
    gWant.foreach { case (g, (p, n)) =>
      val (gn, gp) = gGot(g)
      assert(gn == n && gp(0.5) == p, s"g=$g")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("high-cardinality grouping takes the semi-join fetch path, same values") {
    // 400 groups × 2 qs × 2 boundary ranks ≈ 1600 needed ranks —
    // well past IsinFetchMax, so fetchRankValues must switch to the
    // broadcast semi-join and still return bit-identical percentiles.
    val df = (0 until 4000)
      .map(i => (i % 400, ((i * 37) % 997).toDouble)).toDF("g", "x")
    assert(400 * 2 * 2 > RankOps.IsinFetchMax)
    val got = RankOps.exactPercentilesBy(df, col("g"), col("x"), Seq(0.5, 0.9))
    val want = df.groupBy(col("g"))
      .agg(expr("percentile(x, array(0.5, 0.9))").as("p"))
      .collect().map(r => r.get(0) -> r.getSeq[Double](1)).toMap
    assert(got.size == 400)
    // Spark's Percentile interpolates as (1−f)·lo + f·hi; RankOps (and
    // DuckDB's quantile_cont, the committed oracle target) as
    // lo + f·(hi−lo). The forms differ only in the final ulp, so this
    // cross-engine check is ulp-tolerant — exact parity with DuckDB is
    // what the q_percentiles hash gate asserts.
    def ulpEq(a: Double, b: Double) = (a - b).abs <= 2 * math.ulp(a.abs.max(b.abs))
    want.foreach { case (g, p) =>
      val (_, gp) = got(g)
      assert(ulpEq(gp(0.5), p(0)) && ulpEq(gp(0.9), p(1)), s"g=$g")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("1e5 groups: driver collects stay parts-sized + result-sized, values exact") {
    // The grouped rank operator must scale in GROUP CARDINALITY: its
    // per-partition collect is ≤ `parts` rows and its span collect is
    // one row per group (= the returned map's own size) — never the old
    // per-(partition × group) product, and never an O(G²) driver fold.
    // 10^5 groups × 3 rows runs in seconds iff that holds; the value
    // check is exact (medians of {g, g+1, g+2} = g+1, no interpolation
    // ambiguity).
    val g = 100000
    val df = spark.range(3L * g)
      .select((col("id") % g).as("g"),
        expr(s"CAST(id % $g + id DIV $g AS DOUBLE)").as("x"))
    val got = RankOps.groupedValuesAtRanks(df, col("g"), col("x"), n => Seq(n / 2))
    assert(got.size == g)
    Seq(0L, 1L, 77777L, (g - 1).toLong).foreach { k =>
      val (n, at) = got(k)
      assert(n == 3L && at(1L) == k + 1.0, s"g=$k got ($n, $at)")
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
