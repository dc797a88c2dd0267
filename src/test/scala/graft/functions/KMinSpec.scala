package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_kmin: the bounded k-minimum-values aggregate behind the KMV
  * distinct sketch (SketchQueries).
  */
class KMinSpec extends SparkSpec {
  import spark.implicits._

  test("graft_kmin equals sort-distinct-take-k") {
    val df = Seq.tabulate(5000)(i => (i % 7, (i * 2654435761L) % 997))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(expr("graft_kmin(v, 16)").as("km"))
    val want = df.groupBy($"g")
      .agg(expr("slice(array_sort(collect_set(v)), 1, 16)").as("km"))
    assert(got.orderBy($"g").collect().toSeq ===
      want.orderBy($"g").collect().toSeq)
  }

  test("graft_kmin is invariant under repartitioning (merge correctness)") {
    val df = Seq.tabulate(20000)(i => (i % 3, (i * 2654435761L) % 100003))
      .toDF("g", "v")
    val a = df.repartition(1).groupBy($"g").agg(expr("graft_kmin(v, 32)").as("km"))
      .orderBy($"g").collect().toSeq
    val b = df.repartition(17, $"v").groupBy($"g").agg(expr("graft_kmin(v, 32)").as("km"))
      .orderBy($"g").collect().toSeq
    assert(a === b)
  }

  test("group smaller than k returns the full sorted distinct set") {
    val df = Seq((1, 5L), (1, 3L), (1, 5L), (1, 9L)).toDF("g", "v")
    val km = df.groupBy($"g").agg(expr("graft_kmin(v, 64)").as("km"))
      .select($"km").as[Seq[Long]].head()
    assert(km === Seq(3L, 5L, 9L))
  }

  test("KMV estimate lands within 3/sqrt(k) of the true distinct count") {
    // 60-bit uniform hash of 1..n, same construction as the query.
    val n = 5000
    val k = 64
    val df = (1 to n).toDF("user_id")
      .selectExpr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
    val kmin = df.agg(expr(s"graft_kmin(h, $k)").as("km"))
      .select($"km").as[Seq[Long]].head()
    assert(kmin.size == k)
    val est = (k - 1).toDouble * math.pow(2.0, 60) / kmin.last.toDouble
    val relErr = math.abs(est - n) / n
    assert(relErr < 3.0 / math.sqrt(k.toDouble),
      s"KMV estimate $est vs true $n: rel err $relErr")
  }

  test("builtin sketches (q_sketch_builtin) stay within error bounds of exact") {
    // The bounds now live IN the query as boolean columns (that is what
    // the DuckDB gate hash-checks against TRUE literals); the spec
    // asserts every bound holds on the fixture and the exact side is
    // the true distinct count.
    val t = graft.sources.Tables(spark, SparkSpec.Sf0001)
    val got = graft.queries.SketchQueries.defs
      .find(_.name == "q_sketch_builtin").get.build(t)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val exact = t.events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === exact.keySet)
    exact.foreach { case (k, d) =>
      val (ed, hllOk, p50Ok, p95Ok) = got(k)
      assert(ed == d, s"$k exact_distinct mismatch: $ed vs $d")
      assert(hllOk, s"$k HLL outside 3-sigma of exact")
      assert(p50Ok, s"$k p50 sketch outside exact rank bracket")
      assert(p95Ok, s"$k p95 sketch outside exact rank bracket")
    }
  }
}
