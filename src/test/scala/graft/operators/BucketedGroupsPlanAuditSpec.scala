package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The opt-in bucketed groups layout (DedupIndex.BucketedGroups): the
  * per-shingle segment fold — the read every LSM lookup and compaction
  * pays — must plan with ZERO Exchange over any number of appended
  * segments, and must return exactly what the default TxTable-segment
  * fold returns. Plan-audit group: AQE off, deterministic shapes.
  */
class BucketedGroupsPlanAuditSpec extends SparkSpec {

  override lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = SparkSpec.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private val cap = 3

  /** A segment frame in the groups schema: (sh, ids, df). */
  private def segment(rows: Seq[(String, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("sh", "ids")
      .select(col("sh"), array_sort(col("ids")).as("ids"),
        size(col("ids")).cast("long").as("df"))
  }

  test("segment fold over the bucketed table is exchange-free and exact") {
    val s1 = segment(Seq("aa" -> Seq(1L, 2L), "bb" -> Seq(1L), "cc" -> Seq(2L, 3L)))
    val s2 = segment(Seq("aa" -> Seq(4L), "bb" -> Seq(5L, 6L, 7L), "dd" -> Seq(9L)))
    val s3 = segment(Seq("aa" -> Seq(8L), "cc" -> Seq(5L)))
    DedupIndex.BucketedGroups.init(spark, "groups_bucketed", s1, buckets = 4)
    DedupIndex.BucketedGroups.appendSegment(spark, "groups_bucketed", s2, buckets = 4)
    DedupIndex.BucketedGroups.appendSegment(spark, "groups_bucketed", s3, buckets = 4)

    val folded = DedupIndex.BucketedGroups.fold(spark, "groups_bucketed", cap)
    val plan = folded.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"the bucketed segment fold must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scan did not use the bucket layout:\n$plan")

    // Result parity with the default path's fold over the same rows.
    val unioned = s1.unionByName(s2).unionByName(s3)
    val expected = DedupIndex.mergeSegments(unioned, cap)
      .orderBy("sh").collect().toSeq
    val got = folded.orderBy("sh").collect().toSeq
    assert(got === expected, "bucketed fold diverged from the segment fold")
    // Sanity of the fixture itself: 'aa' crossed the cap (df 4 > 3 → NULL
    // ids), 'cc' stayed rare with both segments' ids concatenated.
    val bySh = got.map(r => r.getString(0) ->
      (Option(r.getSeq[Long](1)), r.getLong(2))).toMap
    assert(bySh("aa") == (None, 4L))
    assert(bySh("cc") == (Some(Seq(2L, 3L, 5L)), 3L))
  }

  test("a mismatched bucket count is refused, not silently de-clustered") {
    val s = segment(Seq("zz" -> Seq(1L)))
    DedupIndex.BucketedGroups.init(spark, "groups_bucketed_m", s, buckets = 4)
    intercept[Exception] {
      DedupIndex.BucketedGroups.appendSegment(spark, "groups_bucketed_m", s,
        buckets = 8)
    }
  }
}
