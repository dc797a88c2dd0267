package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The append-vs-deep-OPTIMIZE race (r16 verdict queue #3): the old
  * tier's four rewrites were UNCONDITIONAL overwrites under a
  * single-writer convention, and the final docs re-cluster re-applied
  * the PLANNED row set — an append's docs segment landing inside the
  * tier's window was silently clobbered. [[DedupIndex.optimizeIndex]]
  * now claims every table's PLANNED successor, so a racing writer
  * surfaces as ConcurrentCommitException on the optimize side, which
  * re-plans from fresh snapshots — the raced-in rows JOIN the
  * re-derive. Both windows exercised deterministically:
  * plan→first-commit (groups trips) and after-components→docs (the
  * exact clobber commit trips). Fixed point both times: the combined
  * corpus's fresh [[DedupIndex.build]].
  */
class DedupOptimizeRaceSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 3
  private val NoAutoCompact = Int.MaxValue

  private def df(rows: Seq[(Long, Seq[String])]): DataFrame =
    rows.toDF("doc_id", "shs")

  private def tmp(): String =
    Files.createTempDirectory("graft_dedup_optrace").toString

  private val base: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("a1", "a2", "a3"),
    2L -> Seq("a1", "a2", "a4"),
    3L -> Seq("x1", "x2", "x3"))
  private val delta: Seq[(Long, Seq[String])] = Seq(
    4L -> Seq("a1", "a2", "a5"), // pairs with 1 and 2
    5L -> Seq("x1", "x2", "x9")) // pairs with 3

  private def tableDump(dir: String, t: String, cols: Seq[String]) =
    TxTable.read(spark, s"$dir/$t").select(cols.map(col): _*)
      .orderBy(cols.map(col): _*).collect().toSeq.map(_.toSeq)

  private def assertConvergedToFreshBuild(dir: String): Unit = {
    val ref = tmp()
    DedupIndex.build(spark, df(base ++ delta), ref, Cap)
    assert(tableDump(dir, "docs", Seq("doc_id")) ==
      tableDump(ref, "docs", Seq("doc_id")),
      "docs diverged from the fresh combined build — a raced segment was lost")
    assert(tableDump(dir, "pairs", Seq("a", "b")) ==
      tableDump(ref, "pairs", Seq("a", "b")),
      "pairs diverged from the fresh combined build")
    assert(tableDump(dir, "components", Seq("doc_id", "component")) ==
      tableDump(ref, "components", Seq("doc_id", "component")),
      "components diverged from the fresh combined build")
  }

  test("an append racing the deep OPTIMIZE's plan window is never lost: the tier re-plans over it") {
    val dir = tmp()
    DedupIndex.build(spark, df(base), dir, Cap)
    DedupIndex.optimizeRaceHookForTest = () => {
      DedupIndex.optimizeRaceHookForTest = () => ()
      DedupIndex.append(spark, df(delta), dir, Cap,
        autoCompactSegments = NoAutoCompact)
      ()
    }
    val ph =
      try DedupIndex.optimizeIndex(spark, dir, Cap)
      finally DedupIndex.optimizeRaceHookForTest = () => ()
    assert(ph.map(_._1).contains("replan_lost_race"),
      s"the optimize should have lost its first claim and re-planned: $ph")
    assertConvergedToFreshBuild(dir)
  }

  test("a docs segment raced in before the final re-cluster is not clobbered") {
    // The exact pre-fix loss: groups/pairs/components already rewritten,
    // an append lands its full four-table delta, then the tier's docs
    // re-cluster overwrote the table with the PLANNED (pre-delta) row
    // set — the delta's docs rows vanished while its other segments
    // survived, a torn index. The conditional claim trips instead and
    // the replanned pass re-derives everything including the delta.
    val dir = tmp()
    DedupIndex.build(spark, df(base), dir, Cap)
    DedupIndex.optimizeLateRaceHookForTest = () => {
      DedupIndex.optimizeLateRaceHookForTest = () => ()
      DedupIndex.append(spark, df(delta), dir, Cap,
        autoCompactSegments = NoAutoCompact)
      ()
    }
    val ph =
      try DedupIndex.optimizeIndex(spark, dir, Cap)
      finally DedupIndex.optimizeLateRaceHookForTest = () => ()
    assert(ph.map(_._1).contains("replan_lost_race"),
      s"the docs re-cluster should have tripped on the raced segment: $ph")
    assertConvergedToFreshBuild(dir)
  }

  test("an uncontended deep OPTIMIZE commits in one pass with no replan phase") {
    val dir = tmp()
    DedupIndex.build(spark, df(base), dir, Cap)
    DedupIndex.append(spark, df(delta), dir, Cap,
      autoCompactSegments = NoAutoCompact)
    val ph = DedupIndex.optimizeIndex(spark, dir, Cap)
    assert(!ph.map(_._1).contains("replan_lost_race"),
      s"an uncontended optimize re-planned: $ph")
    assertConvergedToFreshBuild(dir)
  }
}
