package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-pruned MERGE: only summary files whose footer key range
  * intersects the delta rewrite; the rest carry over byte-identical.
  */
class MergePrunedSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): (EventStore, String) = {
    val root = Files.createTempDirectory("graft_mps").toString
    (new EventStore(root), root)
  }

  private def seed(store: EventStore, n: Int): Unit = {
    val rows = (1 to n).map(i =>
      (i.toLong, i.toLong * 2, BigDecimal(i * 10).setScale(2),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    store.mergeSummary(rows
      .toDF("user_id", "event_cnt", "total_value", "last_ts")
      .withColumn("total_value", col("total_value").cast("decimal(18,2)")))
    store.clusterSummary(spark, files = 8)
  }

  private def delta(ids: Seq[Long]) = ids.map(i =>
      (i, 1L, BigDecimal(1).setScale(2), java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    .toDF("user_id", "event_cnt", "total_value", "last_ts")
    .withColumn("total_value", col("total_value").cast("decimal(18,2)"))

  private def snapshot(store: EventStore) =
    store.table(spark, "summary_user")
      .orderBy("user_id").collect().toSeq.map(_.toSeq)

  test("pruned merge equals the full-rewrite merge") {
    val (a, _) = freshStore(); val (b, _) = freshStore()
    seed(a, 400); seed(b, 400)
    val d = delta(Seq(3L, 7L, 901L)) // two updates in the low range + an insert
    a.mergeSummary(d)
    val (rewritten, total) = b.mergeSummaryPruned(d)
    assert(snapshot(a) === snapshot(b))
    assert(total == 8L, s"expected the 8 clustered files, saw $total")
    assert(rewritten < total, s"pruning rewrote every file ($rewritten/$total)")
  }

  test("files outside the delta key range carry over by reference") {
    val (store, root) = freshStore()
    seed(store, 400)
    // List only the CURRENT version's live files (manifest-resolved,
    // exclusion-aware): superseded versions stay on disk until vacuum,
    // so a raw directory walk would prove nothing.
    def livePaths() = {
      val tbl = s"$root/summary_user"
      graft.sources.TxTable.dataFiles(tbl, graft.sources.TxTable.snapshot(tbl))
        .map(_._1).toSet
    }
    val before = livePaths()
    val (rewritten, total) = store.mergeSummaryPruned(delta(Seq(1L, 2L)))
    val after = livePaths()
    // Every untouched file survives AT ITS ORIGINAL PATH — the carry is
    // a manifest entry, not a copy; only hit files leave the live set.
    val surviving = before.intersect(after)
    assert(surviving.size >= (total - rewritten - 1),
      s"carried files moved or vanished: before=${before.size} after=${after.size}")
    assert(rewritten >= 1L && rewritten < total)
  }

  test("insert-only delta (no file range hit) still lands correctly") {
    val (a, _) = freshStore(); val (b, _) = freshStore()
    seed(a, 100); seed(b, 100)
    val d = delta(Seq(5000L, 6000L))
    a.mergeSummary(d)
    b.mergeSummaryPruned(d)
    assert(snapshot(a) === snapshot(b))
  }

  test("summary created from an EMPTY frame doesn't poison later pruned merges") {
    // Spark writes a schema-only parquet file (zero row groups) for an
    // empty DataFrame; footerKeyRange must treat it as a stats-less
    // conservative hit, not crash on min()-of-empty / all-null stats
    // (round-5 advice #1: this was an UnsupportedOperationException on
    // every subsequent mergeSummaryPruned).
    val (store, _) = freshStore()
    store.mergeSummary(delta(Seq.empty[Long])) // summary = one empty file
    val (a, _) = freshStore()
    a.mergeSummary(delta(Seq(1L, 2L)))
    val (rewritten, total) = store.mergeSummaryPruned(delta(Seq(1L, 2L)))
    assert(snapshot(store) === snapshot(a))
    // The schema-only file has no usable stats (a conservative range
    // hit) — but the summary's user_id BLOOM proves keys 1,2 absent
    // from its dir, so the merge lands as a pure insert: zero rewrites
    // and still byte-equal to the full merge.
    assert(rewritten == 0L && total == 1L,
      s"bloom should prove the empty file keyless: rewrote $rewritten/$total")
  }

  test("oversized delta falls back to the full merge") {
    val (a, _) = freshStore(); val (b, _) = freshStore()
    seed(a, 50); seed(b, 50)
    val d = delta((1L to 40L))
    a.mergeSummary(d)
    val (rewritten, total) = b.mergeSummaryPruned(d, maxDeltaKeys = 10)
    assert(snapshot(a) === snapshot(b))
    assert(rewritten == total, "fallback should report a full rewrite")
  }
}
