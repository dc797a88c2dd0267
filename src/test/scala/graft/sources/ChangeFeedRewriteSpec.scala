package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The change feed across LAYOUT-ONLY rewrites (folds, compactions).
  * A fold physically removes masked rows and clears their tombstones;
  * a compaction moves rows between files. Neither changes the table's
  * visible contents, so an incremental consumer must keep flowing —
  * before this round a rewrite in the range hard-failed readChanges
  * (and the endpoint-diff deletedKeysBetween LOST keys tombstoned and
  * folded inside one range). Data-changing rewrites (keyed replaces,
  * overwrites) must still fail loudly: they destroy row-level change
  * attribution, exactly as Delta documents for streams without
  * ignoreChanges. */
class ChangeFeedRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def kvs(dir: String): Seq[(Long, Long)] =
    TxTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("deletedKeysBetween delivers a key tombstoned AND folded inside the range") {
    val dir = tmp("graft_feed_fold_keys")
    val init = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    TxTable.init(spark, dir, init.schema)
    TxTable.append(spark, dir, init) // v1
    val since = TxTable.snapshot(dir).version
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L)) // v2: tombstone
    TxTable.foldDeletes(spark, dir) // v3: fold clears the mask
    val head = TxTable.snapshot(dir)
    assert(head.dkeys.isEmpty, "fold should clear the tombstone block")
    // Endpoint diff would say "nothing deleted" (both endpoints have an
    // empty mask); the accumulated walk must say k=2.
    assert(TxTable.deletedKeysBetween(dir, since, head.version)
      == Map("k" -> Seq("2")),
      "a tombstone folded inside the range was lost by the feed")
    // And a key masked BEFORE since, folded, then re-deleted in range
    // counts as added again (idempotent downstream).
    val dir2 = tmp("graft_feed_refold_keys")
    TxTable.init(spark, dir2, init.schema)
    TxTable.append(spark, dir2, init) // v1
    TxTable.deleteKeysDeferred(dir2, "k", Seq(3L)) // v2 (before since2)
    val since2 = TxTable.snapshot(dir2).version
    TxTable.foldDeletes(spark, dir2) // v3: fold
    TxTable.deleteKeysDeferred(dir2, "k", Seq(3L)) // v4: re-delete
    assert(TxTable.deletedKeysBetween(dir2, since2,
      TxTable.snapshot(dir2).version) == Map("k" -> Seq("3")),
      "a re-deleted key after a fold must surface again")
  }

  test("readChanges tolerates a fold of pre-range dirs; additions deliver exactly once") {
    val dir = tmp("graft_feed_fold_reads")
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    TxTable.init(spark, dir, init.schema)
    TxTable.append(spark, dir, init) // v1 (pre-range dir)
    val since = TxTable.snapshot(dir).version
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v")) // v2: in-range add
    TxTable.deleteKeysDeferred(dir, "k", Seq(1L)) // v3: masks a PRE-range row
    TxTable.foldDeletes(spark, dir) // v4: rewrites the v1 dir
    val head = TxTable.snapshot(dir)
    assert(kvs(dir) == Seq((2L, 20L), (3L, 30L)))
    // Additions over the fold-spanning range: exactly the in-range
    // append — nothing re-delivered from the fold's rewrite dir, and
    // the pre-range survivors (k=2) don't reappear.
    val changes = TxTable.readChanges(spark, dir, since, head.version)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(changes == Seq((3L, 30L)),
      s"fold-spanning range delivered $changes, wanted only the append")
    // The deletion half still carries the folded key.
    assert(TxTable.deletedKeysBetween(dir, since, head.version)
      == Map("k" -> Seq("1")))
  }

  test("a key folded then re-inserted later in the same range flows as an insert") {
    val dir = tmp("graft_feed_reinsert")
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    TxTable.init(spark, dir, init.schema)
    TxTable.append(spark, dir, init) // v1 (pre-range)
    val since = TxTable.snapshot(dir).version
    TxTable.deleteKeysDeferred(dir, "k", Seq(1L)) // v2
    TxTable.foldDeletes(spark, dir) // v3: k=1 physically gone
    TxTable.append(spark, dir, Seq((1L, 11L)).toDF("k", "v")) // v4: re-insert
    val head = TxTable.snapshot(dir)
    assert(kvs(dir) == Seq((1L, 11L), (2L, 20L)))
    val changes = TxTable.readChanges(spark, dir, since, head.version)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // The re-insert landed AFTER the fold, so the fold's mask must not
    // suppress it — a consumer applying inserts-then-deletes per range
    // still converges because the delete (k=1) precedes the re-insert
    // in version order ONLY downstream of the fold it already folded.
    assert(changes == Seq((1L, 11L)),
      s"re-insert after an in-range fold delivered $changes")
    // An in-range row whose key the fold removed is suppressed: append
    // BEFORE the tombstone+fold never flows.
    val dir2 = tmp("graft_feed_suppress")
    TxTable.init(spark, dir2, init.schema)
    TxTable.append(spark, dir2, init) // v1 (pre-range)
    val since2 = TxTable.snapshot(dir2).version
    TxTable.append(spark, dir2, Seq((9L, 90L)).toDF("k", "v")) // v2: in-range
    TxTable.deleteKeysDeferred(dir2, "k", Seq(9L)) // v3
    TxTable.foldDeletes(spark, dir2) // v4
    val changes2 = TxTable.readChanges(spark, dir2, since2,
      TxTable.snapshot(dir2).version)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(changes2.isEmpty,
      s"an in-range insert erased by an in-range fold re-surfaced: $changes2")
  }

  test("readChanges tolerates a compaction; a keyed replace still fails loudly") {
    val dir = tmp("graft_feed_compact")
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    TxTable.init(spark, dir, init.schema)
    TxTable.append(spark, dir, init) // v1 (pre-range)
    val since = TxTable.snapshot(dir).version
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v")) // v2
    TxTable.append(spark, dir, Seq((4L, 40L)).toDF("k", "v")) // v3
    // Compact EVERYTHING into one dir — including the pre-range dir, so
    // the endpoint diff sees a vanished since-visible dir.
    val snap = TxTable.snapshot(dir)
    TxTable.compactDirs(spark, dir, snap, snap.dirs)()
    val head = TxTable.snapshot(dir)
    val changes = TxTable.readChanges(spark, dir, since, head.version)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(changes == Seq((3L, 30L), (4L, 40L)),
      s"compaction-spanning range delivered $changes")
    // A DATA-changing rewrite in range must still fail: replace k=2.
    PrunedReplace.replaceKeys(spark, dir, "k", Array(2L),
      Seq((2L, 99L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      TxTable.readChanges(spark, dir, since, TxTable.snapshot(dir).version)
        .collect()
    }
    assert(e.getMessage.contains("not append-only"),
      s"keyed replace in range must fail the feed, got: ${e.getMessage}")
  }

  test("the paced CDF stream keeps flowing across an auto-fold") {
    // The advisory scenario: erasure volume trips the auto-fold and the
    // running feed consumer must NOT wedge. Threshold dropped to
    // fixture scale; a memory-sink stream drains before and after.
    val dir = tmp("graft_feed_autofold")
    val ck = tmp("graft_feed_autofold_ck")
    val init = (1L to 12L).map(i => (i, i * 10L)).toDF("k", "v")
    TxTable.init(spark, dir, init.schema)
    TxTable.append(spark, dir, init) // v1
    // (The memory sink cannot recover a checkpoint across restarts, so
    // the consumer collects via foreachBatch — the CdcSync shape.)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-txtable")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(dir)
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.select(col("_change_type"), col("k")).collect()
            .foreach(r => got.add((r.getString(0), r.getLong(1))))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // consumer caught up to v1
    val prevThreshold = TxTable.AutoFoldTombstones
    TxTable.AutoFoldTombstones = 3
    try {
      // 5 tombstones in one commit crosses the threshold: the SAME call
      // schedules the fold, so the unconsumed range spans tombstone AND
      // fold commits.
      TxTable.deleteKeysDeferred(dir, "k", Seq(1L, 2L, 3L, 4L, 5L))
      assert(TxTable.snapshot(dir).dkeys.isEmpty, "auto-fold did not fire")
      TxTable.append(spark, dir, Seq((20L, 200L)).toDF("k", "v"))
      drain() // must not throw — the fold is in the consumer's range
    } finally TxTable.AutoFoldTombstones = prevThreshold
    import scala.jdk.CollectionConverters._
    val feed = got.asScala.toSeq
    assert(feed.collect { case ("delete", k) => k }.sorted
      == Seq(1L, 2L, 3L, 4L, 5L),
      "auto-folded tombstones must still surface as delete rows")
    assert(feed.collect { case ("insert", k) => k }.sorted
      == ((1L to 12L) :+ 20L).sorted,
      "inserts must deliver exactly once across the auto-fold")
  }
}
