package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, SparkSpec => S}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class EventStoreCompactSpec extends SparkSpec {

  test("compaction bin-packs the fact store without changing its contents") {
    val root = Files.createTempDirectory("graft_compact").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    // Five separate appends, each multi-partition → many small files.
    (0 until 5).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 5 === i).repartition(4))
    }
    val beforeRows = store.facts(spark).orderBy("event_id").collect().toSeq
    val (before, after) = store.compactFacts(spark)
    assert(before >= 20L, s"expected many small files, saw $before")
    assert(after == 1L, s"tiny store should compact to one file, saw $after")
    val afterRows = store.facts(spark).orderBy("event_id").collect().toSeq
    assert(afterRows == beforeRows)
    // Idempotent: already-compact store is left alone.
    assert(store.compactFacts(spark) == ((1L, 1L)))
  }

  test("a previous fold is carried by reference, never refolded") {
    import graft.sources.TxTable
    val root = Files.createTempDirectory("graft_compact_ss").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    (0 until 4).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 5 === i).repartition(4))
    }
    val t = s"$root/fact_events"
    val total = TxTable.dataFiles(t, TxTable.snapshot(t))
      .map(f => Files.size(f._1)).sum
    // One bin: everything folds into a single dir.
    store.compactFacts(spark, targetBytes = total)
    val folded = TxTable.snapshot(t).dirs
    assert(folded.size == 1)
    // Re-anchor the bin to the folded dir's REAL bytes (merging many
    // tiny parquet files recompresses far below their sum at fixture
    // scale), so the dir models a production fold at ≥ half a bin.
    val foldedBytes = TxTable.dataFiles(t, TxTable.snapshot(t))
      .map(f => Files.size(f._1)).sum
    // Steady state with no backlog is a NO-OP — no new commit at all.
    val v = TxTable.snapshot(t).version
    store.compactFacts(spark, targetBytes = foldedBytes)
    assert(TxTable.snapshot(t).version == v,
      "re-compaction of an already-compact store committed a new version")
    // A fresh delta folds ALONE; yesterday's fold carries by reference
    // (the old mean-size test refolded ALL previously compacted data on
    // every call — O(table) write amplification in steady state).
    store.appendFacts(events.filter(col("event_id") % 5 === 4).repartition(3))
    store.compactFacts(spark, targetBytes = foldedBytes)
    val dirs = TxTable.snapshot(t).dirs
    assert(dirs.contains(folded.head),
      "compaction refolded the previous fold instead of carrying it")
    assert(dirs.size == 2, s"expected previous fold + one new fold: $dirs")
    assert(store.facts(spark).count() == events.count())
  }

  test("z-order fact compaction: contents unchanged, id probe prunes files") {
    import graft.sources.TxTable
    val root = Files.createTempDirectory("graft_compact_z").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    (0 until 4).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 4 === i).repartition(3))
    }
    val before = store.facts(spark).orderBy("event_id").collect().toSeq
    val t = s"$root/fact_events"
    val total = TxTable.dataFiles(t, TxTable.snapshot(t))
      .map(f => Files.size(f._1)).sum
    // Target ≈ a quarter of the table: everything folds, into ~4 files.
    store.compactFacts(spark, targetBytes = total / 4 + 1, zorder = true)
    assert(store.facts(spark).orderBy("event_id").collect().toSeq == before,
      "z-order compaction changed table contents")
    val snap = TxTable.snapshot(t)
    val all = TxTable.dataFiles(t, snap).size
    assert(all > 1, s"expected a multi-file fold, saw $all")
    val id = before.head.getLong(before.head.fieldIndex("event_id"))
    assert(TxTable.lookupFiles(t, snap, "event_id", Seq(id)).size < all,
      "event_id probe did not prune after the z-order fold")
  }

  test("fact compaction is partial: full-sized dirs carry by reference") {
    import graft.sources.TxTable
    val root = Files.createTempDirectory("graft_compact_p").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    val t = s"$root/fact_events"
    // One "full-sized" dir (single file, well above the tiny target),
    // then a trickle of small multi-file appends.
    store.appendFacts(events.filter(col("event_id") % 5 === 0).coalesce(1))
    val bigDir = TxTable.snapshot(t).dirs.head
    val bigBytes = TxTable.dataFiles(t, TxTable.snapshot(t))
      .map(f => Files.size(f._1)).sum
    (1 until 5).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 5 === i).repartition(4))
    }
    val beforeRows = store.facts(spark).orderBy("event_id").collect().toSeq
    // Target sized so the first dir's one file counts as full and the
    // per-append files (each ~1/4 of a fifth of the data) count small.
    val target = (bigBytes * 3) / 4
    store.compactFacts(spark, targetBytes = target)
    val s = TxTable.snapshot(t)
    assert(s.dirs.size == 2, s"expected big dir + one folded dir: ${s.dirs}")
    assert(s.dirs.head == bigDir,
      "compaction rewrote the already-full-sized dir")
    assert(store.facts(spark).orderBy("event_id").collect().toSeq == beforeRows)
  }

  test("appends racing compaction: every row survives, compaction re-plans") {
    val root = Files.createTempDirectory("graft_compact_race").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    store.appendFacts(events.filter(col("event_id") % 8 === 0).repartition(2))
    val appender = new Thread(() =>
      (1 until 8).foreach { i =>
        store.appendFacts(events.filter(col("event_id") % 8 === i).repartition(2))
      })
    appender.start()
    // Compact continuously under the append stream: every lost version
    // claim must re-plan against the fresh snapshot (the internal
    // ConcurrentCommitException loop), never clobber a landed append.
    while (appender.isAlive) store.compactFacts(spark)
    appender.join()
    store.compactFacts(spark)
    val got = store.facts(spark).select(col("event_id"))
      .orderBy("event_id").collect().map(_.getLong(0)).toSeq
    val want = events.select(col("event_id"))
      .orderBy("event_id").collect().map(_.getLong(0)).toSeq
    assert(got === want, "rows lost or duplicated under the append/compact race")
  }

  test("time-sliced facts read prunes files from manifest stats, exactly") {
    val root = Files.createTempDirectory("graft_slice").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    // Append in FOUR disjoint time slices (one file each) so the
    // manifest records non-overlapping ts ranges per file.
    val bounds = events.agg(min("ts"), max("ts")).collect()(0)
    val (tsLo, tsHi) = (bounds.getTimestamp(0).getTime * 1000L,
      bounds.getTimestamp(1).getTime * 1000L)
    val span = tsHi - tsLo
    (0 until 4).foreach { i =>
      val lo = tsLo + span * i / 4
      val hi = if (i == 3) tsHi + 1 else tsLo + span * (i + 1) / 4
      store.appendFacts(events.filter(
        unix_micros(col("ts")) >= lo && unix_micros(col("ts")) < hi).coalesce(1))
    }
    // A window inside slice 1 must scan exactly one of the four files.
    val qLo = tsLo + span / 4
    val qHi = tsLo + span * 2 / 5
    val (pruned, scanned, total) = store.factsInRange(spark, qLo, qHi)
    assert(total == 4L, s"expected 4 files, saw $total")
    assert(scanned == 1L, s"manifest pruning should scan 1 file, scanned $scanned")
    // Exactness: pruned result == full-scan filter, row for row.
    val expect = store.facts(spark)
      .filter(unix_micros(col("ts")) >= qLo && unix_micros(col("ts")) <= qHi)
      .orderBy("event_id").collect().toSeq
    assert(pruned.orderBy("event_id").collect().toSeq == expect)
    assert(expect.nonEmpty, "degenerate window: test proves nothing")
    // An out-of-range window scans nothing and returns empty.
    val (empty, s0, _) = store.factsInRange(spark, tsHi + span, tsHi + 2 * span)
    assert(s0 == 0L && empty.isEmpty)
  }
}
