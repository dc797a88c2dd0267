package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key tombstones (the engine's deletion-vector shape): a deferred
  * delete is ONE metadata commit — zero data files read or written —
  * whose mask every read path applies; a later fold (or any rewrite
  * that happens to touch the files) makes it physical. Semantics are
  * SUPPRESSION-LIST: the mask applies to the table, not to the files
  * that existed at delete time, so a key re-appended before the fold
  * stays masked (for the erasure workload this is the desired
  * behavior — late-arriving rows of an erased user are suppressed
  * too); the fold is the re-admission point.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_dv").toString
  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  private def fileSet(dir: String): Set[String] =
    TxTable.dataFiles(dir, TxTable.snapshot(dir))
      .map(_._1.toString).toSet

  test("deferred delete: one metadata commit, zero data I/O, masked everywhere") {
    val dir = tmp()
    TxTable.init(spark, dir, schema, bloomCols = Seq("k"))
    TxTable.append(spark, dir,
      Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, 20L), (null, 99L))
        .toDF("k", "v"))
    TxTable.append(spark, dir, Seq((3L, 30L), (4L, 40L)).toDF("k", "v"))
    val filesBefore = fileSet(dir)
    val vBefore = TxTable.snapshot(dir).version

    TxTable.deleteKeysDeferred(dir, "k", Seq(2L, 3L))

    assert(fileSet(dir) == filesBefore,
      "deferred delete touched data files — it must be metadata-only")
    assert(TxTable.snapshot(dir).version == vBefore + 1)
    // read masks; the NULL key survives (DELETE of key K never matches NULL).
    val keys = TxTable.read(spark, dir)
      .select(col("k")).collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(keys.toSet == Set[Any](1L, 4L, null),
      s"mask wrong: ${keys.mkString(",")}")
    // The point lookup masks too (it scans files directly).
    assert(TxTable.lookupKeys(spark, dir, "k", Seq(2L, 4L)).count() == 1L)
    // Idempotent re-delete is a commit no-op.
    val v = TxTable.snapshot(dir).version
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L))
    assert(TxTable.snapshot(dir).version == v, "known tombstone re-committed")
  }

  test("time travel sees pre-delete rows; restore rolls the mask back") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v")) // v1
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L)) // v2
    assert(TxTable.read(spark, dir).count() == 1L)
    assert(TxTable.readVersion(spark, dir, 1L).count() == 2L,
      "versionAsOf before the delete must not apply the later mask")
    TxTable.restore(spark, dir, 1L) // v3 = v1's contents AND v1's (empty) mask
    assert(TxTable.read(spark, dir).count() == 2L,
      "restore past the delete must roll the tombstones back with the data")
  }

  test("suppression semantics: re-appended key stays masked until the fold") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L))
    TxTable.append(spark, dir, Seq((2L, 21L)).toDF("k", "v")) // late arrival
    assert(TxTable.read(spark, dir).select("k").as[Long].collect().toSeq == Seq(1L),
      "a key re-appended under an open tombstone must stay suppressed")
    val (rewritten, _) = TxTable.foldDeletes(spark, dir)
    assert(rewritten >= 1L)
    assert(TxTable.snapshot(dir).dkeys.isEmpty, "fold must clear the mask")
    assert(TxTable.read(spark, dir).select("k").as[Long].collect().toSeq == Seq(1L),
      "fold changed visible contents")
    TxTable.append(spark, dir, Seq((2L, 22L)).toDF("k", "v")) // re-admission
    assert(TxTable.read(spark, dir).orderBy("k").select("v").as[Long]
      .collect().toSeq == Seq(10L, 22L))
  }

  test("fold is pruned: only files whose bounds admit a deleted key rewrite") {
    val dir = tmp()
    TxTable.init(spark, dir, schema, bloomCols = Seq("k"))
    // Key-range-clustered files: 0-99, 100-199, 200-299, 300-399.
    (0 until 4).foreach { b =>
      TxTable.append(spark, dir,
        spark.range(b * 100L, b * 100L + 100L).toDF("k")
          .withColumn("v", col("k") * 2).coalesce(1))
    }
    TxTable.deleteKeysDeferred(dir, "k", Seq(150L, 160L)) // inside file 2 only
    val before = fileSet(dir)
    val (rewritten, total) = TxTable.foldDeletes(spark, dir)
    assert(rewritten == 1L && total == 4L,
      s"expected exactly the straddling file to rewrite, got $rewritten/$total")
    val after = fileSet(dir)
    assert((before -- after).size == 1, "more than one file replaced")
    assert(TxTable.read(spark, dir).count() == 398L)
    assert(TxTable.snapshot(dir).dkeys.isEmpty)
  }

  test("foldDeletesFor folds ONLY the requested keys; the rest of the mask carries") {
    // The key-scoped fold behind the mirror's collision path (CdcSync):
    // one re-admitted key must rewrite only ITS hit files, however
    // large the standing mask — and every unrequested tombstone must
    // stay standing (still masking) afterwards.
    val dir = tmp()
    TxTable.init(spark, dir, schema, bloomCols = Seq("k"))
    // Key-range-clustered files: 0-99, 100-199, 200-299, 300-399.
    (0 until 4).foreach { b =>
      TxTable.append(spark, dir,
        spark.range(b * 100L, b * 100L + 100L).toDF("k")
          .withColumn("v", col("k") * 2).coalesce(1))
    }
    // One masked key per file: a four-file-wide standing mask.
    TxTable.deleteKeysDeferred(dir, "k", Seq(50L, 150L, 250L, 350L))
    val (rewritten, total) =
      TxTable.foldDeletesFor(spark, dir, Map("k" -> Seq("150")))
    assert(rewritten == 1L && total == 4L,
      s"scoped fold should rewrite exactly key 150's file, got $rewritten/$total")
    assert(TxTable.snapshot(dir).dkeys.getOrElse("k", Nil).toSet ==
      Set("50", "250", "350"),
      s"unrequested masks must carry: ${TxTable.snapshot(dir).dkeys}")
    // All four keys still excluded (one physical, three masked).
    assert(TxTable.read(spark, dir)
      .filter(col("k").isin(50L, 150L, 250L, 350L)).isEmpty)
    assert(TxTable.read(spark, dir).count() == 396L)
    // Unmasked keys are no-ops; a second scoped fold of a cleared key too.
    val (r2, _) = TxTable.foldDeletesFor(spark, dir,
      Map("k" -> Seq("150", "999"), "missing" -> Seq("1")))
    assert(r2 == 0L, "re-folding cleared/unknown keys must be a no-op")
    // The remaining mask folds normally later.
    val (r3, _) = TxTable.foldDeletes(spark, dir)
    assert(r3 == 3L && TxTable.snapshot(dir).dkeys.isEmpty)
    assert(TxTable.read(spark, dir).count() == 396L)
  }

  test("a derive-from-old keyed replace cannot resurrect a tombstoned key") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L))
    // An arithmetic merge of key 1 reads its hit file — which ALSO
    // physically holds tombstoned key 2. The derive must see masked
    // rows only, and the rewrite must not carry key 2's row forward
    // unmasked.
    PrunedReplace.replaceWith(spark, dir, "k", Array(1L)) { hit =>
      assert(hit.filter(col("k") === 2L).isEmpty,
        "derive-from-old exposed a tombstoned row to the merge")
      hit.filter(col("k") === 1L).select(col("k"), (col("v") + 1L).as("v"))
    }
    val out = TxTable.read(spark, dir).orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L) && out.head.getLong(1) == 11L,
      s"unexpected contents after merge over a tombstoned table")
  }

  test("compaction folds masked rows away for free; carried mask stays correct") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    TxTable.append(spark, dir, Seq((3L, 30L), (4L, 40L)).toDF("k", "v"))
    TxTable.append(spark, dir, Seq((5L, 50L)).toDF("k", "v"))
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L, 5L))
    val snap = TxTable.snapshot(dir)
    // Fold the two level-0 dirs (largest carries by reference): the
    // folded output must not contain the masked rows physically.
    val fold = TxTable.levelZeroDirs(dir, snap)
    assert(fold.nonEmpty)
    TxTable.compactDirs(spark, dir, snap, fold)()
    val after = TxTable.snapshot(dir)
    assert(after.dkeys.nonEmpty, "compaction must carry the mask for untouched dirs")
    // Visible contents unchanged by the fold.
    assert(TxTable.read(spark, dir).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L, 4L))
    // Physical check: the freshly folded dir holds no masked keys.
    val foldedDir = after.dirs.filterNot(snap.dirs.contains).head
    val physical = spark.read.parquet(TxTable.stagedPath(dir, foldedDir))
      .select("k").as[Long].collect().toSet
    assert(!physical.contains(2L) && !physical.contains(5L),
      s"fold kept masked rows: $physical")
  }

  test("readChanges delivers new rows through the head mask; tombstone commits don't break the feed") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L)).toDF("k", "v")) // v1
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L)) // v2 — no dir change
    TxTable.append(spark, dir, Seq((2L, 20L), (3L, 30L)).toDF("k", "v")) // v3
    // The range spans the tombstone commit: must not throw, and the
    // appended-but-masked key 2 must not flow.
    val changed = TxTable.readChanges(spark, dir, 1L, 3L)
      .select("k").as[Long].collect().toSeq
    assert(changed == Seq(3L),
      s"changes over a tombstoned range delivered $changed (want Seq(3))")
  }

  test("deletedKeysBetween: the deletion half of the change feed") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")) // v1
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L)) // v2
    TxTable.append(spark, dir, Seq((4L, 40L)).toDF("k", "v")) // v3 (carries mask)
    TxTable.deleteKeysDeferred(dir, "k", Seq(3L)) // v4
    assert(TxTable.deletedKeysBetween(dir, 1L, 4L) == Map("k" -> Seq("2", "3")))
    assert(TxTable.deletedKeysBetween(dir, 2L, 4L) == Map("k" -> Seq("3")))
    assert(TxTable.deletedKeysBetween(dir, 4L, 4L) == Map.empty)
    // A fold clears the block; a post-fold re-delete counts as added
    // (downstream deletes are idempotent).
    TxTable.foldDeletes(spark, dir) // v5 (+1 per folded column)
    val folded = TxTable.snapshot(dir).version
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L))
    assert(TxTable.deletedKeysBetween(dir, folded, folded + 1) ==
      Map("k" -> Seq("2")))
  }

  test("a deferred delete racing an append: both land, mask coherent") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    // Real thread contention: the optimistic retry must serialize the
    // metadata-only tombstone commit against a data append without
    // losing either — a lost tombstone would resurrect an erased key,
    // a lost append would drop rows.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val del = pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          TxTable.deleteKeysDeferred(dir, "k", Seq(2L)); ()
        }
      })
      val app = pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v")); ()
        }
      })
      del.get(); app.get()
    } finally pool.shutdown()
    val snap = TxTable.snapshot(dir)
    assert(snap.dkeys == Map("k" -> Seq("2")), s"tombstone lost: ${snap.dkeys}")
    assert(TxTable.read(spark, dir).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L), "race lost a row or resurrected a masked one")
  }

  test("fold racing a concurrent tombstone: the unfolded mask survives (ADVICE r12)") {
    val dir = tmp()
    TxTable.init(spark, dir, StructType.fromDDL("k BIGINT, v BIGINT, u BIGINT"))
    TxTable.append(spark, dir,
      Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L), (4L, 40L, 400L))
        .toDF("k", "v", "u"))
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L))
    // Inject tombstones in the window between foldDeletes' loop-top
    // snapshot and the staged replace's planning read: one more key on
    // the SAME column being folded (k=3, not in the fold's vals) and
    // one on a DIFFERENT column (u=100). Neither trips the staged
    // commit's version check — the replace plans against the
    // post-injection version — so a dkeys override derived from the
    // stale loop-top snapshot would silently drop both and resurrect
    // the rows.
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    TxTable.foldInterleave = () =>
      if (fired.compareAndSet(false, true)) {
        TxTable.deleteKeysDeferred(dir, "k", Seq(3L))
        TxTable.deleteKeysDeferred(dir, "u", Seq(100L))
        ()
      }
    try TxTable.foldDeletes(spark, dir)
    finally TxTable.foldInterleave = () => ()
    assert(TxTable.snapshot(dir).dkeys.isEmpty,
      "fold returned with tombstones still pending")
    // k=2 folded, k=3 and u=100 (row k=1) landed mid-fold and must
    // still be deleted; k=4 was never touched and must survive.
    assert(TxTable.read(spark, dir).select("k").as[Long].collect().toSeq
      == Seq(4L),
      "a tombstone that landed during the fold was dropped — rows resurrected")
  }

  test("sustained deferred deletes self-fold: mask stays bounded, never errors") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir,
      (1L to 1000L).map(k => (k, k)).toDF("k", "v").coalesce(1))
    val prev = TxTable.AutoFoldTombstones
    TxTable.AutoFoldTombstones = 10
    try {
      // 20 batches of 3 distinct keys: every crossing past 10 pending
      // tombstones must self-schedule a fold, so the mask NEVER grows
      // toward the MaxTombstones error — the operator just deletes.
      var worstPending = 0
      (0 until 20).foreach { b =>
        TxTable.deleteKeysDeferred(dir, "k", (1L to 3L).map(b * 3 + _))
        worstPending = math.max(worstPending,
          TxTable.snapshot(dir).dkeys.valuesIterator.map(_.size).sum)
      }
      assert(worstPending <= TxTable.AutoFoldTombstones + 3,
        s"auto-fold let the mask grow to $worstPending pending tombstones")
      assert(TxTable.read(spark, dir).count() == 940L,
        "auto-folding lost or resurrected rows")
    } finally TxTable.AutoFoldTombstones = prev
  }

  test("auto-fold under contention: racing deleters and an appender all cross the threshold") {
    // VERDICT r13 #6 — the crossing itself under contention, one level up
    // from the fold-vs-tombstone interleave above: several writers push
    // the mask over AutoFoldTombstones SIMULTANEOUSLY, so folds race
    // folds (ConcurrentCommitException → re-plan), folds race tombstone
    // commits (the dkeys override), and an appender loses claims to
    // mid-fold rewrites and retries against the folded table. Required:
    // no error surfaces, no tombstone is lost (every deleted key stays
    // deleted), no row is lost (appended rows and untouched rows all
    // survive), and the mask ends bounded near the threshold.
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.append(spark, dir,
      (1L to 600L).map(k => (k, k)).toDF("k", "v").coalesce(4))
    val prev = TxTable.AutoFoldTombstones
    TxTable.AutoFoldTombstones = 12
    val deleters = 3; val batches = 6; val perBatch = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(deleters + 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    try {
      val work = (0 until deleters).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try (0 until batches).foreach { b =>
              // Disjoint key ranges per writer: every key each writer
              // tombstones must be gone at the end, no overlap excuses.
              val base = w * 200L + b * perBatch
              TxTable.deleteKeysDeferred(dir, "k", (1 to perBatch).map(base + _))
              ()
            } catch { case t: Throwable => errs.add(t); () }
        })
      } :+ pool.submit(new Runnable {
        override def run(): Unit =
          try (0 until 5).foreach { b =>
            TxTable.append(spark, dir,
              Seq((3000L + b, 3000L + b)).toDF("k", "v"))
            ()
          } catch { case t: Throwable => errs.add(t); () }
      })
      work.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"contention surfaced: ${errs.peek()}")
      val deleted = (for (w <- 0 until deleters; b <- 0 until batches;
                          i <- 1 to perBatch) yield w * 200L + b * perBatch + i).toSet
      val expected = ((1L to 600L).toSet -- deleted) ++ (0 until 5).map(3000L + _)
      assert(TxTable.read(spark, dir).select("k").as[Long].collect().toSet == expected,
        "contention lost a tombstone, lost an append, or resurrected a row")
      // Every synchronous crossing folded: the residual mask is near zero,
      // never drifting toward MaxTombstones (+ one racing batch of slack
      // per writer that landed during another's fold).
      val pending = TxTable.snapshot(dir).dkeys.valuesIterator.map(_.size).sum
      assert(pending <= TxTable.AutoFoldTombstones + deleters * perBatch,
        s"auto-fold under contention left $pending tombstones pending")
      // And a final explicit fold converges to a clean table.
      TxTable.foldDeletes(spark, dir)
      assert(TxTable.snapshot(dir).dkeys.isEmpty)
      assert(TxTable.read(spark, dir).select("k").as[Long].collect().toSet == expected)
    } finally {
      TxTable.AutoFoldTombstones = prev
      pool.shutdown()
    }
  }

  test("string keys, type check, and the tombstone cap") {
    val dir = tmp()
    TxTable.init(spark, dir, StructType.fromDDL("name STRING, v BIGINT"))
    TxTable.append(spark, dir, Seq(("a", 1L), ("b", 2L)).toDF("name", "v"))
    TxTable.deleteStringKeysDeferred(dir, "name", Seq("b"))
    assert(TxTable.read(spark, dir).select("name").as[String]
      .collect().toSeq == Seq("a"))
    // Long API on a string column is a loud type error, not a bad cast.
    intercept[IllegalArgumentException] {
      TxTable.deleteKeysDeferred(dir, "v2_missing", Seq(1L))
    }
    intercept[IllegalArgumentException] {
      TxTable.deleteStringKeysDeferred(dir, "v", Seq("1"))
    }
    // The cap: one oversized request is refused toward the physical path.
    intercept[IllegalArgumentException] {
      TxTable.deleteStringKeysDeferred(dir, "name",
        (0 to TxTable.MaxTombstones).map(i => s"k$i"))
    }
  }

  test("eraseUsersDeferred: zero rewrites on the unclustered layout, facts masked") {
    val root = Files.createTempDirectory("graft_dv_erase").toString
    val store = new graft.streaming.EventStore(root)
    val events = graft.sources.Tables(spark, SparkSpec.Sf0001).events
    (0 until 3).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 3 === i).repartition(2))
    }
    store.insertIfAbsent("dim_user", events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_seen")), "user_id")
    val users = events.select(col("user_id")).distinct().orderBy("user_id")
      .limit(2).collect().map(_.getLong(0)).toSeq
    val factDir = s"$root/fact_events"
    val filesBefore = fileSet(factDir)
    val before = store.facts(spark).count()

    store.eraseUsersDeferred(users)

    assert(fileSet(factDir) == filesBefore,
      "deferred erasure rewrote data files — the whole point is zero data I/O")
    val facts = store.facts(spark)
    assert(facts.filter(col("user_id").isInCollection(users)).isEmpty,
      "erased users still visible in facts")
    assert(facts.count() < before)
    assert(TxTable.read(spark, s"$root/dim_user")
      .filter(col("user_id").isInCollection(users)).isEmpty,
      "erased users still visible in the dimension")
    // factsInRange (direct file scan) masks too.
    val loHi = events.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().head
    val (ranged, _, _) = store.factsInRange(spark, loHi.getLong(0), loHi.getLong(1))
    assert(ranged.filter(col("user_id").isInCollection(users)).isEmpty,
      "factsInRange bypassed the tombstone mask")
    // The fold makes it physical and is content-transparent.
    val (rw, _) = TxTable.foldDeletes(spark, factDir)
    assert(rw >= 1L)
    assert(TxTable.snapshot(factDir).dkeys.isEmpty)
    assert(store.facts(spark).count() == facts.count())
  }
}
