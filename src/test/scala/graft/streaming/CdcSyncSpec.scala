package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{DedupIndex, PQIndexTx}
import graft.sources.{Tables, TxTable}
import org.apache.spark.sql.functions._

/** The CDC loop closed end-to-end: GDPR erasure lands on a source
  * TxTable as ONE tombstone commit ([[graft.streaming.EventStore
  * .eraseUsersDeferred]] is exactly this on the fact log), flows
  * through the change feed's deletion half (`readChangeFeed` —
  * `_change_type` rows), and a [[CdcSync]] consumer applies it to the
  * serving indexes — so an ANN search or a dedup-pair read downstream
  * excludes the erased keys without anyone rebuilding anything.
  */
class CdcSyncSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val (m, dsub, ksub, iters) = (8, 8, 8, 2)
  private val (coarseK, coarseIters, nprobe) = (8, 3, 2)
  private val nq = 5

  test("erasure on the fact table is visible in the change feed as delete rows") {
    val root = tmp("graft_cdc_facts")
    val store = new EventStore(root)
    val events = Tables(spark, SparkSpec.Sf0001).events
    store.appendFacts(events)
    val factDir = s"$root/fact_events"
    val since = TxTable.snapshot(factDir).version
    val users = events.select(col("user_id")).distinct().orderBy("user_id")
      .limit(2).collect().map(_.getLong(0)).toSeq

    store.eraseUsersDeferred(users)

    // Drain the CDF stream over the erasure range into memory.
    val q = spark.readStream.format("graft-txtable")
      .option("readChangeFeed", "true")
      .option("startingVersion", since.toString)
      .load(factDir)
      .writeStream.format("memory").queryName("facts_feed")
      .option("checkpointLocation", tmp("graft_cdc_facts_ck"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.table("facts_feed")
    val dels = feed.filter(col("_change_type") === "delete")
      .select(col("user_id")).collect().map(_.getLong(0)).toSeq
    assert(dels.sorted == users.sorted,
      s"the feed's deletion half delivered $dels, wanted $users")
    // Delete rows carry ONLY the key; nothing else leaks.
    assert(feed.filter(col("_change_type") === "delete")
      .filter(col("event_id").isNotNull).isEmpty,
      "delete rows must hold only the tombstoned key column")
    assert(feed.filter(col("_change_type") === "insert").isEmpty,
      "no data commit in the range, so no insert rows")
  }

  test("erased vectors flow feed → PQIndexTx: the ANN search excludes them") {
    val vecs = Tables(spark, SparkSpec.Sf0001).embeddings
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS e")
      .persist()
    val srcDir = tmp("graft_cdc_vsrc")
    val indexDir = tmp("graft_cdc_vidx")
    val ckpt = tmp("graft_cdc_vck")
    val initial = vecs.filter(col("vec_id") < 300)
    TxTable.init(spark, srcDir, initial.schema)
    TxTable.append(spark, srcDir, initial)
    PQIndexTx.buildIVF(spark, TxTable.read(spark, srcDir), indexDir,
      m, dsub, ksub, iters, nq, coarseK, coarseIters)
    val since = TxTable.snapshot(srcDir).version

    // Post-build changes on the SOURCE: a delta batch and an erasure.
    val delta = vecs.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    TxTable.append(spark, srcDir, delta)
    val erase = Seq(100L, 101L, 102L)
    TxTable.deleteKeysDeferred(srcDir, "vec_id", erase)

    val q = CdcSync.vectorsToAnn(spark, srcDir, indexDir, ckpt, since,
      dsub = dsub, nq = nq)
    try q.processAllAvailable() finally q.stop()

    val codes = TxTable.read(spark, s"$indexDir/codes")
    assert(codes.filter(col("vec_id").isInCollection(erase)).isEmpty,
      "erased vec_ids still served by the codes table")
    assert(codes.filter(col("vec_id") >= 300).count() == 50L,
      "the delta batch did not reach the index")
    // The search itself (generous shortlist so the erased ids would
    // surface if still encoded) never returns an erased candidate.
    val res = PQIndexTx.searchIVF(spark, indexDir,
      vecs.filter(col("vec_id") < nq), rerankVecs = vecs, dsub = dsub,
      nprobe = coarseK, shortlist = 400, topK = 100)
    assert(res.filter(col("cand_id").isInCollection(erase)).isEmpty,
      "ANN search returned an erased vector")
    // Restart from the same checkpoint: nothing replays, nothing moves.
    val v = TxTable.snapshot(s"$indexDir/codes").version
    val q2 = CdcSync.vectorsToAnn(spark, srcDir, indexDir, ckpt, since,
      dsub = dsub, nq = nq)
    try q2.processAllAvailable() finally q2.stop()
    assert(TxTable.snapshot(s"$indexDir/codes").version == v,
      "a restart with an intact checkpoint re-applied the feed")
    // RE-ADMISSION after a primary fold. Cross-batch: the primary
    // folds its tombstones and re-appends the erased ids — live at
    // the source, so the index's STANDING mask (deferred from the
    // earlier batch) must fold at the collision and serve them again.
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir, vecs.filter(col("vec_id").isInCollection(erase)))
    val q3 = CdcSync.vectorsToAnn(spark, srcDir, indexDir, ckpt, since,
      dsub = dsub, nq = nq)
    try q3.processAllAvailable() finally q3.stop()
    assert(TxTable.read(spark, s"$indexDir/codes")
      .filter(col("vec_id").isInCollection(erase)).count() == erase.size.toLong,
      "re-admitted vectors suppressed by the index's standing mask")
    // In-batch: erase + fold + re-append inside ONE feed range — the
    // batch's own delete row must not swallow its insert (delivered
    // inserts are live at the primary at batch-end).
    val erase2 = Seq(200L, 201L)
    TxTable.deleteKeysDeferred(srcDir, "vec_id", erase2)
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir, vecs.filter(col("vec_id").isInCollection(erase2)))
    val q4 = CdcSync.vectorsToAnn(spark, srcDir, indexDir, ckpt, since,
      dsub = dsub, nq = nq)
    try q4.processAllAvailable() finally q4.stop()
    assert(TxTable.read(spark, s"$indexDir/codes")
      .filter(col("vec_id").isInCollection(erase2)).count() == erase2.size.toLong,
      "an in-batch delete swallowed the re-admitted vectors")
    vecs.unpersist()
    ()
  }

  test("paced change feed: each delete lands exactly once, in its own range") {
    val dir = tmp("graft_cdc_paced")
    val init = Seq((1L, 1L)).toDF("k", "v")
    TxTable.init(spark, dir, init.schema)
    TxTable.append(spark, dir, init) // v1
    TxTable.deleteKeysDeferred(dir, "k", Seq(1L)) // v2
    TxTable.append(spark, dir, Seq((2L, 2L)).toDF("k", "v")) // v3
    TxTable.deleteKeysDeferred(dir, "k", Seq(2L)) // v4
    // One commit per micro-batch: the feed tiles (0,1](1,2](2,3](3,4].
    // Each insert is delivered through ITS batch-end mask (empty at the
    // time), and each tombstone surfaces exactly once, in the batch
    // whose range added it — pacing must not drop, duplicate, or
    // fast-forward the deletion half.
    val q = spark.readStream.format("graft-txtable")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxCommitsPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("paced_feed")
      .option("checkpointLocation", tmp("graft_cdc_paced_ck"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.table("paced_feed")
    assert(feed.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "paced inserts must flow through their own batch-end mask")
    assert(feed.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "each tombstone must surface exactly once across paced batches")
  }

  test("mirrorTable replicates appends AND erasures into a second TxTable") {
    val srcDir = tmp("graft_cdc_msrc")
    val dstDir = tmp("graft_cdc_mdst") + "/mirror"
    val ckpt = tmp("graft_cdc_mck")
    val init = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    TxTable.init(spark, srcDir, init.schema, bloomCols = Seq("k"))
    TxTable.append(spark, srcDir, init)
    // Bootstrap: the snapshot-first batch materializes the mirror.
    val q = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt,
      keyCols = Seq("k", "name"))
    try q.processAllAvailable() finally q.stop()
    def rows(d: String) = TxTable.read(spark, d).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows(dstDir) == rows(srcDir))
    assert(TxTable.snapshot(dstDir).bloomCols == Seq("k"),
      "mirror must inherit the source's bloom registration")
    // Post-bootstrap: an append plus erasures on BOTH key shapes.
    TxTable.append(spark, srcDir, Seq((4L, "d", 40L)).toDF("k", "name", "v"))
    TxTable.deleteKeysDeferred(srcDir, "k", Seq(2L))
    TxTable.deleteStringKeysDeferred(srcDir, "name", Seq("c"))
    val q2 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt,
      keyCols = Seq("k", "name"))
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(dstDir) == Seq((1L, "a", 10L), (4L, "d", 40L)),
      s"mirror diverged: ${rows(dstDir)}")
    assert(rows(dstDir) == rows(srcDir))
    // Replay from the intact checkpoint: watermark skips the inserts,
    // re-masks are commit no-ops — the mirror does not move.
    val v = TxTable.snapshot(dstDir).version
    val q3 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt,
      keyCols = Seq("k", "name"))
    try q3.processAllAvailable() finally q3.stop()
    assert(TxTable.snapshot(dstDir).version == v,
      "a replayed mirror batch re-landed instead of no-opping")
  }

  test("a once-erased key re-admitted after a primary fold survives on the mirror") {
    // The r14-advisory divergence: erase key K on the primary, FOLD
    // (physical; clears the primary's tombstones), then append NEW
    // rows under K — live on the primary. The mirror applied the
    // erasure as its own value-keyed deferred tombstone; without the
    // collision fold that mask would suppress K's every future event
    // forever, silently dropping the re-admitted rows while an
    // erase-shaped oracle still matched. The mirror must instead fold
    // its mask when a delivered insert collides with it and land the
    // new rows live.
    val srcDir = tmp("graft_cdc_readmit_src")
    val dstDir = tmp("graft_cdc_readmit_dst") + "/mirror"
    val ckpt = tmp("graft_cdc_readmit_ck")
    val init = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    TxTable.init(spark, srcDir, init.schema, bloomCols = Seq("k"))
    TxTable.append(spark, srcDir, init)
    val q = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q.processAllAvailable() finally q.stop()
    // Erase, fold, re-admit — all between drains (one feed range), and
    // then once more across separate drains.
    TxTable.deleteKeysDeferred(srcDir, "k", Seq(2L))
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir, Seq((2L, 21L)).toDF("k", "v"))
    val q2 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q2.processAllAvailable() finally q2.stop()
    def rows(d: String) = TxTable.read(spark, d).orderBy("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(dstDir) == Seq((1L, 10L), (2L, 21L), (3L, 30L)),
      s"mirror suppressed the re-admitted key: ${rows(dstDir)}")
    assert(rows(dstDir) == rows(srcDir))
    // Cross-drain variant: the delete lands in one drained range, the
    // fold + re-insert in the next — the mirror's standing tombstone
    // from the earlier batch must fold when the collision arrives.
    TxTable.deleteKeysDeferred(srcDir, "k", Seq(3L))
    val q3 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q3.processAllAvailable() finally q3.stop()
    assert(rows(dstDir) == Seq((1L, 10L), (2L, 21L)), s"erase lost: ${rows(dstDir)}")
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir, Seq((3L, 31L), (4L, 40L)).toDF("k", "v"))
    val q4 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q4.processAllAvailable() finally q4.stop()
    assert(rows(dstDir) == Seq((1L, 10L), (2L, 21L), (3L, 31L), (4L, 40L)),
      s"standing mirror tombstone suppressed a later re-admit: ${rows(dstDir)}")
    assert(rows(dstDir) == rows(srcDir))
  }

  test("mirrorTable under schema evolution: widen mid-stream, erase on the new column") {
    val srcDir = tmp("graft_cdc_evo_src")
    val dstDir = tmp("graft_cdc_evo_dst") + "/mirror"
    val ckpt = tmp("graft_cdc_evo_ck")
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    TxTable.init(spark, srcDir, init.schema)
    TxTable.append(spark, srcDir, init)
    def drain(): Unit = {
      val q = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt,
        keyCols = Seq("k", "region"))
      try q.processAllAvailable() finally q.stop()
    }
    // Bootstrap at the narrow schema, KEEP the query running, then
    // widen: the RUNNING stream (pinned narrow) must fail loudly — a
    // silent projection would hide the new column from the replica
    // forever — and the restart is the pickup (Delta's contract too).
    val q0 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt,
      keyCols = Seq("k", "region"))
    val midStreamErr = try {
      q0.processAllAvailable() // bootstrap at narrow
      assert(TxTable.read(spark, dstDir).columns.toSeq == Seq("k", "v"))
      TxTable.append(spark, srcDir,
        Seq((3L, 30L, "eu"), (4L, 40L, "us")).toDF("k", "v", "region"))
      intercept[Throwable] { q0.processAllAvailable() }
    } finally q0.stop()
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(midStreamErr).exists(_.contains("changed schema mid-stream")),
      s"widening under a running stream must fail restartably: $midStreamErr")
    // Erase ON THE NEW COLUMN (and an old-column key) while stopped.
    TxTable.deleteStringKeysDeferred(srcDir, "region", Seq("eu"))
    TxTable.deleteKeysDeferred(srcDir, "k", Seq(1L))
    drain() // restart: re-pin widened, replay null-padded, converge
    val got = TxTable.read(spark, dstDir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq((2L, 20L, null), (4L, 40L, "us")),
      s"mirror diverged after widen+erase: $got")
    val want = TxTable.read(spark, srcDir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == want)
    assert(TxTable.read(spark, dstDir).columns.toSeq == Seq("k", "v", "region"),
      "the replica must widen with the source")
  }

  test("mirrorTable fails loudly when a delete row carries no declared key column") {
    val srcDir = tmp("graft_cdc_loud_src")
    val dstDir = tmp("graft_cdc_loud_dst") + "/mirror"
    val init = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    TxTable.init(spark, srcDir, init.schema)
    TxTable.append(spark, srcDir, init)
    val ck = tmp("graft_cdc_loud_ck")
    val q0 = CdcSync.mirrorTable(spark, srcDir, dstDir, ck, keyCols = Seq("k"))
    try q0.processAllAvailable() finally q0.stop() // bootstrap (no deletes)
    // Erasure keyed on "name", but the mirror only declares "k": the
    // batch must fail (GDPR divergence), not drop the delete.
    TxTable.deleteStringKeysDeferred(srcDir, "name", Seq("b"))
    val q = CdcSync.mirrorTable(spark, srcDir, dstDir, ck, keyCols = Seq("k"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("cannot be routed")
      || Option(e.getCause).exists(_.getMessage.contains("cannot be routed")),
      s"wanted the unrouted-erasure error, got: ${e.getMessage}")
  }

  test("randomized source histories: the mirror converges to the source") {
    // Seeded random interleaving of appends, deferred deletes, additive
    // WIDENS, and physical FOLDS (the r14 layout-only rewrite the feed
    // must flow across), drained in stages (snapshot bootstrap
    // mid-history, then incremental feeds with deletes, schema changes,
    // and folds inside the ranges): whatever the order, the replica
    // must equal the source's masked contents, columns included —
    // folded rows must not re-deliver, and a delete folded away inside
    // a consumed range must still erase on the mirror.
    val srcDir = tmp("graft_cdc_rnd_src")
    val dstDir = tmp("graft_cdc_rnd_dst") + "/mirror"
    val ckpt = tmp("graft_cdc_rnd_ck")
    val seed = Seq((0L, 0L)).toDF("k", "v")
    TxTable.init(spark, srcDir, seed.schema)
    TxTable.append(spark, srcDir, seed)
    val rnd = new scala.util.Random(7)
    var key = 0L
    var vctr = 1000000L
    var extraCols = 0
    val everDeleted = scala.collection.mutable.ArrayBuffer.empty[Long]
    def appendKeyed(k: Long, v: Long): Unit = {
      var df = Seq((k, v)).toDF("k", "v")
      (1 to extraCols).foreach(i => df = df.withColumn(s"c$i", lit(k + i)))
      TxTable.append(spark, srcDir, df)
      ()
    }
    def appendRow(): Unit = { key += 1; appendKeyed(key, key) }
    def mutate(n: Int): Unit = (1 to n).foreach { _ =>
      rnd.nextInt(10) match {
        case 9 if extraCols < 3 => // widen, then use the column
          extraCols += 1
          appendRow()
        case 8 => // physical maintenance mid-feed: fold the open mask
          TxTable.foldDeletes(spark, srcDir)
          ()
        case 7 if everDeleted.nonEmpty =>
          // RE-INSERT of a previously deleted key — the arm the r14
          // advisory showed was structurally missing: while the key is
          // still tombstoned the new row stays masked on both sides,
          // but once a fold clears the source's mask, the re-insert is
          // LIVE at the source and the mirror's value-keyed tombstones
          // must not suppress it (CdcSync's collision fold).
          vctr += 1
          appendKeyed(everDeleted(rnd.nextInt(everDeleted.size)), vctr)
        case d if d >= 5 && key > 0L =>
          val k = rnd.between(0L, key + 1)
          everDeleted += k
          TxTable.deleteKeysDeferred(srcDir, "k", Seq(k))
          ()
        case _ => appendRow()
      }
    }
    def drain(): Unit = {
      val q = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
      try q.processAllAvailable() finally q.stop()
    }
    mutate(6)
    drain() // snapshot bootstrap (mask already applied to batch 1)
    mutate(10)
    drain() // incremental: inserts + deletes + widens in the range
    mutate(8)
    drain()
    def rows(d: String) = {
      val df = TxTable.read(spark, d)
      // Re-inserts can legitimately put several live rows under one
      // key (fold, re-insert, re-insert) — order the tie on v too.
      (df.columns.toSeq,
        df.orderBy("k", "v").collect().map(_.toSeq).toSeq)
    }
    assert(rows(dstDir) == rows(srcDir),
      s"mirror diverged from source after a randomized history (seed 7): " +
        s"mirror=${rows(dstDir)} source=${rows(srcDir)}")
  }

  test("erased docs flow feed → DedupIndex: pairs and components exclude them") {
    val srcDir = tmp("graft_cdc_dsrc")
    val indexDir = tmp("graft_cdc_didx")
    val ckpt = tmp("graft_cdc_dck")
    // 1 and 2 are near-dups (jaccard 3/5 = 0.6); 3 stands alone.
    val initial = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),
      (3L, Seq("x", "y", "z", "w"))).toDF("doc_id", "shs")
    TxTable.init(spark, srcDir, initial.schema)
    TxTable.append(spark, srcDir, initial)
    DedupIndex.build(spark, TxTable.read(spark, srcDir), indexDir, cap = 10)
    assert(DedupIndex.pairs(spark, indexDir).count() == 1L) // (1,2)
    val since = TxTable.snapshot(srcDir).version

    // Delta doc 4 is a near-dup of 1 AND 2; doc 1 is erased in the
    // same range. The mined candidates include (1,4) — groups still
    // hold doc 1 — but the verify join reads docs through the mask,
    // so only (2,4) may be stored.
    TxTable.append(spark, srcDir,
      Seq((4L, Seq("a", "b", "c", "f"))).toDF("doc_id", "shs"))
    TxTable.deleteKeysDeferred(srcDir, "doc_id", Seq(1L))

    val q = CdcSync.docsToDedup(spark, srcDir, indexDir, ckpt, since, cap = 10)
    try q.processAllAvailable() finally q.stop()

    val docs = TxTable.read(spark, s"$indexDir/docs")
    assert(docs.filter(col("doc_id") === 1L).isEmpty, "erased doc still served")
    assert(docs.filter(col("doc_id") === 4L).count() == 1L, "delta doc missing")
    val pairs = DedupIndex.pairs(spark, indexDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 4L)),
      s"pairs after erasure should be exactly (2,4), got $pairs")
    val comps = DedupIndex.components(spark, indexDir)
    assert(comps.filter(col("doc_id") === 1L).isEmpty,
      "erased doc still in components")
    val compOf = comps.filter(col("doc_id").isin(2L, 4L))
      .select("component").distinct().collect()
    assert(compOf.length == 1, "docs 2 and 4 should share one component")
    // Replay with a FRESH checkpoint (same sinceVersion): every row's
    // _commit_version is ≤ the sealed covers high-water, so the batch
    // filters to empty — nothing moves, mechanically.
    val vDocs = TxTable.snapshot(s"$indexDir/docs").version
    val q2 = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_dck2"), since, cap = 10)
    try q2.processAllAvailable() finally q2.stop()
    assert(TxTable.snapshot(s"$indexDir/docs").version == vDocs,
      "a replayed docs batch re-landed instead of no-opping")
    // RE-ADMISSION after primary folds. Doc 1 comes back in its own
    // range (cross-batch: the index's STANDING tombstone from the
    // earlier erasure must fold at the collision); doc 3's erase +
    // fold + re-append land in ONE range (in-batch: the batch's own
    // delete must not swallow its insert — delivered inserts are live
    // at the primary at batch-end).
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir,
      Seq((1L, Seq("a", "b", "c", "d"))).toDF("doc_id", "shs"))
    TxTable.deleteKeysDeferred(srcDir, "doc_id", Seq(3L))
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir,
      Seq((3L, Seq("x", "y", "z", "w"))).toDF("doc_id", "shs"))
    val q3 = CdcSync.docsToDedup(spark, srcDir, indexDir, ckpt, since, cap = 10)
    try q3.processAllAvailable() finally q3.stop()
    val docs2 = TxTable.read(spark, s"$indexDir/docs")
    assert(docs2.filter(col("doc_id") === 1L).count() == 1L,
      "re-admitted doc 1 suppressed by the index's standing mask")
    assert(docs2.filter(col("doc_id") === 3L).count() == 1L,
      "an in-batch delete swallowed re-admitted doc 3")
    val pairs2 = DedupIndex.pairs(spark, indexDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"re-admitted doc should re-pair with its near-dups, got $pairs2")
  }

  test("a between-claims crash replays into a LOUD failure, never a silent skip") {
    // The r15-advisory medium, hardened per the r16 advisory: the crash
    // signature must survive a RE-SEED. DedupIndex.append claims docs
    // first and groups last, stamping the covers high-water on BOTH —
    // docs' covers ahead of groups' is the crash window, readable by
    // ANY consumer (the old appId-scoped stamp went blind when the
    // consumer re-seeded with a fresh checkpoint: crashed=false,
    // all-live probe ⇒ silent skip, groups/pairs/components lost
    // forever). Fabricate the exact on-disk state a crashed consumer
    // append leaves — docs claim with watermark + covers, groups
    // unclaimed — then detect it from a FRESH checkpoint.
    val srcDir = tmp("graft_cdc_crash_src")
    val indexDir = tmp("graft_cdc_crash_idx")
    val ckpt = tmp("graft_cdc_crash_ck") // the CRASHED consumer's appId
    val initial = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e"))).toDF("doc_id", "shs")
    TxTable.init(spark, srcDir, initial.schema)
    TxTable.append(spark, srcDir, initial)
    DedupIndex.build(spark, TxTable.read(spark, srcDir), indexDir, cap = 10)
    val since = TxTable.snapshot(srcDir).version
    val delta = Seq((4L, Seq("a", "b", "c", "f"))).toDF("doc_id", "shs")
    TxTable.append(spark, srcDir, delta)
    val vDelta = TxTable.snapshot(srcDir).version
    // The crashed append's half: docs claim + watermark + covers,
    // groups unclaimed (exactly what docsToDedup's append commits
    // before the crash point).
    val uDocs = TxTable.stage(s"$indexDir/docs", delta)
    TxTable.commitStaged(spark, s"$indexDir/docs", uDocs, delta.schema,
      keepExisting = true,
      txnUpdate = Map(ckpt -> 0L, CdcSync.CoversKey -> vDelta))
    assert(DedupIndex.lastBatch(indexDir, ckpt).isEmpty, "setup: seal absent")

    // A RE-SEEDED consumer (fresh checkpoint ⇒ fresh appId) must still
    // detect the crash — the covers comparison is appId-free.
    val q = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_crash_ck_reseed"), since, cap = 10)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("crashed between claims")),
      s"wanted the crash-window error, got: ${msgs(e).mkString(" | ")}")
    // A consumer seeded BEYOND the crashed range also fails loudly —
    // its rows cannot witness the repair, so proceeding would clear
    // the signature over a still-half-landed range.
    TxTable.append(spark, srcDir,
      Seq((9L, Seq("m", "n", "o", "p"))).toDF("doc_id", "shs"))
    val q1b = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_crash_ck_beyond"), vDelta, cap = 10)
    val e1b = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1b.processAllAvailable() finally q1b.stop()
    }
    assert(msgs(e1b).exists(_.contains("seeded BEYOND the crashed range")),
      s"wanted the seeded-beyond error, got: ${msgs(e1b).mkString(" | ")}")
    // And the recorded repair works: erase the batch's ids, restart —
    // the re-ingest's collision fold rebuilds the half-landed state
    // and the sealing append clears the signature in the same commit.
    DedupIndex.deleteDocsDeferred(indexDir, Seq(4L))
    val q2 = CdcSync.docsToDedup(spark, srcDir, indexDir, ckpt, since, cap = 10)
    try q2.processAllAvailable() finally q2.stop()
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 4L).count() == 1L, "repair did not land the doc")
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 9L).count() == 1L, "post-crash doc missing")
    val pairs = DedupIndex.pairs(spark, indexDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"repair left the mined pairs incomplete: $pairs")
    assert(DedupIndex.lastBatch(indexDir, ckpt).contains(0L),
      "repair must seal the batch")
    assert(TxTable.txnVersion(s"$indexDir/docs", CdcSync.CoversKey) ==
      TxTable.txnVersion(s"$indexDir/groups", CdcSync.CoversKey),
      "the sealing append must clear the crash signature (covers equal)")
  }

  test("a re-seeded replay of a landed range skips BEFORE its deletes re-mask live keys") {
    // The r15-advisory low: deletes-first made a bad replay DESTRUCTIVE
    // before it failed — a re-seeded consumer (fresh checkpoint ⇒ fresh
    // appId) re-applied a landed range's deletes, re-masking a
    // currently-live re-admitted key. Now mechanical: the first
    // consumer sealed the covers high-water, so every replayed row
    // (the delete included) filters out by version — ZERO mutation,
    // no liveness consulted.
    val srcDir = tmp("graft_cdc_reseed_src")
    val indexDir = tmp("graft_cdc_reseed_idx")
    val initial = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),
      (3L, Seq("x", "y", "z", "w"))).toDF("doc_id", "shs")
    TxTable.init(spark, srcDir, initial.schema)
    TxTable.append(spark, srcDir, initial)
    DedupIndex.build(spark, TxTable.read(spark, srcDir), indexDir, cap = 10)
    val since = TxTable.snapshot(srcDir).version
    // History: new doc 4, erase 1, then the primary folds + re-admits 1.
    TxTable.append(spark, srcDir,
      Seq((4L, Seq("a", "b", "c", "f"))).toDF("doc_id", "shs"))
    TxTable.deleteKeysDeferred(srcDir, "doc_id", Seq(1L))
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir,
      Seq((1L, Seq("a", "b", "c", "d"))).toDF("doc_id", "shs"))
    val q = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_reseed_ck1"), since, cap = 10)
    try q.processAllAvailable() finally q.stop()
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 1L).count() == 1L, "setup: 1 re-admitted")
    assert(TxTable.snapshot(s"$indexDir/docs").dkeys.isEmpty,
      "setup: the collision fold cleared the mask")
    val versions = Seq("docs", "groups", "pairs", "components")
      .map(t => TxTable.snapshot(s"$indexDir/$t").version)
    // Re-seed: fresh checkpoint, same since — the replayed batch holds
    // delete(1) + inserts {4, 1}, every row ≤ the sealed covers
    // high-water. The version filter empties the batch; pre-fix,
    // delete(1) re-applied FIRST would re-mask the live re-admitted
    // doc.
    val q2 = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_reseed_ck2"), since, cap = 10)
    try q2.processAllAvailable() finally q2.stop()
    assert(TxTable.snapshot(s"$indexDir/docs").dkeys.isEmpty,
      "the re-seeded replay re-masked a live re-admitted key")
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 1L).count() == 1L,
      "the re-admitted doc went dark under the re-seeded replay")
    assert(Seq("docs", "groups", "pairs", "components")
      .map(t => TxTable.snapshot(s"$indexDir/$t").version) == versions,
      "a fully-landed replayed range mutated the index")
  }

  test("a re-seeded consumer replays a DELETE-ONLY batch with zero spurious masks") {
    // The r16 caveat, closed mechanically: a replayed delete-only batch
    // used to carry no liveness evidence, so a re-seeded consumer
    // re-applied it and masked the re-admitted key MID-REPLAY. Now the
    // re-admitting append sealed a covers high-water PAST the delete's
    // commit version, so the replayed delete filters out by version
    // arithmetic — no instruction to "re-seed from the build version"
    // needed. Paced one commit per batch so the delete-only range
    // really replays as its own batch.
    val srcDir = tmp("graft_cdc_delonly_src")
    val indexDir = tmp("graft_cdc_delonly_idx")
    val initial = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),
      (3L, Seq("x", "y", "z", "w"))).toDF("doc_id", "shs")
    TxTable.init(spark, srcDir, initial.schema)
    TxTable.append(spark, srcDir, initial)
    DedupIndex.build(spark, TxTable.read(spark, srcDir), indexDir, cap = 10)
    val since = TxTable.snapshot(srcDir).version
    // History: insert 4 | delete-only(1) | fold + re-admit 1.
    TxTable.append(spark, srcDir,
      Seq((4L, Seq("a", "b", "c", "f"))).toDF("doc_id", "shs"))
    TxTable.deleteKeysDeferred(srcDir, "doc_id", Seq(1L))
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir,
      Seq((1L, Seq("a", "b", "c", "d"))).toDF("doc_id", "shs"))
    val q = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_delonly_ck1"), since, cap = 10,
      maxCommitsPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 1L).count() == 1L, "setup: 1 re-admitted")
    val tables = Seq("docs", "groups", "pairs", "components")
    assert(tables.forall(t =>
      TxTable.snapshot(s"$indexDir/$t").dkeys.isEmpty),
      "setup: the collision fold cleared every mask")
    val versions = tables.map(t => TxTable.snapshot(s"$indexDir/$t").version)
    // Re-seed (fresh checkpoint, same since), paced: the delete-only
    // commit replays AS ITS OWN BATCH. Pre-fix it re-applied and doc 1
    // went dark until the next batch; now it filters to empty.
    val q2 = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_delonly_ck2"), since, cap = 10,
      maxCommitsPerTrigger = Some(1))
    try q2.processAllAvailable() finally q2.stop()
    assert(tables.forall(t =>
      TxTable.snapshot(s"$indexDir/$t").dkeys.isEmpty),
      "the replayed delete-only batch re-masked a re-admitted key")
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 1L).count() == 1L,
      "the re-admitted doc went dark under the re-seeded replay")
    assert(tables.map(t => TxTable.snapshot(s"$indexDir/$t").version) == versions,
      "a fully-covered replay mutated the index")
  }

  test("batch-boundary drift fails loudly BEFORE any delete lands") {
    // Partial presence = drift: some probed insert ids live, some not.
    // The failure must fire before the batch's deletes mutate the index
    // (pre-fix ordering applied them first).
    val srcDir = tmp("graft_cdc_drift_src")
    val indexDir = tmp("graft_cdc_drift_idx")
    val initial = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e"))).toDF("doc_id", "shs")
    TxTable.init(spark, srcDir, initial.schema)
    TxTable.append(spark, srcDir, initial)
    val since = TxTable.snapshot(srcDir).version
    TxTable.append(spark, srcDir,
      Seq((4L, Seq("a", "b", "c", "f"))).toDF("doc_id", "shs"))
    // Index built AFTER doc 4 landed at the source: a consumer seeded
    // at `since` replays a range whose insert set is PARTIALLY present
    // (4 yes, 9 no) and whose delete (2) must never apply.
    DedupIndex.build(spark, TxTable.read(spark, srcDir), indexDir, cap = 10)
    TxTable.append(spark, srcDir,
      Seq((9L, Seq("m", "n", "o", "p"))).toDF("doc_id", "shs"))
    TxTable.deleteKeysDeferred(srcDir, "doc_id", Seq(2L))
    val q = CdcSync.docsToDedup(spark, srcDir, indexDir,
      tmp("graft_cdc_drift_ck"), since, cap = 10)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("PARTIALLY present")),
      s"wanted the drift error, got: ${msgs(e).mkString(" | ")}")
    assert(TxTable.snapshot(s"$indexDir/docs").dkeys.isEmpty,
      "the drifted batch's delete landed before the loud failure")
    assert(TxTable.read(spark, s"$indexDir/docs")
      .filter(col("doc_id") === 2L).count() == 1L,
      "doc 2 was erased by a batch that never completed")
  }

  test("the mirror's collision fold is KEY-SCOPED: unrelated standing masks carry") {
    // r15 verdict queue #3: one re-admitted key must not pay a physical
    // fold of the mirror's ENTIRE standing mask. Three keys erased; the
    // primary re-admits only one — after the batch, the OTHER two keys'
    // tombstones must still be standing (deferred, unfolded) while the
    // colliding key's fold made its rows physical and the re-insert
    // serves.
    val srcDir = tmp("graft_cdc_scoped_src")
    val dstDir = tmp("graft_cdc_scoped_dst") + "/mirror"
    val ckpt = tmp("graft_cdc_scoped_ck")
    val init = (1L to 6L).map(k => (k, k * 10L)).toDF("k", "v")
    TxTable.init(spark, srcDir, init.schema, bloomCols = Seq("k"))
    TxTable.append(spark, srcDir, init)
    val q = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q.processAllAvailable() finally q.stop()
    TxTable.deleteKeysDeferred(srcDir, "k", Seq(2L, 3L, 4L))
    val q2 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q2.processAllAvailable() finally q2.stop()
    assert(TxTable.snapshot(dstDir).dkeys.getOrElse("k", Nil).toSet ==
      Set("2", "3", "4"), "setup: three standing mirror masks")
    // Primary folds and re-admits ONLY key 3.
    TxTable.foldDeletes(spark, srcDir)
    TxTable.append(spark, srcDir, Seq((3L, 31L)).toDF("k", "v"))
    val q3 = CdcSync.mirrorTable(spark, srcDir, dstDir, ckpt, keyCols = Seq("k"))
    try q3.processAllAvailable() finally q3.stop()
    assert(TxTable.snapshot(dstDir).dkeys.getOrElse("k", Nil).toSet ==
      Set("2", "4"),
      s"scoped fold should clear ONLY key 3: ${TxTable.snapshot(dstDir).dkeys}")
    def rows(d: String) = TxTable.read(spark, d).orderBy("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(dstDir) == Seq((1L, 10L), (3L, 31L), (5L, 50L), (6L, 60L)),
      s"mirror diverged: ${rows(dstDir)}")
    assert(rows(dstDir) == rows(srcDir))
    // The still-standing masks stay effective: a later fold of the
    // mirror makes them physical with no resurrection.
    TxTable.foldDeletes(spark, dstDir)
    assert(rows(dstDir) == Seq((1L, 10L), (3L, 31L), (5L, 50L), (6L, 60L)))
  }
}
