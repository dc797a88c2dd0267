package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{DedupIndex, PQIndexTx}
import graft.sources.TxTable

/** CHANGE-FEED CONSUMERS: wire a TxTable's change feed — additions AND
  * deletions — into the engine's serving indexes, closing the CDC loop
  * the plain stream leaves open (a tombstone commit adds no data dir,
  * so a downstream index fed additions-only never learns about
  * erasures; reference parity: the webapp's MySQL/Mongo/Neo4j stores
  * see deletes implicitly because every query re-reads the primary
  * store — a lake-scale serving index is a MATERIALIZATION and must be
  * told).
  *
  * Both consumers read `format("graft-txtable")` with
  * `readChangeFeed=true` (the Delta-CDF-shaped `_change_type` column)
  * and apply, per micro-batch, DELETES first and inserts second: a
  * delivered insert is LIVE at the primary at batch-end (the feed
  * masks appended rows by the end snapshot's tombstones and fold
  * position), so a batch's deletes must never swallow its inserts —
  * with the reverse order, a primary-side erase + fold + re-add of the
  * same key inside one range left the re-added row masked forever.
  * Exactly-once is a WHOLE-batch seal: the insert append commits the
  * (appId, batchId) watermark on the index's LAST claim, and a batch
  * whose watermark is recorded is skipped in full — deletes included,
  * since they ran before the append in the original run and
  * re-applying them would re-mask what the run's collision fold
  * re-admitted.
  */
object CdcSync {

  /** The change-feed column the consumers dispatch on. */
  val ChangeTypeCol = "_change_type"

  /** Stream `srcDir` (a TxTable of (vec_id, e)) into a [[PQIndexTx]]
    * serving index: GDPR erasure (or any keyed delete) on the source
    * table flows to the ANN index as FAISS-`remove_ids`-shaped
    * tombstones; appended vectors encode with the stored quantizers.
    * The index must exist ([[PQIndexTx.buildIVF]] trains it); pass the
    * source version the index was built FROM as `sinceVersion` so the
    * feed replays only post-build changes (the build already holds the
    * snapshot). Returns the started query — caller owns its lifecycle
    * (`processAllAvailable`/`stop` for a drain, or leave it running). */
  def vectorsToAnn(spark: SparkSession, srcDir: String, indexDir: String,
                   checkpointDir: String, sinceVersion: Long, dsub: Int,
                   nq: Int = 0, files: Int = 1): StreamingQuery = {
    val appId = checkpointDir // unique per query, stable across restarts
    spark.readStream.format("graft-txtable")
      .option("readChangeFeed", "true")
      .option("startingVersion", sinceVersion.toString)
      .load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // WHOLE-BATCH replay guard: the append's watermark commits
        // LAST, so a recorded batch proves its deletes ran too —
        // re-applying just the delete half would re-mask the very ids
        // the original run's collision fold re-admitted.
        if (!PQIndexTx.lastBatch(indexDir, appId).exists(_ >= batchId)) {
          // DELETES FIRST: a delivered insert is LIVE at the primary
          // at batch-end (the feed masks by the end snapshot's
          // tombstones), so this batch's deletes must never swallow
          // it. With the old insert-then-delete order, a primary-side
          // erase + fold + re-add inside one range re-masked the
          // freshly appended vector forever.
          val delIds = batch.filter(col(ChangeTypeCol) === "delete")
            .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
          if (delIds.nonEmpty) PQIndexTx.deleteIdsDeferred(indexDir, delIds)
          val inserts = batch.filter(col(ChangeTypeCol) === "insert")
            .select(col("vec_id"), col("e"))
          // Empty-insert batches (delete-only ranges) skip the append
          // entirely: an empty watermark commit per delete batch would
          // fragment the codes table for nothing, and the deletes
          // above are idempotent on replay (no inserts → no collision
          // fold to race).
          if (!inserts.isEmpty)
            PQIndexTx.appendIVFIfNew(spark, inserts, indexDir, dsub = dsub,
              appId = appId, batchId = batchId, nq = nq, files = files)
        }
        ()
      }
      .start()
  }

  /** [[vectorsToAnn]]'s text twin: stream `srcDir` (a TxTable of
    * (doc_id, shs)) into a [[DedupIndex]] — appended documents ingest
    * via the incremental mine, erased doc_ids tombstone across the
    * index's serving tables ([[DedupIndex.deleteDocsDeferred]]).
    * Replay guard: [[DedupIndex.append]] REFUSES duplicate doc_ids (by
    * design — a silent double-insert corrupts downstream counts), so a
    * replayed batch is detected by a manifest-planned presence probe
    * and skipped; a PARTIALLY-present batch is a real corruption and
    * fails loudly. */
  def docsToDedup(spark: SparkSession, srcDir: String, indexDir: String,
                  checkpointDir: String, sinceVersion: Long,
                  cap: Int): StreamingQuery = {
    val appId = checkpointDir
    spark.readStream.format("graft-txtable")
      .option("readChangeFeed", "true")
      .option("startingVersion", sinceVersion.toString)
      .load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // WHOLE-BATCH replay guard (same shape as vectorsToAnn): the
        // append's txn watermark rides the index's LAST claim, so a
        // recorded batch proves deletes AND the four-table append all
        // landed; replaying just the delete half would re-mask a
        // re-added id the original run's collision fold re-admitted.
        // The old presence-probe guard could not seal a batch whose
        // delete and re-insert share an id: probed BEFORE the delete
        // is applied, the OLD row's liveness is indistinguishable from
        // the new row's.
        if (!DedupIndex.lastBatch(indexDir, appId).exists(_ >= batchId)) {
          // DELETES FIRST — delivered inserts are live at the primary
          // at batch-end and must survive this batch's deletes.
          val delIds = batch.filter(col(ChangeTypeCol) === "delete")
            .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
          if (delIds.nonEmpty) DedupIndex.deleteDocsDeferred(indexDir, delIds)
          val inserts = batch.filter(col(ChangeTypeCol) === "insert")
            .select(col("doc_id"), col("shs"))
          applyDocInserts(spark, inserts, indexDir, cap, appId, batchId)
        }
        ()
      }
      .start()
  }

  /** Replicate `srcDir` into a MIRROR TxTable at `dstDir`, erasures
    * included — the generic materialized-replica shape (cross-region
    * copy, downstream cleanroom, a serving mirror the primary's GDPR
    * obligations must reach). Per batch the order is DELETES, then a
    * COLLISION FOLD when an incoming insert carries a currently-masked
    * key (the primary re-admitted a once-erased key after folding its
    * own tombstones — the mirror's value-keyed mask would otherwise
    * suppress that key's every future event forever), then inserts via
    * the exactly-once idempotent append; the insert watermark commits
    * last, so it seals the whole sequence and a replayed batch whose
    * watermark is already committed is skipped in full (replaying just
    * the delete half after a collision fold would re-erase rows the
    * original run correctly appended). `keyCols`
    * names the columns erasures may arrive on — each BIGINT or STRING,
    * the tombstone key shapes; a delete row carrying NONE of them
    * fails the batch loudly (silently dropping it would diverge the
    * mirror from the primary's erasures). The mirror auto-inits from
    * the stream's schema (the source's bloom registration) on first
    * batch; `sinceVersion < 0` bootstraps from the full snapshot
    * (`earliest`), otherwise the feed starts strictly after that
    * source version.
    *
    * SCHEMA EVOLUTION: an additive widen on the source fails the
    * running stream loudly (the source pinned its schema at start);
    * restarting the SAME mirrorTable call re-pins the widened schema,
    * replays pre-widening ranges null-padded, and the mirror widens
    * through the append path's additive evolution. A tombstone on a
    * column the mirror has not yet seen is a proven no-op (no mirror
    * row carries the column) and is skipped, not dropped silently. */
  def mirrorTable(spark: SparkSession, srcDir: String, dstDir: String,
                  checkpointDir: String, keyCols: Seq[String],
                  sinceVersion: Long = -1L): StreamingQuery = {
    val appId = checkpointDir
    val starting = if (sinceVersion < 0) "earliest" else sinceVersion.toString
    spark.readStream.format("graft-txtable")
      .option("readChangeFeed", "true")
      .option("startingVersion", starting)
      .load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val inserts = batch.filter(col(ChangeTypeCol) === "insert")
          .drop(ChangeTypeCol)
        // Init from the BATCH schema (the stream's pinned schema), not
        // the source head: a widen landing between stream start and the
        // first batch would otherwise init the mirror wider than every
        // batch this stream can deliver, failing the append-side schema
        // check until a restart. The mirror then widens exactly as the
        // restarted stream's batches do.
        if (!TxTable.exists(dstDir))
          TxTable.init(spark, dstDir, inserts.schema,
            bloomCols = TxTable.snapshot(srcDir).bloomCols)
        // WHOLE-BATCH replay guard, checked before ANY application: the
        // insert watermark commits LAST below, so a committed watermark
        // proves the full sequence (deletes, any fold, append) landed.
        // Replaying just the delete half after a collision fold would
        // re-mask and then re-erase rows the original run correctly
        // appended — the one interleaving idempotence alone can't save.
        if (!TxTable.snapshot(dstDir).txns.get(appId).exists(_ >= batchId)) {
          val schema = inserts.schema
          // DELETES FIRST. The feed's insert half delivers only rows
          // LIVE at the primary at batch-end (readChanges masks by the
          // end snapshot's tombstones plus later-fold position), so a
          // delivered insert must never be swallowed by this batch's —
          // or any earlier batch's — delete of the same key. Delete
          // rows carry exactly one non-null column: the tombstoned key.
          // keyCols declares which columns erasures may arrive on — one
          // driver-side collect routes each row to its column's pass
          // (micro-batch bounded, like the index consumers' id sets).
          val present = keyCols.filter(schema.fieldNames.contains)
          val delRows = batch.filter(col(ChangeTypeCol) === "delete")
            .select(present.map(c => col(c)): _*).collect()
          if (delRows.nonEmpty) {
            // FAIL-LOUD routing: a delete keyed on an undeclared column
            // matches no pass — dropping it would silently diverge the
            // mirror from the primary's erasures (a GDPR copy that keeps
            // what the source deleted). Surface the misconfiguration.
            val unrouted = delRows.count(r => present.indices.forall(r.isNullAt))
            require(unrouted == 0,
              s"mirrorTable: $unrouted delete row(s) in batch $batchId carry " +
                s"no declared key column (keyCols=${keyCols.mkString(",")}) — " +
                "the erasure cannot be routed; declare its tombstone column")
            lazy val mirrorCols = org.apache.spark.sql.types.StructType
              .fromDDL(TxTable.snapshot(dstDir).schemaDdl).fieldNames.toSet
            present.zipWithIndex.foreach { case (c, i) =>
              val keyed = delRows.filter(r => !r.isNullAt(i))
              // A key column the mirror has never seen is a PROVEN no-op:
              // the mirror's schema widens only through inserts, so no
              // mirror row carries the column yet (the source widened and
              // erased before any widened insert reached this replica).
              if (keyed.nonEmpty && mirrorCols.contains(c)) {
                schema(c).dataType match {
                  case org.apache.spark.sql.types.LongType =>
                    TxTable.deleteKeysDeferred(dstDir, c,
                      keyed.toSeq.map(_.getLong(i)))
                  case _ =>
                    TxTable.deleteStringKeysDeferred(dstDir, c,
                      keyed.toSeq.map(_.getString(i)))
                }
                ()
              }
            }
          }
          // COLLISION FOLD: the mirror's deferred tombstones are
          // value-keyed — left standing, they would mask these (or any
          // later) inserts of a once-erased key FOREVER, silently
          // dropping every future event of that key even though the
          // primary folded its own tombstones and re-admitted it. When
          // an incoming insert carries a currently-masked key, the
          // primary's history proves a fold sits between that key's
          // delete and this insert (delivered inserts are live at
          // batch-end) — so mirror the fold: make the mask physical,
          // clear it, and let the append below land live. Erasure-only
          // workloads (no re-insert ever) never pay this rewrite.
          val dk = TxTable.snapshot(dstDir).dkeys
          if (dk.nonEmpty && !inserts.isEmpty) {
            val sch = org.apache.spark.sql.types.StructType
              .fromDDL(TxTable.snapshot(dstDir).schemaDdl)
            val collide = dk.exists { case (c, vals) =>
              schema.fieldNames.contains(c) && {
                val typed: Seq[Any] = sch(c).dataType match {
                  case org.apache.spark.sql.types.LongType => vals.map(_.toLong)
                  case _ => vals
                }
                !inserts.filter(col(c).isInCollection(typed)).isEmpty
              }
            }
            if (collide) { TxTable.foldDeletes(spark, dstDir); () }
          }
          // INSERTS LAST; their watermark commit seals the batch.
          if (!inserts.isEmpty)
            TxTable.appendIfNew(spark, dstDir, inserts, appId, batchId)
        }
        ()
      }
      .start()
  }

  /** Insert half of [[docsToDedup]], called AFTER the batch's deletes:
    * the presence probe (manifest-planned point lookup — Bloom absence
    * proof + stats pruning, O(hit files)) now guards batch-boundary
    * DRIFT only — any live delta id at this point is corruption, since
    * a replayed-in-full batch was already skipped by the watermark and
    * this batch's deletes have masked any legitimately re-added id.
    * The append itself folds standing masks on collision and seals the
    * batch with the (appId, batchId) watermark on its last claim. */
  private def applyDocInserts(spark: SparkSession, inserts: DataFrame,
                              indexDir: String, cap: Int,
                              appId: String, batchId: Long): Unit = {
    val ids = inserts.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    if (ids.isEmpty) return
    val present = TxTable.lookupKeys(spark, s"$indexDir/docs", "doc_id", ids)
      .count()
    // Cross-appId idempotence (a RE-SEEDED consumer replaying landed
    // ranges under a fresh checkpoint — the watermark guard upstream
    // only covers its own appId): every id live ⇒ the batch landed in
    // full, skip. A collision batch (delete+re-insert sharing an id)
    // replayed cross-appId reaches here with its re-added ids masked
    // by the re-applied deletes ⇒ partial ⇒ the loud failure below —
    // never a silent skip that leaves the re-mask standing.
    if (present == ids.size) return
    require(present == 0L,
      s"docs CDC batch is PARTIALLY present ($present of ${ids.size} ids) — " +
        "batch boundaries drifted across a replay; re-seed the consumer")
    DedupIndex.append(spark, inserts, indexDir, cap,
      txn = Some((appId, batchId)))
    ()
  }
}
