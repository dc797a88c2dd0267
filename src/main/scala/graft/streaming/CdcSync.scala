package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
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
    *
    * Replay/crash discipline, checked IN ORDER before any mutation:
    *  1. WHOLE-batch seal — the append's txn watermark rides the
    *     index's LAST claim (groups); a recorded batch proves deletes
    *     AND the four-table append all landed, so it skips in full
    *     (replaying just the delete half would re-mask a re-added id
    *     the original run's collision fold re-admitted).
    *  2. Between-claims CRASH signature — the append stamps the SAME
    *     watermark on its FIRST claim (docs): docs-stamped with the
    *     groups seal absent means the original run died between
    *     claims and groups/pairs/components never landed. Fail LOUDLY
    *     (a presence probe would read the landed docs claim as "batch
    *     fully applied" and silently drop the unclaimed tables
    *     forever); the recorded repair is to erase the batch's
    *     doc_ids and restart — the re-ingest's collision fold then
    *     rebuilds the half-landed state cleanly.
    *  3. Landed-range probe, BEFORE this batch's deletes — a
    *     RE-SEEDED consumer (fresh checkpoint ⇒ fresh appId) replays
    *     ranges the index already holds: every insert id outside the
    *     batch's own delete set being live proves the batch landed
    *     under the previous appId, so it skips in full WITHOUT
    *     re-applying the deletes (deletes-first would otherwise
    *     re-mask currently-live re-admitted keys before the append's
    *     dupe check could fail the batch). A PARTIALLY-present probe
    *     set is batch-boundary drift and fails loudly — also before
    *     any delete lands. Caveat (inherent to re-seeding into a live
    *     index): a replayed DELETE-ONLY batch, and a collision batch
    *     whose every insert id is also deleted in-batch, carry no
    *     liveness evidence — they re-apply, which converges once the
    *     full history replays in order but masks re-admitted keys
    *     mid-replay; re-seed to the index's build version, not into
    *     arbitrary history. */
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
        if (!DedupIndex.lastBatch(indexDir, appId).exists(_ >= batchId)) {
          val delIds = batch.filter(col(ChangeTypeCol) === "delete")
            .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
          val inserts = batch.filter(col(ChangeTypeCol) === "insert")
            .select(col("doc_id"), col("shs"))
          val insIds = inserts.select(col("doc_id")).collect()
            .map(_.getLong(0)).toSeq
          // Liveness probe on the ids whose PRE-delete presence is
          // evidence (an id the batch also deletes is expected live
          // whether or not the batch ever ran). Manifest-planned point
          // lookup — Bloom absence proof + stats pruning, O(hit files).
          val delSet = delIds.toSet
          val probe = insIds.filterNot(delSet)
          val pre =
            if (probe.isEmpty) 0L
            else TxTable.lookupKeys(spark, s"$indexDir/docs", "doc_id", probe).count()
          // (2) crash window: THIS appId's docs claim carries the batch
          // but the groups seal above missed it — the original append
          // died between claims and groups/pairs/components never
          // landed. Skipping would lose them permanently; fail loudly
          // UNLESS the recorded repair already ran (the batch's ids
          // erased ⇒ pre == 0): then fall through and re-ingest — the
          // collision fold rebuilds the half-landed state and the seal
          // finally lands.
          val crashed =
            TxTable.txnVersion(s"$indexDir/docs", appId).exists(_ >= batchId)
          if (crashed) require(pre == 0L,
            s"docs CDC batch $batchId: the docs claim landed but the groups " +
              "watermark did not — the original append crashed between claims, " +
              "so the groups/pairs/components claims are missing and skipping " +
              "would lose them permanently. Repair: erase this batch's doc_ids " +
              "(DedupIndex.deleteDocsDeferred) and restart this consumer; the " +
              "re-ingest's collision fold rebuilds the half-landed state.")
          // (3) landed-range skip, BEFORE this batch's deletes: every
          // probed id live under a SEALED-elsewhere history (no crash
          // signature) proves the batch landed under a previous appId.
          val landedElsewhere = !crashed && probe.nonEmpty && pre == probe.size
          if (!crashed && !landedElsewhere) require(pre == 0L,
            s"docs CDC batch $batchId is PARTIALLY present ($pre of " +
              s"${probe.size} probed ids) — batch boundaries drifted across " +
              "a replay; re-seed the consumer from the index's build version")
          if (!landedElsewhere) {
            // DELETES FIRST — delivered inserts are live at the primary
            // at batch-end and must survive this batch's deletes.
            if (delIds.nonEmpty) DedupIndex.deleteDocsDeferred(indexDir, delIds)
            // The append folds standing masks on collision and seals
            // the batch with the (appId, batchId) watermark riding its
            // docs (first) and groups (last) claims.
            if (insIds.nonEmpty) {
              DedupIndex.append(spark, inserts, indexDir, cap,
                txn = Some((appId, batchId)))
              ()
            }
          }
        }
        ()
      }
      .start()
  }

  /** Replicate `srcDir` into a MIRROR TxTable at `dstDir`, erasures
    * included — the generic materialized-replica shape (cross-region
    * copy, downstream cleanroom, a serving mirror the primary's GDPR
    * obligations must reach). Per batch the order is DELETES, then a
    * KEY-SCOPED COLLISION FOLD of exactly the colliding keys when an
    * incoming insert carries a currently-masked key (the primary
    * re-admitted a once-erased key after folding its own tombstones —
    * the mirror's value-keyed mask would otherwise suppress that key's
    * every future event forever; scoping keeps the rewrite O(that
    * key's hit files), the rest of the standing mask carries), then
    * inserts via
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
          // COLLISION FOLD, KEY-SCOPED: the mirror's deferred
          // tombstones are value-keyed — left standing, they would mask
          // these (or any later) inserts of a once-erased key FOREVER,
          // silently dropping every future event of that key even
          // though the primary folded its own tombstones and
          // re-admitted it. When an incoming insert carries a
          // currently-masked key, the primary's history proves a fold
          // sits between that key's delete and this insert (delivered
          // inserts are live at batch-end) — so mirror the fold FOR
          // EXACTLY THE COLLIDING KEYS (TxTable.foldDeletesFor): one
          // re-admitted key rewrites only that key's hit files, not the
          // entire standing mask's (a GDPR mirror can carry tens of
          // thousands of unrelated tombstones — re-folding them all
          // physical per colliding insert would make every
          // re-admission pay the whole mask's I/O). Non-colliding
          // masks stand and fold on their own schedule. Erasure-only
          // workloads (no re-insert ever) never pay any rewrite.
          val dk = TxTable.snapshot(dstDir).dkeys
          if (dk.nonEmpty && !inserts.isEmpty) {
            val sch = org.apache.spark.sql.types.StructType
              .fromDDL(TxTable.snapshot(dstDir).schemaDdl)
            val colliding: Map[String, Seq[String]] = dk.flatMap {
              case (c, vals) if schema.fieldNames.contains(c) =>
                val isLong = sch(c).dataType ==
                  org.apache.spark.sql.types.LongType
                val typed: Seq[Any] =
                  if (isLong) vals.map(_.toLong) else vals
                // The masked values this batch actually re-inserts —
                // micro-batch-bounded (≤ batch distinct keys ∩ mask).
                val hit = inserts.select(col(c))
                  .filter(col(c).isInCollection(typed)).distinct()
                  .collect().map(r => String.valueOf(r.get(0))).toSeq
                if (hit.isEmpty) None else Some(c -> hit)
              case _ => None
            }
            if (colliding.nonEmpty) {
              TxTable.foldDeletesFor(spark, dstDir, colliding)
              ()
            }
          }
          // INSERTS LAST; their watermark commit seals the batch.
          if (!inserts.isEmpty)
            TxTable.appendIfNew(spark, dstDir, inserts, appId, batchId)
        }
        ()
      }
      .start()
  }

}
