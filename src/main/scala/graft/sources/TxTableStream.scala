package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[TxTable]] commit log — Delta's
  * "stream a table" shape (DeltaSource) reduced to the append-only case
  * this engine's change reads support. The reference's streaming
  * pipeline tails a Kafka topic (streaming/consumer.py); the engine's
  * transactional twin lets any TxTable BE the topic: offsets are commit
  * VERSIONS, a micro-batch reads exactly the new commits' data
  * directories ([[TxTable.readChanges]] — no re-scan of the table, no
  * per-file listing), and the atomic-claim commit protocol makes a
  * version either fully visible to the stream or not at all.
  *
  *   spark.readStream.format("graft-txtable").load(dir)
  *
  * Options:
  *   - `startingVersion` (default `earliest`): `earliest` delivers the
  *     table's FULL SNAPSHOT as the first batch, then increments —
  *     Delta's default for streaming an existing table; `latest` streams
  *     only commits after the query first starts (the resolved base
  *     version is persisted in the checkpoint's source-metadata dir, so
  *     a restart resumes from the SAME base — the Kafka source persists
  *     its initial offsets the same way); an integer N streams commits
  *     strictly after version N.
  *   - `maxCommitsPerTrigger`: admission control — at most this many
  *     commits per micro-batch (the snapshot batch counts as one).
  *   - `readChangeFeed` (default false): Delta CDF's shape — every row
  *     carries a `_change_type` column; appended rows arrive as
  *     `insert` and the range's NEW tombstones
  *     ([[TxTable.deletedKeysBetween]]) as `delete` rows holding ONLY
  *     the tombstoned key column (the engine deletes by key, not row
  *     position, so the key IS the whole deletion record; other
  *     columns are null). This closes the deletion half of the feed: a
  *     downstream index fed by the plain stream never learns about
  *     erasures, because a tombstone commit adds no data dir. The
  *     snapshot-first batch is all `insert` (already masked). In-batch
  *     ordering: a key tombstoned at the batch's head version never
  *     flows as an insert (the head mask suppresses it), so consumers
  *     may apply inserts before deletes.
  *
  * Contract: the streamed range must be APPEND-ONLY, and
  * [[TxTable.readChanges]] CHECKS it — a rewrite/compaction inside the
  * range fails the stream loudly (Delta's default without
  * ignoreChanges) instead of silently re-delivering rewritten rows.
  * Exactly-once follows from the engine's offset log plus
  * readChanges' gap-free `(since, to]` tiling. */
class TxTableStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-txtable"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-txtable requires a table directory: .load(dir) or option(\"path\", dir)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val base = StructType.fromDDL(TxTable.snapshot(dirOf(parameters)).schemaDdl)
    val table =
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        TxTableSource.cdfSchema(base)
      else base
    // The table's manifest OWNS the schema (as for Delta): a
    // user-specified one either matches (redundant, accepted) or is a
    // silent projection/widening trap — rejected, not half-honored.
    schema.foreach { s =>
      require(s.map(f => (f.name, f.dataType.catalogString))
          == table.map(f => (f.name, f.dataType.catalogString)),
        s"graft-txtable reads the table's own schema ($table); the " +
          s"supplied schema ($s) differs — drop .schema(...) from the reader")
    }
    (shortName(), table)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    val maxCommits = parameters.get("maxCommitsPerTrigger").map(_.toInt)
    maxCommits.foreach(n => require(n >= 1,
      s"maxCommitsPerTrigger must be >= 1, got $n — omit the option for " +
        "unpaced (all available commits per batch)"))
    val starting = parameters.getOrElse("startingVersion", "earliest")
    new TxTableSource(
      sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      dir, metadataPath, starting, maxCommits,
      cdf = parameters.get("readChangeFeed").exists(_.toBoolean))
  }

  /** EXACTLY-ONCE streaming SINK — DeltaSink's shape on the engine's
    * own log: `df.writeStream.format("graft-txtable").start(dir)`.
    * Each micro-batch lands via [[TxTable.appendIfNew]], which records
    * the writer's (appId, batchId) watermark IN the data's own commit,
    * so a batch replayed after a crash-between-commit-and-checkpoint
    * is detected from the manifest and skipped — no duplicates, no
    * side-channel marker files. Options:
    *   - `txnAppId`: the writer identity the watermark is keyed by;
    *     defaults to the query's `checkpointLocation` (unique per
    *     query, stable across restarts — the same default identity
    *     Spark's own file sink derives from the checkpoint).
    *   - `bloomCols` (comma-separated): registered at auto-init when
    *     the sink creates the table.
    *   - `logRetainCommits` (default 0 = trimming OFF): opt-in
    *     log-only retention — after each batch the sink trims
    *     manifests older than the newest N real commits
    *     ([[TxTable.trimLog]]), so a long-running one-commit-per-batch
    *     sink keeps `_log` bounded instead of making every snapshot's
    *     directory listing O(batches ever run). Data is untouched.
    *     OPT-IN because trimming silently deletes manifest history: a
    *     downstream graft-txtable STREAM consumer or a
    *     `startingVersion`/time-travel read more than N commits behind
    *     the head fails once its version is trimmed (Delta documents
    *     the same hazard for its log retention). Set it only when
    *     every consumer provably stays within N commits; size N above
    *     the laggiest consumer's worst backlog.
    * Output modes: Append → idempotent append; Complete → idempotent
    * whole-table replace. Update is rejected (a keyed upsert needs the
    * caller's merge semantics — use foreachBatch + TxTable.merge).
    * The table is created on first batch if absent; later batches go
    * through the append path's schema enforcement. */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-txtable sink: TxTable is not hive-partitioned; drop partitionBy " +
        "(manifest stats and blooms do the pruning work)")
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft-txtable sink supports Append and Complete, got $outputMode — " +
        "Update-mode upserts need merge semantics: use foreachBatch + TxTable.merge")
    val dir = dirOf(parameters)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-txtable sink needs a writer identity for exactly-once: set " +
          "option(\"txnAppId\", ...) or a checkpointLocation"))
    val bloomCols = parameters.get("bloomCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val logRetain = parameters.get("logRetainCommits").map(_.toInt).getOrElse(0)
    require(logRetain >= 0,
      s"logRetainCommits must be >= 0 (0 disables trimming), got $logRetain")
    new TxTableSink(
      sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      dir, appId, complete = outputMode == OutputMode.Complete(), bloomCols,
      logRetain)
  }
}

private[sources] final class TxTableSink(
    spark: org.apache.spark.sql.classic.SparkSession, dir: String,
    appId: String, complete: Boolean, bloomCols: Seq[String],
    logRetainCommits: Int = 0) extends Sink {

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    // The engine hands addBatch a STREAMING-marked frame; re-wrap its
    // planned RDD as a batch frame so the ordinary TxTable write path
    // (stage → stats/bloom harvest → atomic claim) applies unchanged.
    val batch = org.apache.spark.sql.graft.StreamingFrame.unmark(spark,
      data.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
    if (!TxTable.exists(dir))
      TxTable.init(spark, dir, batch.schema, bloomCols)
    // A `false` here is the REPLAY path: the manifest already records
    // this (appId, batchId) — the previous attempt committed before
    // the crash — and the watermark guard turned the duplicate into a
    // no-op. Nothing to do; the engine's checkpoint advances normally.
    if (complete) TxTable.overwriteIfNew(spark, dir, batch, appId, batchId)
    else TxTable.appendIfNew(spark, dir, batch, appId, batchId)
    // Log retention rides the batch cadence: one listing (the commit
    // already paid one) and usually zero deletes — but over a long run
    // it is what keeps snapshot resolution O(retention), not O(batches).
    if (logRetainCommits > 0) TxTable.trimLog(dir, logRetainCommits)
    ()
  }

  override def toString: String = s"TxTableSink[$dir]"
}

private[sources] object TxTableSource {
  /** The change-feed column (Delta CDF's name, so a consumer written
    * against either reads the same). */
  val ChangeTypeCol = "_change_type"

  /** Delta CDF's commit-attribution column: the source commit version
    * that added (or tombstoned) each row. What makes replay decisions
    * MECHANICAL for a consumer that records the versions it sealed —
    * see [[graft.streaming.CdcSync]]. */
  val CommitVersionCol = TxTable.CommitVersionCol

  /** Base table schema + `_change_type` + `_commit_version`, all
    * nullable: delete rows carry ONLY their key column (plus the two
    * feed columns), so every other field must admit null (insert rows
    * only ever widen nullability under union). */
  def cdfSchema(base: StructType): StructType =
    StructType(base.fields.map(_.copy(nullable = true)) :+
      org.apache.spark.sql.types.StructField(ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = true) :+
      org.apache.spark.sql.types.StructField(CommitVersionCol,
        org.apache.spark.sql.types.LongType, nullable = true))
}

private[sources] final class TxTableSource(
    spark: org.apache.spark.sql.classic.SparkSession, dir: String,
    metadataPath: String, startingVersion: String,
    maxCommitsPerTrigger: Option[Int], cdf: Boolean = false) extends Source {

  /** The TABLE schema this source pinned at query start (schema drift
    * fails the stream loudly below). */
  private val baseSchema: StructType =
    StructType.fromDDL(TxTable.snapshot(dir).schemaDdl)

  override val schema: StructType =
    if (cdf) TxTableSource.cdfSchema(baseSchema) else baseSchema

  /** `earliest` → snapshot-first (no base version needed: a `(None,
    * end]` batch IS the snapshot at `end`, deterministic on replay).
    * Otherwise the version strictly BEFORE the first streamed commit. */
  private val snapshotStart = startingVersion == "earliest"

  /** `latest`'s base resolves ONCE, at first query start, and persists
    * under the checkpoint — re-resolving on restart would drop every
    * commit between the original start and the restart. */
  private lazy val baseVersion: Long =
    if (snapshotStart) -1L
    else if (startingVersion != "latest") startingVersion.toLong
    else {
      // Persisted through Spark's own CheckpointFileManager — the FS
      // abstraction every built-in source uses for its checkpoint
      // metadata (rename-based atomic writes where the FS needs them),
      // so the resolved base survives on ANY checkpoint filesystem the
      // engine supports, not just local paths. The manager also parses
      // the Hadoop-style URI the engine hands us ("file:/ckpt/sources/0")
      // — raw Paths.get would mis-resolve it as a relative "file:" dir.
      val fm = org.apache.spark.sql.execution.streaming.checkpointing
        .CheckpointFileManager.create(
          new org.apache.hadoop.fs.Path(metadataPath),
          spark.sessionState.newHadoopConf())
      val f = new org.apache.hadoop.fs.Path(metadataPath, "graft-txtable-base")
      def readBase(): Long = {
        val in = fm.open(f)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
      if (fm.exists(f)) readBase()
      else {
        val base = TxTable.versions(dir).last
        fm.mkdirs(new org.apache.hadoop.fs.Path(metadataPath))
        val out = fm.createAtomic(f, overwriteIfPossible = false)
        try {
          out.write(base.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
        } catch { case scala.util.control.NonFatal(_) =>
          out.cancel() // racer won the atomic create: their base is THE base
        }
        readBase() // whoever won, the file now holds the one true base
      }
    }

  /** Pacing state: the newest version this source has OFFERED or been
    * asked to read. Correctness lives in the engine's offset log and
    * getBatch's exact `(start, end]` reads — but this cursor must never
    * fall BEHIND the engine's checkpoint: a restart resets it, and if
    * getOffset then offered a paced target below the recovered offset,
    * the engine would log it as a new batch and ask for a backwards
    * `(4, 1]` range. [[getBatch]] re-advances it (the engine replays
    * the recovered range through getBatch on restart, before the first
    * getOffset), and getOffset additionally never returns a target it
    * has not itself exceeded. */
  @volatile private var offered: Long = Long.MinValue

  override def getOffset: Option[OffsetV1] = {
    val vs = TxTable.versions(dir)
    if (vs.isEmpty) return None
    val floor = if (snapshotStart) -1L else baseVersion
    val seen = math.max(offered, floor)
    val target = maxCommitsPerTrigger match {
      case Some(n) =>
        // Version numbers may skip dead claims: pace by COMMIT COUNT,
        // not arithmetic on version numbers. The `earliest` snapshot
        // batch counts as ONE unit of admission (per the provider doc):
        // before anything is consumed the paced target is the FIRST
        // version — its batch is the full snapshot there — never n
        // commits in.
        val done = vs.count(_ <= seen)
        val step = if (snapshotStart && done == 0) 1 else n
        vs(math.min(done + step, vs.size) - 1)
      case None => vs.last
    }
    offered = math.max(offered, target)
    if (target <= floor && !snapshotStart) None else Some(LongOffset(target))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = versionOf(end)
    // Restart recovery: re-anchor the pacing cursor at the engine's
    // checkpointed offset so the next getOffset paces FORWARD from it.
    offered = math.max(offered, endV)
    // Schema drift vs the schema this source pinned at query start:
    //  - endV WIDER than pinned (an additive append landed mid-stream):
    //    fail LOUDLY with a restartable error — silently projecting the
    //    batch down would hide the new column from the consumer forever
    //    (Delta's sources fail the same way; a restart re-resolves).
    //  - endV NARROWER than pinned, additively embeddable: this is the
    //    RESTART path — the query re-pinned the widened schema and is
    //    replaying ranges from before the widening; serve those rows
    //    padded with nulls for the later columns (schema-on-read,
    //    exactly what a batch read of the old version under the new
    //    schema yields). Without this, a stream could never restart
    //    across its own schema-evolution failure.
    //  - anything else (dropped/retyped column): corrupt history, fail.
    val endDdl = TxTable.snapshotAt(dir, endV).schemaDdl
    val endSchema = StructType.fromDDL(endDdl)
    val pinnedCols = baseSchema.map(f => (f.name, f.dataType.catalogString))
    val endCols = endSchema.map(f => (f.name, f.dataType.catalogString))
    if (endCols != pinnedCols && !endCols.toSet.subsetOf(pinnedCols.toSet))
      throw new IllegalStateException(
        s"graft-txtable: $dir changed schema mid-stream (was ${baseSchema.toDDL}, " +
          s"version $endV has $endDdl) — restart the query to pick it up")
    val since: Option[Long] = start match {
      case Some(s) => Some(versionOf(s))
      case None if snapshotStart => None // snapshot batch: no delete half
      case None => Some(baseVersion)
    }
    // CDF batches deliver PER COMMIT (readChangesVersioned) so every
    // row carries its `_commit_version`; the snapshot-first batch is
    // one unit covering everything ≤ endV and tags endV. The plain
    // stream keeps the single endpoint-diff scan.
    val batch0 = (since, cdf) match {
      case (Some(s), true) =>
        TxTable.readChangesVersioned(spark, dir, s, TxTable.snapshotAt(dir, endV))
      case (Some(s), false) => TxTable.readChanges(spark, dir, s, endV)
      case (None, _) =>
        val snap = TxTable.read(spark, dir, TxTable.snapshotAt(dir, endV))
        if (cdf) snap.withColumn(TxTableSource.CommitVersionCol,
          org.apache.spark.sql.functions.lit(endV))
        else snap
    }
    val batch = padToBase(batch0)
    val out = if (!cdf) batch else cdfBatch(batch, since, endV)
    // v1 sources must hand back a frame marked streaming; the shim is
    // the only way in (see StreamingFrame).
    org.apache.spark.sql.graft.StreamingFrame.mark(spark,
      out.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
  }

  /** Pad a pre-widening batch up to the pinned table schema: existing
    * columns pass through by name, later-added ones read as typed
    * nulls (prior files have no values for them — the same rows a
    * batch read of the old version under the new schema yields). */
  private def padToBase(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // The CDF attribution column rides through the pad untouched.
    val extras = df.schema.fieldNames
      .filter(_ == TxTableSource.CommitVersionCol).toIndexedSeq
    if (df.schema.fieldNames.toSeq == baseSchema.fieldNames.toSeq ++ extras) df
    else {
      val have = df.schema.fieldNames.toSet
      df.select(baseSchema.fields.toIndexedSeq.map { f =>
        if (have(f.name)) col(s"`${f.name.replace("`", "``")}`")
        else lit(null).cast(f.dataType).as(f.name)
      } ++ extras.map(col(_)): _*)
    }
  }

  /** The change-feed form of a batch: appended rows tagged `insert`,
    * plus one `delete` row per key tombstoned in `(since, end]` —
    * holding only its key column (the engine deletes by key; there is
    * no row pre-image to deliver, and the key is the entire deletion
    * record a downstream index needs) and its tombstone commit's
    * `_commit_version`. Tombstone lists are bounded by
    * [[TxTable.MaxTombstones]], so the local-relation build is
    * driver-cheap at any scale. `batch` already carries per-row
    * commit versions (readChangesVersioned / the tagged snapshot). */
  private def cdfBatch(batch: DataFrame, since: Option[Long],
                       endV: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val out = TxTableSource.cdfSchema(baseSchema)
    val ins = batch.withColumn(TxTableSource.ChangeTypeCol, lit("insert"))
    val dels = since.map(s => TxTable.deletedKeysVersionedBetween(dir, s, endV))
      .getOrElse(Nil)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    dels.foreach { case (v, byCol) =>
      byCol.foreach { case (c, vals) =>
        val idx = baseSchema.fieldIndex(c)
        val typed: Seq[Any] = baseSchema(c).dataType match {
          case org.apache.spark.sql.types.LongType => vals.map(_.toLong)
          case _ => vals
        }
        typed.foreach { k =>
          val arr = new Array[Any](baseSchema.length + 2)
          arr(idx) = k
          arr(baseSchema.length) = "delete"
          arr(baseSchema.length + 1) = v
          rows.add(org.apache.spark.sql.Row.fromSeq(arr.toIndexedSeq))
        }
      }
    }
    // Union even when empty: the per-batch schema must stay the
    // declared (all-nullable) CDF schema, not flap with delete volume.
    // Final select pins the DECLARED column order (the engine checks
    // the batch schema against the source's).
    ins.unionByName(spark.createDataFrame(rows, out))
      .select(out.fieldNames.toIndexedSeq.map(col): _*)
  }

  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  override def stop(): Unit = ()
}
