package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Micro-batch ingest — the Spark twin of the reference's Kafka consumer
  * loop (SURVEY.md §2.9; reference streaming/consumer.py:128-179): one
  * event stream fans into fact appends, dimension upserts, a time
  * dimension extended on demand, and an incrementally maintained summary.
  *
  * All four stores are plain parquet directories maintained with the
  * MERGE emulations in [[ParquetStore]] (at deploy scale these map 1:1
  * onto Delta `MERGE` in `foreachBatch`; the update arithmetic is
  * identical). Idempotence under at-least-once delivery (ST2) comes from
  * primary-key dedup against the stored facts — the reference's
  * `INSERT IGNORE` — so replays and in-batch duplicates are no-ops.
  */
object StreamIngest {

  /** Raw event-file schema (`ts` is the INT64 nanos the driver writes). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", LongType),
    StructField("props", StringType)))

  /** Normalize raw long-nanos events to a typed stream (exact ns→µs). */
  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Start the ingest on a (streaming) event DataFrame. */
  def start(events: DataFrame, store: EventStore, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch, store) }
      .start()

  /** One micro-batch, applied to all stores (ST1). Separable from the
    * streaming query so batch backfills reuse the same code path.
    */
  def applyBatch(batch: DataFrame, store: EventStore): Unit = {
    val spark = batch.sparkSession
    // ST2: idempotence — drop in-batch duplicates, then keep only ids
    // absent from the store (the reference's INSERT IGNORE). The
    // absence probe is manifest-planned (EventStore.absentOnly:
    // per-dir event_id Blooms + stats pruning), so a typical all-new
    // batch proves itself fresh without reading any stored fact file —
    // the old shape anti-scanned the whole fact history every trigger.
    // localCheckpoint (eager) snapshots the deduped batch BEFORE any
    // store mutation: the probe reads the fact directory, and the
    // subsequent append would otherwise invalidate/recache that plan —
    // a lazily-evaluated `fresh` would then see its own rows in the
    // store and silently empty the summary delta (read-modify-write
    // hazard; plain persist() does NOT protect against path recache).
    val fresh = store.absentOnly("fact_events",
        batch.dropDuplicates("event_id"), "event_id")
      .localCheckpoint()
    try {
      if (fresh.isEmpty) return
      // S3: append new facts (partition-batched by Spark).
      store.appendFacts(fresh)
      // ST6: dimension upsert, first-writer-wins (INSERT IGNORE twin).
      store.insertIfAbsent("dim_user", fresh
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_seen")), "user_id")
      // ST4: extend the time dimension with unseen dates, attributes
      // derived from the event's own timestamp (reference
      // streaming/consumer.py:363-397).
      store.insertIfAbsent("dim_time", fresh
        .select(to_date(col("ts")).as("date_actual")).distinct()
        .select(col("date_actual"),
          year(col("date_actual")).as("year_actual"),
          quarter(col("date_actual")).as("quarter_actual"),
          month(col("date_actual")).as("month_actual"),
          dayofweek(col("date_actual")).as("dow_actual")), "date_actual")
      // ST5/A21: incremental summary — arithmetic merge of this batch's
      // per-user delta into the running totals. Exact math (sums/counts
      // compose associatively; no running-average drift — divergence from
      // the reference's seeded average documented in SURVEY.md §7.4.3).
      // The PRUNED merge is the default here: this foreachBatch loop is
      // the table's single writer (the pruned plan's contract), a
      // micro-batch's key set is delta-bounded, and each replace
      // rewrites only the files the batch's users touch while carrying
      // the rest by reference — O(delta) I/O per trigger where the
      // full-rewrite merge pays O(table). On a lost race it falls back
      // to the contention-safe retrying merge itself.
      store.mergeSummaryPruned(fresh.groupBy(col("user_id")).agg(
        count(lit(1)).as("event_cnt"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"),
        max(col("ts")).as("last_ts")))
      // Retention: every derived-table merge above committed a new
      // version whose predecessor is now superseded — without cleanup a
      // week of 10-second batches holds every historical summary on
      // disk. Vacuum with a multi-version window (concurrent readers
      // resolve at most a few commits behind this single writer) and
      // the default orphan retention (never reclaims a possibly
      // in-flight commit's data). Manifest listings are tiny; this is
      // the bounded, per-batch cost Delta pays in its log checkpoint.
      store.vacuum(keepLast = VacuumKeepVersions)
    } finally fresh.unpersist()
  }

  /** Versions retained per table at each batch vacuum: a pinned reader
    * older than this many commits behind the stream breaks on its next
    * scan (the documented Delta-style time-travel limit). */
  val VacuumKeepVersions = 8
}
