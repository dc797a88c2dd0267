package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table store with the two upsert shapes the reference
  * uses (SURVEY.md §2.1 S4/S5): insert-if-absent (`INSERT IGNORE`) and
  * arithmetic merge (`ON DUPLICATE KEY UPDATE`). Each write goes to a
  * fresh directory and swaps in atomically-enough for a single writer
  * (write tmp → move into place), mirroring how a transactional table
  * format commits; with Delta available this entire class collapses to
  * `MERGE INTO`.
  *
  * Facts are append-only (each batch adds files); derived tables are
  * rewritten per merge — correct for dimension/summary cardinality.
  * [[mergeSummaryPruned]] is the 100 TB shape: footer-stat file pruning
  * so only the files a delta touches rewrite (what Delta MERGE executes
  * against its transaction-log stats), with byte-identical carry-over
  * of everything else.
  */
final class EventStore(root: String) {

  private def dir(name: String) = s"$root/$name"

  private def readOrEmpty(spark: SparkSession, name: String, like: DataFrame): DataFrame = {
    val p = dir(name)
    val nonEmpty = Files.exists(Paths.get(p)) && {
      val s = Files.list(Paths.get(p))
      try s.findFirst().isPresent finally s.close()
    }
    if (nonEmpty) spark.read.parquet(p) else like.limit(0)
  }

  /** Normalized fact schema (ts already µs TimestampType). */
  private val factSchema = org.apache.spark.sql.types.StructType(
    StreamIngest.rawSchema.map {
      case f if f.name == "ts" => f.copy(dataType = org.apache.spark.sql.types.TimestampType)
      case f => f
    })

  def facts(spark: SparkSession): DataFrame = {
    val p = dir("fact_events")
    if (Files.exists(Paths.get(p))) spark.read.parquet(p)
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), factSchema)
  }

  def appendFacts(df: DataFrame): Unit =
    df.write.mode("append").parquet(dir("fact_events"))

  def table(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(dir(name))

  /** S4: first-writer-wins keyed insert. */
  def insertIfAbsent(name: String, updates: DataFrame, key: String): Unit = {
    val existing = readOrEmpty(updates.sparkSession, name, updates)
    val merged = existing.unionByName(
      updates.join(existing.select(key), Seq(key), "left_anti"))
    swapIn(name, merged)
  }

  /** The ON-DUPLICATE-KEY-UPDATE arithmetic, shared by the full and the
    * file-pruned merge paths. */
  private def mergeFrames(existing: DataFrame, delta: DataFrame): DataFrame = {
    val e = existing.select(col("user_id"), col("event_cnt").as("e_cnt"),
      col("total_value").as("e_val"), col("last_ts").as("e_ts"))
    e.join(delta, Seq("user_id"), "full_outer").select(
      col("user_id"),
      (coalesce(col("e_cnt"), lit(0L)) + coalesce(col("event_cnt"), lit(0L))).as("event_cnt"),
      (coalesce(col("e_val"), lit(0).cast("decimal(18,2)")) +
        coalesce(col("total_value"), lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").as("total_value"),
      greatest(col("e_ts"), col("last_ts")).as("last_ts"))
  }

  /** S5/A21: arithmetic merge of per-user deltas into running totals. */
  def mergeSummary(delta: DataFrame): Unit =
    swapIn("summary_user", mergeFrames(
      readOrEmpty(delta.sparkSession, "summary_user", delta), delta))

  /** Lay the summary out as `files` range-clustered, in-file-sorted
    * parquet files on the merge key — the layout [[mergeSummaryPruned]]
    * prunes against (Delta/Iceberg call this OPTIMIZE ZORDER; on plain
    * parquet it is a range repartition before the commit). */
  def clusterSummary(spark: SparkSession, files: Int): Unit = {
    val cur = table(spark, "summary_user")
    swapIn("summary_user",
      cur.repartitionByRange(files, col("user_id"))
        .sortWithinPartitions(col("user_id")))
  }

  /** Per-file (min, max) of the INT64 merge key, read from the parquet
    * FOOTER — no data pages touched (the same stats Delta keeps in its
    * transaction log). `None` when the file carries no usable stats —
    * zero row groups (Spark writes a schema-only file for an empty
    * DataFrame), a missing column chunk, or all-null/absent statistics —
    * and the pruner must treat the file as a conservative HIT (rewrite
    * it) rather than crash: stats are an optimization, never a
    * correctness dependency (Delta makes the same no-stats-means-scan
    * call). */
  private def footerKeyRange(spark: SparkSession, file: java.nio.file.Path,
                             column: String): Option[(Long, Long)] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      // Strict per-block: ONE stat-less row group makes the whole file's
      // range unknown (a partial range would under-cover and wrongly
      // carry a file that holds delta keys in the stat-less block).
      val ranges = r.getFooter.getBlocks.toArray.map { b =>
        val bm = b.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
        bm.getColumns.toArray
          .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
          .find(_.getPath.toDotString == column)
          .map(_.getStatistics)
          .collect {
            case s if s != null && !s.isEmpty && s.hasNonNullValue =>
              (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
      }
      if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
      else Some((ranges.map(_.get._1).min, ranges.map(_.get._2).max))
    } finally r.close()
  }

  /** File-pruned MERGE (the shape Delta's `MERGE INTO` executes at
    * 100 TB): only summary files whose footer key range intersects the
    * delta's keys are read and rewritten; every other file is carried
    * into the new table version UNCHANGED. On a transactional format
    * the carry is a metadata entry; on plain parquet it is a file copy
    * into the tmp commit dir — same correctness, demo-scale I/O.
    *
    * Size guard: the delta's distinct key set must collect (micro-batch
    * sized); above `maxDeltaKeys` fall back to the full-rewrite merge
    * (pruning needs per-file key membership, and a huge delta touches
    * most files anyway). Returns (rewrittenFiles, totalFiles).
    */
  def mergeSummaryPruned(delta: DataFrame, maxDeltaKeys: Int = 100000): (Long, Long) = {
    val spark = delta.sparkSession
    val p = Paths.get(dir("summary_user"))
    if (!Files.exists(p)) { mergeSummary(delta); return (0L, 0L) }
    if (delta.select(col("user_id")).distinct().limit(maxDeltaKeys + 1).count() > maxDeltaKeys) {
      mergeSummary(delta)
      val n = listParquet(p).size.toLong
      return (n, n)
    }
    val keys = delta.select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val files = listParquet(p)
    val (hit, carry) = files.partition { f =>
      footerKeyRange(spark, f, "user_id") match {
        case Some((lo, hi)) =>
          // any delta key in [lo, hi]? (keys sorted — binary search)
          val i = java.util.Arrays.binarySearch(keys, lo)
          val from = if (i >= 0) i else -i - 1
          from < keys.length && keys(from) <= hi
        case None => true // no usable stats → conservative rewrite
      }
    }
    val merged =
      if (hit.isEmpty) // pure inserts: no file holds any delta key
        delta.select(
          col("user_id"), col("event_cnt"),
          col("total_value").cast("decimal(18,2)").as("total_value"), col("last_ts"))
      else mergeFrames(spark.read.parquet(hit.map(_.toString): _*), delta)
    // Manual commit: rewritten rows + byte-identical carries, then the
    // same tmp-then-move swap every store write uses.
    val tmp = Paths.get(dir("summary_user__tmp"))
    deleteRec(tmp)
    merged.write.mode("overwrite").parquet(tmp.toString)
    carry.zipWithIndex.foreach { case (f, i) =>
      Files.copy(f, tmp.resolve(s"carry-$i-${f.getFileName}"),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val target = p
    val old = Paths.get(dir("summary_user__old"))
    deleteRec(old)
    Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRec(old)
    (hit.size.toLong, files.size.toLong)
  }

  private def listParquet(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.walk(p)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
      finally s.close()
    }

  /** Small-file compaction for the append-only fact store: every
    * micro-batch append lands O(shuffle-partitions) files, and a week of
    * 10-second batches turns a 100 TB table into millions of KB-files —
    * scan planning then dominates query time. Rewrites the store into
    * ceil(bytes / targetBytes) files, range-clustered and sorted by
    * event time so ts predicates prune whole files via parquet min/max.
    * Same tmp-then-move commit as every other store write; the read
    * plan targets the OLD directory while the tmp writes, so the swap
    * is never torn. Returns (filesBefore, filesAfter).
    *
    * (With Delta/Iceberg this is OPTIMIZE + ZORDER; the arithmetic —
    * size-targeted bin-packing plus time clustering — is the same.)
    */
  def compactFacts(spark: SparkSession,
                   targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val p = Paths.get(dir("fact_events"))
    def parquetFiles: Seq[java.nio.file.Path] =
      if (!Files.exists(p)) Seq.empty
      else {
        val s = Files.walk(p)
        try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.toString.endsWith(".parquet"))
        finally s.close()
      }
    val before = parquetFiles
    if (before.isEmpty) return (0L, 0L)
    val totalBytes = before.map(Files.size(_)).sum
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (before.size <= parts) return (before.size.toLong, before.size.toLong)
    swapIn("fact_events", spark.read.parquet(dir("fact_events"))
      .repartitionByRange(parts, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id")))
    (before.size.toLong, parquetFiles.size.toLong)
  }

  /** Write-tmp-then-move commit: readers of the old directory are never
    * torn; single-writer assumption (one streaming query), as in the
    * reference's single consumer. */
  private def swapIn(name: String, df: DataFrame): Unit = {
    val tmp = dir(name + "__tmp")
    df.write.mode("overwrite").parquet(tmp)
    val target = Paths.get(dir(name))
    if (Files.exists(target)) {
      val old = Paths.get(dir(name + "__old"))
      deleteRec(old)
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRec(old)
    } else Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRec(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
