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
  * rewritten per merge — correct for dimension/summary cardinality. A
  * 100 TB deployment keeps the same update arithmetic but lands it via
  * Delta MERGE so only touched files rewrite.
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

  /** S5/A21: arithmetic merge of per-user deltas into running totals. */
  def mergeSummary(delta: DataFrame): Unit = {
    val existing = readOrEmpty(delta.sparkSession, "summary_user", delta)
    val e = existing.select(col("user_id"), col("event_cnt").as("e_cnt"),
      col("total_value").as("e_val"), col("last_ts").as("e_ts"))
    val merged = e.join(delta, Seq("user_id"), "full_outer").select(
      col("user_id"),
      (coalesce(col("e_cnt"), lit(0L)) + coalesce(col("event_cnt"), lit(0L))).as("event_cnt"),
      (coalesce(col("e_val"), lit(0).cast("decimal(18,2)")) +
        coalesce(col("total_value"), lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").as("total_value"),
      greatest(col("e_ts"), col("last_ts")).as("last_ts"))
    swapIn("summary_user", merged)
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
