package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property the old dir-swap commit could NOT give: a reader that
  * resolves the table WHILE a rewrite commits never fails. The swap
  * (move target → old, move tmp → target) had a window with no target
  * path at all — a new reader in that window threw NoSuchFile, and one
  * that resolved just before lost its files to the post-swap delete.
  * With manifest commits a reader pins a version and its files outlive
  * the commit (until vacuum), so EVERY read in this race must succeed
  * with a consistent row count.
  */
class StoreCommitRaceSpec extends SparkSpec {
  import spark.implicits._

  test("readers racing summary rewrites: zero read failures, consistent counts") {
    val store = new EventStore(Files.createTempDirectory("graft_race").toString)
    def delta(ids: Seq[Long]) = ids.map(i =>
        (i, 1L, BigDecimal(1).setScale(2), java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      .toDF("user_id", "event_cnt", "total_value", "last_ts")
      .withColumn("total_value", col("total_value").cast("decimal(18,2)"))
    store.mergeSummary(delta(1L to 50L))

    val writerDone = new AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // Every merge is a full-rewrite commit of summary_user (the swap
    // case that used to tear); the keys already exist, so row count
    // stays 50 throughout — any other count is a torn read.
    val writer = new Thread(() => {
      try (1 to 8).foreach(_ => store.mergeSummary(delta(1L to 50L)))
      finally writerDone.set(true)
    })
    val readers = (1 to 2).map(_ => new Thread(() => {
      while (!writerDone.get()) {
        try counts.add(store.table(spark, "summary_user").count())
        catch { case t: Throwable => failures.add(t) }
      }
    }))
    writer.start(); readers.foreach(_.start())
    writer.join(); readers.foreach(_.join())

    assert(failures.isEmpty,
      s"reads failed during commits: ${failures.peek()}")
    val distinct = counts.toArray(Array.empty[java.lang.Long]).toSet
    assert(distinct == Set(50L: java.lang.Long),
      s"torn read observed row counts $distinct")
    assert(counts.size() > 0)
  }
}
