package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, SparkSpec => S}
import graft.sources.{Tables, TxTable}
import org.apache.spark.sql.functions._

/** Time-based retention over the fact store: fully-aged files leave by
  * manifest reference (no data I/O), cutoff-straddling files rewrite
  * filtered exactly, live files carry untouched, and an expiry with
  * nothing to do commits nothing.
  */
class EventStoreRetentionSpec extends SparkSpec {

  private def micros(iso: String): Long = java.time.temporal.ChronoUnit.MICROS
    .between(java.time.Instant.EPOCH, java.time.Instant.parse(iso))

  test("aged files drop by reference; straddlers rewrite; no-op commits nothing") {
    val root = Files.createTempDirectory("graft_retention").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-01-31")
    weeks.sliding(2).foreach { case Seq(lo, hi) =>
      store.appendFacts(events.filter(
        col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp")).repartition(2))
    }
    val t = s"$root/fact_events"
    val dirsBefore = TxTable.snapshot(t).dirs
    def expect(fromIso: String) = events
      .filter(col("ts") >= lit(fromIso.take(10)).cast("timestamp") &&
        col("ts") < lit("2024-01-31").cast("timestamp"))
      .orderBy("event_id").collect().toSeq

    // Boundary-aligned expiry: weeks 1-2 are FULLY aged — both dirs
    // leave by reference, nothing rewrites.
    val (d1, r1) = store.expireFacts(spark, micros("2024-01-15T00:00:00Z"))
    assert(d1 == 4L && r1 == 0L, s"expected 4 dropped / 0 rewritten, got ($d1, $r1)")
    val afterBoundary = TxTable.snapshot(t)
    assert(afterBoundary.dirs.toSet == dirsBefore.drop(2).toSet,
      "boundary expiry should keep exactly the live dirs, by reference")
    assert(store.facts(spark).orderBy("event_id").collect().toSeq
      == expect("2024-01-15"))

    // Mid-week expiry: week 3 straddles the cutoff (both its files
    // rewrite filtered), week 4 carries untouched.
    val (d2, r2) = store.expireFacts(spark, micros("2024-01-18T00:00:00Z"))
    assert(d2 == 0L && r2 == 2L, s"expected 0 dropped / 2 rewritten, got ($d2, $r2)")
    val afterMid = TxTable.snapshot(t)
    assert(afterMid.dirs.contains(dirsBefore.last),
      "mid-week expiry rewrote the fully-live week")
    assert(store.facts(spark).orderBy("event_id").collect().toSeq
      == expect("2024-01-18"))

    // Nothing left to expire at the same cutoff: no commit at all.
    val v = TxTable.snapshot(t).version
    assert(store.expireFacts(spark, micros("2024-01-18T00:00:00Z")) == ((0L, 0L)))
    assert(TxTable.snapshot(t).version == v,
      "a no-op expiry committed a new version")
  }
}
