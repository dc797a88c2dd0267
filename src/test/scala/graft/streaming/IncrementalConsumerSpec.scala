package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, SparkSpec => S}
import graft.sources.{Tables, TxTable}
import org.apache.spark.sql.functions._

/** Downstream incremental consumption of the fact store
  * (EventStore.factChangesSince over TxTable.readChanges): a consumer
  * checkpoints the fact-store VERSION it has processed and folds each
  * poll's delta into its own derived table — the medallion silver→gold
  * hop, decoupled from the ingest. The gate: after any interleaving of
  * ingest batches and consumer polls, the incrementally maintained
  * aggregate equals a one-shot recompute over the full fact history.
  */
class IncrementalConsumerSpec extends SparkSpec {

  test("checkpointed consumer's running aggregate equals one-shot recompute") {
    val root = Files.createTempDirectory("graft_consumer").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events

    // Consumer state: per-event-type running (cnt, total), plus the
    // fact-store version checkpoint. A real deployment persists both
    // atomically (its own TxTable); a driver-side map keeps this spec
    // focused on the change-read semantics.
    var checkpoint = 0L
    val state = scala.collection.mutable.Map.empty[String, (Long, java.math.BigDecimal)]
    var polls = 0
    def poll(): Unit = {
      val (delta, head) = store.factChangesSince(spark, checkpoint)
      delta.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).as("total"))
        .collect().foreach { r =>
          val (c0, t0) = state.getOrElse(r.getString(0),
            (0L, java.math.BigDecimal.ZERO))
          state(r.getString(0)) =
            (c0 + r.getLong(1), t0.add(r.getDecimal(2)))
        }
      checkpoint = head
      polls += 1
    }

    // Pre-ingest poll: a consumer may start BEFORE the first batch —
    // it must get an empty delta and a checkpoint (0, the init commit
    // every store starts at) that composes with whatever lands later,
    // not a raw filesystem error from the not-yet-created store.
    assert(store.factVersion() == 0L)
    poll()
    assert(state.isEmpty && checkpoint == 0L)

    // Interleave: 4 ingest slices, polls after 1 and after 3 (a poll
    // can span several commits), final poll after the last.
    (0 until 4).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 4 === i))
      if (i == 0 || i == 2 || i == 3) poll()
    }
    poll() // idle poll: must be a no-op, not a re-delivery
    assert(polls == 5)

    val expect = store.facts(spark).groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2))))
      .toMap
    assert(state.keySet == expect.keySet)
    expect.foreach { case (k, (c, t)) =>
      val (gc, gt) = state(k)
      assert(gc == c, s"$k count: incremental $gc vs recompute $c")
      assert(gt.compareTo(t) == 0, s"$k total: incremental $gt vs recompute $t")
    }

    // Compaction is LAYOUT-ONLY maintenance: a consumer checkpointed
    // BEFORE it keeps flowing — the rewrite-marked commit contributes
    // no rows (its dir holds only moves), so the poll spanning it
    // delivers an empty delta and the running aggregate stays equal to
    // the recompute. (Before round 14 this wedged the consumer with
    // the append-only violation, forcing a full re-seed after every
    // OPTIMIZE — Delta CDF treats OPTIMIZE as a feed no-op too.)
    val pre = checkpoint
    store.compactFacts(spark)
    if (store.factVersion() != pre) {
      val (delta, head2) = store.factChangesSince(spark, pre)
      assert(delta.isEmpty,
        "a compaction-spanning poll must deliver no rows (moves only)")
      assert(head2 == store.factVersion())
    }
  }

  test("factStream: the same silver→gold hop driven by Structured Streaming") {
    import org.apache.spark.sql.DataFrame
    val root = Files.createTempDirectory("graft_consumer_stream").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    store.appendFacts(events.filter(col("event_id") % 3 === 0))

    // The driver-side poll loop of the test above, handed to the engine:
    // EventStore.factStream is the graft-txtable source over the fact
    // store, so the VERSION CURSOR lives in the engine's checkpoint and
    // each foreachBatch invocation sees exactly one poll's delta.
    val state = scala.collection.mutable.Map.empty[String, (Long, java.math.BigDecimal)]
    val q = store.factStream(spark)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft_ckpt").toString)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        delta.groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("total"))
          .collect().foreach { r =>
            val (c0, t0) = state.getOrElse(r.getString(0),
              (0L, java.math.BigDecimal.ZERO))
            state(r.getString(0)) = (c0 + r.getLong(1), t0.add(r.getDecimal(2)))
          }
        ()
      }.start()
    q.processAllAvailable()
    store.appendFacts(events.filter(col("event_id") % 3 === 1))
    store.appendFacts(events.filter(col("event_id") % 3 === 2))
    q.processAllAvailable()
    q.stop()

    val expect = store.facts(spark).groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2))))
      .toMap
    assert(state.keySet == expect.keySet)
    expect.foreach { case (k, (c, t)) =>
      val (gc, gt) = state(k)
      assert(gc == c, s"$k count: streamed $gc vs recompute $c")
      assert(gt.compareTo(t) == 0, s"$k total: streamed $gt vs recompute $t")
    }
  }
}
