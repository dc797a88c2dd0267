package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.{EventStore, KafkaWire, StreamIngest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The layer KAFKA_PROBE.md could not execute, executed: a streaming
  * source's OFFSET LIFECYCLE — initial offsets, per-batch ranges,
  * checkpoint commit, restart recovery, admission control — end-to-end
  * through the same `parseEvents` → `applyBatch` ingest the Kafka
  * source would feed (reference streaming/consumer.py:27-33).
  */
class GraftTopicSourceSpec extends SparkSpec {

  private val Topic = "graft-events"
  private val Parts = 2

  private def microsTs(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli * 1000000L // ns, like the raw files

  private def typedEvents(rows: (Long, Long, String, Double, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    StreamIngest.normalize(
      rows.toSeq.map { case (id, u, t, v, ts) => (id, u, t, v, microsTs(ts), "{}") }
        .toDF("event_id", "user_id", "event_type", "value", "ts", "props"))
  }

  /** Producer twin: typed rows → Kafka wire frames → keyed append into
    * the broker log (KafkaWire.toWire is the same encoding the real
    * producer would publish). */
  private def produce(broker: String, rows: (Long, Long, String, Double, String)*): Unit =
    GraftTopic.sendWire(KafkaWire.toWire(typedEvents(rows: _*), Topic),
      broker, Parts, tsMicros = 1710000000000000L)

  private def wireStream(broker: String, extra: Map[String, String] = Map.empty): DataFrame =
    extra.foldLeft(
      spark.readStream.format("graft-topic")
        .option("brokerDir", broker)
        .option("subscribe", Topic)
        .option("partitions", Parts.toString)
        .option("startingOffsets", "earliest")) { case (r, (k, v)) => r.option(k, v) }
      .load()

  /** Drain everything currently in the topic through one AvailableNow
    * run, counting wire rows per micro-batch — a fresh query each call,
    * progress owned by the CHECKPOINT (the restart-recovery shape). */
  private def drain(broker: String, ckpt: String, store: EventStore,
                    extra: Map[String, String] = Map.empty): Seq[Long] = {
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = KafkaWire.parseEvents(wireStream(broker, extra)).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) sizes += n
        StreamIngest.applyBatch(b.drop("topic"), store)
      }
      .start()
    q.awaitTermination()
    sizes.toSeq
  }

  test("produce → stream → ingest; kill/restart on the checkpoint is exactly-once") {
    val broker = Files.createTempDirectory("graft_broker").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val store = new EventStore(Files.createTempDirectory("graft_store").toString)

    produce(broker,
      (1L, 10L, "click", 1.5, "2024-03-01T10:00:00Z"),
      (2L, 10L, "view", 2.0, "2024-03-01T10:05:00Z"),
      (3L, 20L, "click", 4.0, "2024-03-02T09:00:00Z"),
      (4L, 30L, "view", 0.5, "2024-03-02T10:00:00Z"))
    val s1 = drain(broker, ckpt, store)
    assert(s1.sum == 4 && store.facts(spark).count() == 4)

    // "Kill" = the first query is gone; a NEW query on the same
    // checkpoint must resume AFTER the consumed offsets: the 4 old wire
    // records are not re-read (s2.sum counts SOURCE rows, before any
    // ST2 dedup could mask a re-delivery).
    produce(broker,
      (5L, 10L, "click", 9.0, "2024-03-03T10:00:00Z"),
      (6L, 40L, "view", 3.0, "2024-03-03T11:00:00Z"))
    val s2 = drain(broker, ckpt, store)
    assert(s2.sum == 2, s"restart re-read the backlog: $s2")
    assert(store.facts(spark).count() == 6)
    assert(store.table(spark, "dim_user").count() == 4)

    // Nothing new → zero batches with rows.
    assert(drain(broker, ckpt, store).isEmpty)
  }

  test("offsets are dense per partition and keyed records stay together") {
    val broker = Files.createTempDirectory("graft_broker").toString
    produce(broker, (1L to 8L).map(i => (i, i % 3 + 10, "click", 1.0,
      "2024-03-01T10:00:00Z")): _*)
    // A bounded read of the wire frame itself (one AvailableNow drain
    // into memory) exposes (partition, offset) for assertions.
    val got = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val q = wireStream(broker).writeStream
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.select(col("partition"), col("offset"),
            get_json_object(col("value").cast("string"), "$.user_id").cast("long"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        ()
      }.start()
    q.awaitTermination()
    assert(got.size == 8)
    // Dense offsets 0..n-1 within each partition (the replayability
    // invariant ranges depend on).
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted == (0L until rs.size), s"offsets not dense: $rs")
    }
    // One user's records all landed in one partition (keyed sends).
    got.groupBy(_._3).foreach { case (u, rs) =>
      assert(rs.map(_._1).distinct.size == 1, s"user $u split across partitions")
    }
  }

  test("maxOffsetsPerTrigger bounds every micro-batch (admission control)") {
    val broker = Files.createTempDirectory("graft_broker").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val store = new EventStore(Files.createTempDirectory("graft_store").toString)
    produce(broker, (1L to 10L).map(i => (i, i, "click", 1.0,
      "2024-03-01T10:00:00Z")): _*)
    val sizes = drain(broker, ckpt, store, Map("maxOffsetsPerTrigger" -> "3"))
    assert(sizes.sum == 10 && sizes.forall(_ <= 3),
      s"admission control violated: $sizes")
    assert(sizes.size >= 4) // 10 rows at ≤3/batch can't fit in 3 batches
  }

  test("streaming SINK: wire frames round-trip through the broker log") {
    // The producer side as a real DSv2 StreamingWrite: a streamed wire
    // frame lands in the per-partition logs (driver-committed per
    // epoch, so appends are never torn), and the SOURCE reads it back
    // through the unchanged ingest — the reference's producer→consumer
    // loop (streaming/producer.py → consumer.py) with both ends now
    // executable DataSourceV2 code.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val broker = Files.createTempDirectory("graft_broker").toString
    val mem = MemoryStream[(Long, Long, String, Double, Long, String)]
    val wire = KafkaWire.toWire(
      StreamIngest.normalize(mem.toDF().toDF(
        "event_id", "user_id", "event_type", "value", "ts", "props")),
      Topic)
    val q = wire.writeStream
      .format("graft-topic")
      .option("brokerDir", broker)
      .option("partitions", Parts.toString)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    mem.addData((1L to 6L).map(i =>
      (i, i % 3 + 10, "click", 1.0, 1710000000000000000L, "{}")): _*)
    q.processAllAvailable()
    q.stop()
    // Read back through the source + ingest: all 6 events, keyed
    // partitioning intact.
    val store = new EventStore(Files.createTempDirectory("graft_store").toString)
    val sizes = drain(broker, Files.createTempDirectory("ck2").toString, store)
    assert(sizes.sum == 6 && store.facts(spark).count() == 6)
    assert(store.table(spark, "dim_user").count() == 3)
  }

  test("startingOffsets=latest skips the backlog; checkpoint then owns progress") {
    val broker = Files.createTempDirectory("graft_broker").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val store = new EventStore(Files.createTempDirectory("graft_store").toString)
    produce(broker, (1L, 10L, "click", 1.0, "2024-03-01T10:00:00Z"),
      (2L, 20L, "view", 2.0, "2024-03-01T11:00:00Z"))
    val s1 = drain(broker, ckpt, store, Map("startingOffsets" -> "latest"))
    assert(s1.isEmpty && store.facts(spark).count() == 0)
    // After the first start the checkpoint owns progress: new records
    // flow even with startingOffsets=latest still set.
    produce(broker, (3L, 30L, "click", 3.0, "2024-03-02T10:00:00Z"))
    val s2 = drain(broker, ckpt, store, Map("startingOffsets" -> "latest"))
    assert(s2.sum == 1 && store.facts(spark).count() == 1)
  }
}
