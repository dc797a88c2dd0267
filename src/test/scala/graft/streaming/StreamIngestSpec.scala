package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamIngestSpec extends SparkSpec {

  private def microsTs(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli * 1000000L // ns, like the raw files

  private def mkEvents(rows: (Long, Long, String, Double, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (id, u, t, v, ts) => (id, u, t, v, microsTs(ts), "{}") }
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
  }

  test("foreachBatch ingest: dedup, dims, time extension, summary merge across batches") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_stream").toString
    val store = new EventStore(root)

    val b1 = StreamIngest.normalize(mkEvents(
      (1L, 10L, "click", 1.5, "2024-03-01T10:00:00Z"),
      (2L, 10L, "view", 2.0, "2024-03-01T10:05:00Z"),
      (2L, 10L, "view", 2.0, "2024-03-01T10:05:00Z"), // in-batch dup
      (3L, 20L, "click", 4.0, "2024-03-02T09:00:00Z")))
    StreamIngest.applyBatch(b1, store)

    val b2 = StreamIngest.normalize(mkEvents(
      (3L, 20L, "click", 4.0, "2024-03-02T09:00:00Z"), // replay (ST2)
      (4L, 20L, "click", 1.0, "2024-03-03T09:00:00Z"),
      (5L, 30L, "view", 7.0, "2024-03-03T10:00:00Z")))
    StreamIngest.applyBatch(b2, store)

    // Facts: 5 unique events despite 7 delivered.
    val facts = store.facts(spark)
    assert(facts.count() == 5)
    assert(facts.select("event_id").distinct().count() == 5)

    // ST5: incremental summary equals a full batch recompute from facts.
    val summary = store.table(spark, "summary_user")
      .orderBy("user_id")
      .select("user_id", "event_cnt", "total_value")
    val recomputed = facts.groupBy("user_id").agg(
      count(lit(1)).as("event_cnt"),
      sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .orderBy("user_id")
      .select("user_id", "event_cnt", "total_value")
    assert(rows(summary) == rows(recomputed))

    // ST6: dim_user first-writer-wins — first_seen survives later batches.
    val dimUser = store.table(spark, "dim_user")
    assert(dimUser.count() == 3)
    val firstSeen10 = dimUser.filter(col("user_id") === 10)
      .select(date_format(col("first_seen"), "yyyy-MM-dd HH:mm").as("f"))
      .collect()(0).getString(0)
    assert(firstSeen10 == "2024-03-01 10:00")

    // ST4: time dimension has exactly the three distinct event dates.
    val dimTime = store.table(spark, "dim_time")
    assert(dimTime.count() == 3)
    assert(dimTime.filter(col("dow_actual").isNull).count() == 0)
  }

  test("per-batch vacuum keeps derived-table disk bounded over a long stream") {
    val root = Files.createTempDirectory("graft_vac").toString
    val store = new EventStore(root)
    // 12 batches: summary_user alone would otherwise hold 12 historical
    // versions (each a full rewrite) — the vacuum wired into applyBatch
    // must cap manifests AND superseded data directories at the
    // retention window, while the newest version stays correct.
    (1 to 12).foreach { i =>
      StreamIngest.applyBatch(StreamIngest.normalize(mkEvents(
        (i.toLong, i.toLong % 3, "click", 1.0, f"2024-03-${i}%02dT10:00:00Z"))), store)
    }
    def counts(table: String): (Long, Long) = {
      val logs = Files.list(java.nio.file.Paths.get(root, table, "_log"))
      val nLog = try logs.count() finally logs.close()
      val data = Files.list(java.nio.file.Paths.get(root, table, "data"))
      val nData = try data.count() finally data.close()
      (nLog, nData)
    }
    Seq("summary_user", "dim_user", "dim_time").foreach { t =>
      val (nLog, nData) = counts(t)
      assert(nLog <= StreamIngest.VacuumKeepVersions,
        s"$t manifests unbounded: $nLog")
      // ≤ keepLast versions, each referencing one rewrite dir (+1 slack
      // for a commit racing the count).
      assert(nData <= StreamIngest.VacuumKeepVersions + 1,
        s"$t data dirs unbounded: $nData")
    }
    // The stream's results survive the cleanup.
    assert(store.facts(spark).count() == 12)
    assert(store.table(spark, "summary_user")
      .agg(sum(col("event_cnt"))).collect()(0).getLong(0) == 12L)
  }

  test("streaming query end-to-end over MemoryStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_q").toString
    val store = new EventStore(root)
    val mem = MemoryStream[(Long, Long, String, Double, Long, String)]
    val events = StreamIngest.normalize(
      mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts", "props"))
    val q = StreamIngest.start(events, store, s"$root/_checkpoint")
    try {
      mem.addData((1L, 1L, "click", 1.0, microsTs("2024-05-01T00:00:00Z"), "{}"))
      q.processAllAvailable()
      mem.addData((2L, 1L, "view", 3.0, microsTs("2024-05-01T01:00:00Z"), "{}"),
        (1L, 1L, "click", 1.0, microsTs("2024-05-01T00:00:00Z"), "{}")) // replay
      q.processAllAvailable()
      assert(store.facts(spark).count() == 2)
      val sm = store.table(spark, "summary_user").collect()(0)
      assert(sm.getAs[Long]("event_cnt") == 2L)
    } finally q.stop()
  }
}
