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

  test("insertIfAbsent is append-shaped: stored dirs never rewritten, no-op batches commit nothing") {
    import graft.sources.TxTable
    val root = Files.createTempDirectory("graft_iia").toString
    val store = new EventStore(root)
    val t = s"$root/dim_user"
    val sp = spark
    import sp.implicits._
    def dims(rows: (Long, String)*) =
      rows.toSeq.toDF("user_id", "first_seen")
    store.insertIfAbsent("dim_user", dims(1L -> "a", 2L -> "b"), "user_id")
    val s1 = TxTable.snapshot(t)
    // Overlapping batch: only the fresh key lands, as an APPENDED dir —
    // every pre-existing data dir is still listed (INSERT IGNORE must
    // not rewrite the table it ignores into).
    store.insertIfAbsent("dim_user", dims(2L -> "X", 3L -> "c"), "user_id")
    val s2 = TxTable.snapshot(t)
    assert(s1.dirs.forall(s2.dirs.contains), "insert rewrote stored dirs")
    assert(s2.dirs.size == s1.dirs.size + 1, "fresh rows did not append one delta dir")
    // First-writer-wins: key 2 keeps its original row.
    assert(store.table(spark, "dim_user").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // All-duplicate batch: proven absent of fresh keys (bloom probe) —
    // NO new version, not even an empty commit.
    store.insertIfAbsent("dim_user", dims(1L -> "z", 3L -> "z"), "user_id")
    assert(TxTable.snapshot(t).version == s2.version,
      "no-op batch committed a version")
    // The probe side is real: the table carries user_id bloom coverage.
    assert(TxTable.keyBlooms(t, TxTable.snapshot(t), "user_id").isDefined,
      "insertIfAbsent table lost key bloom coverage")
  }

  test("absentOnly: manifest-planned idempotence probe, zero-file all-new proof") {
    import graft.sources.TxTable
    val root = Files.createTempDirectory("graft_abs").toString
    val store = new EventStore(root)
    val fresh0 = mkEvents((1L, 1L, "click", 1.0, "2024-03-01T10:00:00Z"))
    // Missing table: everything is fresh.
    assert(store.absentOnly("fact_events", fresh0, "event_id").count() == 1)
    StreamIngest.applyBatch(StreamIngest.normalize(mkEvents(
      (1L, 1L, "click", 1.0, "2024-03-01T10:00:00Z"),
      (2L, 1L, "view", 2.0, "2024-03-01T10:05:00Z"),
      (3L, 2L, "click", 3.0, "2024-03-01T10:10:00Z"))), store)
    // Overlapping batch: only the unseen id survives the probe.
    val probe = store.absentOnly("fact_events", mkEvents(
      (3L, 2L, "click", 3.0, "2024-03-01T10:10:00Z"),
      (4L, 2L, "view", 4.0, "2024-03-01T10:15:00Z")), "event_id")
    assert(probe.select("event_id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    // The planning half behind it: the fact table carries event_id
    // Blooms, and an all-new batch's ids plan ZERO stored files — the
    // per-trigger idempotence check costs no fact-history I/O.
    val d = s"$root/fact_events"
    val snap = TxTable.snapshot(d)
    assert(snap.blooms.values.flatten.exists(_ == "event_id"),
      "fact table lost event_id bloom registration")
    assert(TxTable.lookupFiles(d, snap, "event_id", Seq(98L, 99L)).isEmpty,
      "all-new ids should prove absent from the manifest alone")
  }

  test("insertIfAbsent level-0 fold compacts deltas, never rewrites the base") {
    import graft.sources.TxTable
    val root = Files.createTempDirectory("graft_fold").toString
    val store = new EventStore(root)
    val sp = spark
    import sp.implicits._
    def dims(rows: (Long, String)*) = rows.toSeq.toDF("user_id", "first_seen")
    // A larger first batch (the base), then single-key batches past the
    // fold trigger.
    store.insertIfAbsent("dim_user",
      dims((1L to 200L).map(k => k -> s"u$k"): _*), "user_id")
    val t = s"$root/dim_user"
    val base = TxTable.snapshot(t).dirs.head
    (201L to (200L + store.AutoCompactDirs + 1)).foreach { k =>
      store.insertIfAbsent("dim_user", dims(k -> s"u$k"), "user_id")
    }
    val s = TxTable.snapshot(t)
    // The fold fired: dir count is back under the cap — and the big
    // base dir was never rewritten (same uuid, carried by reference),
    // so the periodic fold cost O(deltas), not O(table).
    assert(s.dirs.size <= store.AutoCompactDirs, s"fold never fired: ${s.dirs.size}")
    assert(s.dirs.head == base, "level-0 fold rewrote the base dir")
    assert(store.table(spark, "dim_user").count() == 200L + store.AutoCompactDirs + 1)
  }

  test("per-batch vacuum keeps derived-table disk bounded over a long stream") {
    val root = Files.createTempDirectory("graft_vac").toString
    val store = new EventStore(root)
    // 28 batches, each with a NEVER-SEEN date (dim_time gains a delta
    // commit per batch — the worst case for the append-shaped INSERT
    // IGNORE): the per-batch vacuum must cap manifests, summary_user's
    // full rewrites must not accumulate, and the dims' LSM level-0
    // fold (EventStore.AutoCompactDirs) must keep their delta-dir
    // count bounded once the pre-fold manifests age out of the
    // retention window — while the newest version stays correct.
    (1 to 28).foreach { i =>
      StreamIngest.applyBatch(StreamIngest.normalize(mkEvents(
        (i.toLong, i.toLong % 3, "click", 1.0, f"2024-03-${i}%02dT10:00:00Z"))), store)
    }
    def counts(table: String): (Long, Long) = {
      // Manifests only: checkpoints (one per retention vacuum + the
      // periodic cadence) share _log but are bounded separately.
      val logs = Files.list(java.nio.file.Paths.get(root, table, "_log"))
      val nLog = try logs.filter(_.toString.endsWith(".commit")).count()
                 finally logs.close()
      val data = Files.list(java.nio.file.Paths.get(root, table, "data"))
      val nData = try data.count() finally data.close()
      (nLog, nData)
    }
    Seq("summary_user", "dim_user", "dim_time").foreach { t =>
      val (nLog, nData) = counts(t)
      assert(nLog <= StreamIngest.VacuumKeepVersions,
        s"$t manifests unbounded: $nLog")
      // summary_user: ≤ keepLast versions × one rewrite dir each.
      // dims: ≤ the level-0 cap of live delta dirs (+1 slack for a
      // commit racing the count) — batches, not versions, bound them.
      val bound = math.max(StreamIngest.VacuumKeepVersions,
        store.AutoCompactDirs) + 1
      assert(nData <= bound, s"$t data dirs unbounded: $nData > $bound")
    }
    // The stream's results survive the cleanup.
    assert(store.facts(spark).count() == 28)
    assert(store.table(spark, "summary_user")
      .agg(sum(col("event_cnt"))).collect()(0).getLong(0) == 28L)
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
