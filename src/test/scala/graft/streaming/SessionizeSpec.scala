package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionizeSpec extends SparkSpec {

  test("stateful sessionizer matches the batch sessionization query") {
    // Feed the whole sf0.001 events table through the streaming
    // sessionizer in one micro-batch and compare per-user session counts
    // with the oracle-checked batch twin (q_events_sessions).
    val t = Tables(spark, graft.SparkSpec.Sf0001)
    val streamedIn = t.events // batch DF works: flatMapGroupsWithState on batch runs the same state fn once per key
    val out = Sessionize.sessionize(streamedIn, gapMinutes = 30)
      .toDF().orderBy("user_id")
      .select(col("user_id"), col("session_cnt"), col("event_cnt"))
    val batch = SparkEntryHelper.batchSessions(spark, graft.SparkSpec.Sf0001)
    assert(rows(out) == rows(batch))
  }

  test("sessionizer accumulates across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts_us", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("value"))
    val q = Sessionize.sessionize(events, gapMinutes = 30)
      .toDF().writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Update()).start()
    def us(minute: Long) = minute * 60L * 1000000L
    try {
      mem.addData((1L, us(0), 1.0), (1L, us(10), 1.0))   // one session
      q.processAllAvailable()
      mem.addData((1L, us(20), 1.0), (1L, us(120), 1.0)) // gap -> second session
      q.processAllAvailable()
      val last = spark.table("sess_out")
        .groupBy("user_id").agg(max(struct(col("event_cnt"), col("session_cnt"))).as("s"))
        .select(col("user_id"), col("s.session_cnt"), col("s.event_cnt"))
        .collect()(0)
      assert(last.getAs[Long]("session_cnt") == 2L)
      assert(last.getAs[Long]("event_cnt") == 4L)
    } finally q.stop()
  }

  test("closed sessions emit on successor gap AND on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts_us", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("value"))
      .withWatermark("ts", "0 seconds")
    val q = Sessionize.closedSessions(events, gapMinutes = 30)
      .toDF().writeStream.format("memory").queryName("closed_out")
      .outputMode(OutputMode.Append()).start()
    // Offset from epoch 0: the initial watermark sits at 0 and drops
    // rows on the boundary.
    def us(minute: Long) = (100000L + minute) * 60L * 1000000L
    try {
      // Session 1: two events; then a 100-min gap event opens session 2.
      mem.addData((1L, us(0), 1.0), (1L, us(10), 1.0))
      q.processAllAvailable()
      assert(spark.table("closed_out").count() == 0) // still open
      mem.addData((1L, us(110), 1.0))
      q.processAllAvailable()
      val afterGap = spark.table("closed_out").as[Sessionize.ClosedSession].collect()
      assert(afterGap.toSeq == Seq(Sessionize.ClosedSession(1L, us(0), us(10), 2L)))
      // Advance the watermark far past session 2's gap via another user:
      // the open tail session must close by TIMEOUT, no successor needed.
      mem.addData((2L, us(1000), 1.0))
      q.processAllAvailable()
      mem.addData((2L, us(1001), 1.0)) // one more batch so timeouts fire
      q.processAllAvailable()
      val all = spark.table("closed_out").as[Sessionize.ClosedSession].collect()
      assert(all.contains(Sessionize.ClosedSession(1L, us(110), us(110), 1L)))
    } finally q.stop()
  }

  test("windowed counts with watermark over a stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double, Long)]
    val events = mem.toDF().toDF("event_id", "event_type", "value", "ts_us")
      .select(col("event_id"), col("event_type"), col("value"),
        timestamp_micros(col("ts_us")).as("ts"))
    val q = Sessionize.windowedCounts(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update()).start()
    def us(minute: Long) = minute * 60L * 1000000L
    try {
      mem.addData((1L, "click", 1.0, us(5)), (2L, "click", 2.0, us(20)),
        (3L, "view", 5.0, us(70)))
      q.processAllAvailable()
      val out = spark.table("win_out")
      val clicks = out.filter(col("event_type") === "click")
        .orderBy(col("window_start")).collect()
      assert(clicks.last.getAs[Long]("event_cnt") == 2L)
      assert(clicks.last.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }
}

/** Batch twin of the sessionizer, shared with the spec (the public
  * oracle-checked version lives in graft.queries.EventQueries). */
object SparkEntryHelper {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  def batchSessions(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("q_events_sessions")(spark, dir)
      .select("user_id", "session_cnt", "event_cnt")
}
