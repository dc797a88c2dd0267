package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamJoinSpec extends SparkSpec {

  // Minutes → µs, based a day after epoch: the initial global watermark
  // is epoch 0, and input rows AT or BEFORE the watermark are dropped as
  // late — fixture times must sit strictly above it.
  private def us(minute: Long) = (24 * 60 + minute) * 60L * 1000000L

  test("interval join matches orders within the window, across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evMem = MemoryStream[(Long, Long)]  // (user_id, ts_us)
    val odMem = MemoryStream[(Long, Long, Double)] // (o_custkey, o_ts_us, total)
    val events = evMem.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val orders = odMem.toDF().toDF("o_custkey", "o_ts_us", "o_total")
      .select(col("o_custkey"), timestamp_micros(col("o_ts_us")).as("o_ts"), col("o_total"))

    val q = StreamJoin.eventsWithRecentOrders(events, orders, windowHours = 2)
      .select(col("user_id"), col("ts"), col("o_total"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1: order at t=0 for user 1; event at t=60 (inside 2h).
      odMem.addData((1L, us(0), 10.0))
      evMem.addData((1L, us(60)))
      q.processAllAvailable()
      // Batch 2: the ORDER arrives after the event was buffered —
      // stream-stream state must still match them (event t=90, order
      // t=30), plus an out-of-window order (event-side t=90, order at
      // t=-60 ... 150 min gap > 120) that must NOT match.
      evMem.addData((2L, us(90)))
      odMem.addData((2L, us(30), 20.0), (3L, us(-60), 99.0))
      evMem.addData((3L, us(90)))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select(col("user_id"), col("o_total")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === Set((1L, 10.0), (2L, 20.0)),
        s"unexpected join output: $got")
    } finally q.stop()
  }

  test("streaming interval join agrees with the batch formulation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val pairs = for (u <- 1L to 20L; m <- Seq(0L, 45L, 200L)) yield (u, m)
    val eventRows = pairs.map { case (u, m) => (u, us(m + 30)) }
    val orderRows = pairs.map { case (u, m) => (u, us(m), (u * 100 + m).toDouble) }

    val evMem = MemoryStream[(Long, Long)]
    val odMem = MemoryStream[(Long, Long, Double)]
    val events = evMem.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val orders = odMem.toDF().toDF("o_custkey", "o_ts_us", "o_total")
      .select(col("o_custkey"), timestamp_micros(col("o_ts_us")).as("o_ts"), col("o_total"))

    val q = StreamJoin.eventsWithRecentOrders(events, orders, windowHours = 1)
      .select(col("user_id"), col("ts"), col("o_ts"), col("o_total"))
      .writeStream.format("memory").queryName("ssj_batch_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      evMem.addData(eventRows)
      odMem.addData(orderRows)
      q.processAllAvailable()
      val streamed = spark.table("ssj_batch_eq").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet

      val be = eventRows.toDF("user_id", "ts_us")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
      val bo = orderRows.toDF("o_custkey", "o_ts_us", "o_total")
        .select(col("o_custkey"), timestamp_micros(col("o_ts_us")).as("o_ts"), col("o_total"))
      val batch = be.join(bo,
          be("user_id") === bo("o_custkey") &&
            bo("o_ts") <= be("ts") &&
            bo("o_ts") >= be("ts") - expr("INTERVAL 1 HOURS"))
        .select(col("user_id"), col("ts"), col("o_ts"), col("o_total")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet

      assert(streamed === batch, "stream-stream result diverged from batch join")
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
