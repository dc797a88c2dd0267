package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventGeneratorSpec extends SparkSpec {

  test("batch generator: deterministic, correct shape, plausible mix") {
    val a = EventGenerator.batch(spark, 1000).collect()
    val b = EventGenerator.batch(spark, 1000).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val types = a.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length).toMap
    // 60/20/10/10 within generous tolerance.
    assert(types("review") > 450 && types("review") < 750)
    assert(types.keySet == Set("review", "checkin", "business", "user"))
    // Fixed cadence: ts strictly increasing by 500 ms.
    val ts = a.sortBy(_.getAs[Long]("event_id")).map(_.getAs[java.sql.Timestamp]("ts").getTime)
    assert(ts.sliding(2).forall(p => p(1) - p(0) == 500))
  }

  test("rate-source stream produces the same row shape") {
    val q = EventGenerator.stream(spark, eventsPerSecond = 200)
      .writeStream.format("memory").queryName("gen_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      val deadline = System.nanoTime() + 20L * 1000000000
      var n = 0L
      while (n == 0 && System.nanoTime() < deadline) {
        Thread.sleep(300)
        n = spark.table("gen_out").count()
      }
      val out = spark.table("gen_out")
      assert(out.columns.toSeq ==
        Seq("event_id", "user_id", "event_type", "value", "ts", "props"))
      assert(n > 0, "rate source produced no rows within 20s")
    } finally q.stop()
  }

  test("generated events replay through the ingest pipeline") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen").toString
    val store = new EventStore(root)
    StreamIngest.applyBatch(EventGenerator.batch(spark, 200), store)
    assert(store.facts(spark).count() == 200)
    val summary = store.table(spark, "summary_user")
    assert(summary.agg(sum("event_cnt")).collect()(0).getLong(0) == 200L)
  }
}
