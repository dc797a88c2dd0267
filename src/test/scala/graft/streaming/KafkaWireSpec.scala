package graft.streaming

import graft.{SparkSpec, SparkSpec => S}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KafkaWireSpec extends SparkSpec {

  test("source options carry the reference consumer's exact settings") {
    val opts = KafkaWire.sourceOptions(KafkaWire.SourceConfig())
    assert(opts("kafka.bootstrap.servers") == "kafka:9092")
    assert(opts("subscribe") == "yelp-reviews,yelp-checkins,yelp-businesses,yelp-users")
    assert(opts("kafka.group.id") == "yelp-consumers")
    assert(opts("startingOffsets") == "latest")
    assert(opts("failOnDataLoss") == "false")
    assert(opts("maxOffsetsPerTrigger") == "100000")
    // No trigger bound → no option (Spark treats absence as unbounded).
    val unbounded = KafkaWire.SourceConfig(maxOffsetsPerTrigger = None)
    assert(!KafkaWire.sourceOptions(unbounded).contains("maxOffsetsPerTrigger"))
  }

  test("wire round-trip: serialize to kafka frame, parse back identically") {
    val events = Tables(spark, S.Sf0001).events.limit(200)
    val parsed = KafkaWire.parseEvents(KafkaWire.toWire(events, "yelp-reviews"))
    assert(parsed.select("topic").distinct().collect().map(_.getString(0)).toSeq == Seq("yelp-reviews"))
    val cols = Seq("event_id", "user_id", "event_type", "value", "ts", "props")
    val a = events.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    val b = parsed.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("malformed values become null rows, not a dead consumer") {
    val spark0 = spark
    import spark0.implicits._
    val wire = Seq(("yelp-reviews", "not json at all"))
      .toDF("topic", "value")
      .withColumn("value", col("value").cast("binary"))
    val out = KafkaWire.parseEvents(wire).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("event_id")))
  }

  test("parse is streaming-compatible (same plan works under readStream)") {
    implicit val sc = spark.sqlContext
    val spark0 = spark
    import spark0.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val wire = mem.toDF().toDF("topic", "value")
      .withColumn("value", col("value").cast("binary"))
    assert(KafkaWire.parseEvents(wire).isStreaming)
  }
}
