package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** Kafka wiring for the ingest topology — the explicit option-set and
  * wire-format twins of the reference's consumer/producer
  * (streaming/consumer.py:23-32: multi-topic subscribe, JSON value
  * deserializer, auto_offset_reset, group id; streaming/producer.py:
  * 23-28, 317-358: JSON value serializer, per-topic sends).
  *
  * The sandbox has no Kafka broker or connector jar, so `.load()` /
  * `.start()` cannot execute here; everything short of that is real and
  * tested — the exact option map Spark's `kafka` source takes, the wire
  * schema `load()` returns, and the parse/serialize columns between wire
  * frames and typed event rows. [[StreamIngest.applyBatch]] is
  * source-agnostic, so swapping the file/MemoryStream source for
  * `reader(spark, cfg).load()` on a real cluster changes nothing
  * downstream of [[parseEvents]].
  */
object KafkaWire {

  /** Consumer settings (consumer.py:23-32). `groupId` maps to the
    * kafka.-prefixed passthrough; `startingOffsets` is the Spark
    * equivalent of auto_offset_reset (only applied on first start —
    * afterwards the checkpoint owns progress, unlike the reference's
    * broker-side group offsets). */
  final case class SourceConfig(
      bootstrapServers: String = "kafka:9092",
      topics: Seq[String] = Seq("yelp-reviews", "yelp-checkins", "yelp-businesses", "yelp-users"),
      groupId: String = "yelp-consumers",
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = Some(100000L),
      failOnDataLoss: Boolean = false)

  /** Producer settings (producer.py:23-28). */
  final case class SinkConfig(
      bootstrapServers: String = "kafka:9092",
      topic: String = "yelp-reviews")

  /** The exact option map for `spark.readStream.format("kafka")`.
    * maxOffsetsPerTrigger bounds each micro-batch — the backpressure
    * knob a 100 TB replay needs (the reference's poll loop has none). */
  def sourceOptions(cfg: SourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topics.mkString(","),
      "kafka.group.id" -> cfg.groupId,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** A reader wired with [[sourceOptions]]; call `.load()` where the
    * spark-sql-kafka connector is on the classpath. */
  def reader(spark: SparkSession, cfg: SourceConfig): DataStreamReader =
    spark.readStream.format("kafka").options(sourceOptions(cfg))

  def sinkOptions(cfg: SinkConfig): Map[String, String] =
    Map("kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "topic" -> cfg.topic)

  /** What `format("kafka").load()` returns (fixed by the connector). */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Wire frames → typed event rows: UTF-8 decode + from_json of the
    * value (consumer.py:30's value_deserializer), ts normalized ns→µs.
    * `topic` is kept for per-topic routing (consumer.py:137-172's
    * if/elif chain becomes one column predicate). Malformed values
    * surface as null-struct rows rather than killing the poll loop. */
  def parseEvents(wire: DataFrame): DataFrame =
    wire.select(col("topic"),
        from_json(col("value").cast("string"), StreamIngest.rawSchema).as("j"))
      .select(col("topic"), col("j.*"))
      .transform(StreamIngest.normalize)

  /** Typed event rows → wire frames: JSON value (producer.py:28's
    * value_serializer), key = user_id so one user's events land in one
    * partition — giving per-user ORDER within the topic, which is what
    * makes the sessionizer/as-of consumers deterministic downstream. */
  def toWire(events: DataFrame, topic: String): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).multiply(1000L).as("ts"),
        col("props"))).cast("binary").as("value"),
      lit(topic).as("topic"))
}
