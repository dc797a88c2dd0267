package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic event generator (SURVEY.md §2.1 S8; reference
  * streaming/producer.py:315-373): weighted event mix on a fixed
  * cadence. Batch variant generates a deterministic window of events
  * (seeded, reproducible fixtures); streaming variant rides the `rate`
  * source for a live feed — both share the row shape with the ingest
  * pipeline, so tests replay generator output straight through
  * [[StreamIngest.applyBatch]].
  */
object EventGenerator {

  /** Reference mix: 60/20/10/10 (streaming/producer.py:328-334). */
  private val typeExpr =
    """CASE WHEN __u < 0.6 THEN 'review'
      |     WHEN __u < 0.8 THEN 'checkin'
      |     WHEN __u < 0.9 THEN 'business'
      |     ELSE 'user' END""".stripMargin

  private def shape(df: DataFrame, startEpochUs: Long, intervalUs: Long): DataFrame =
    df
      .withColumn("__u", pmod(hash(col("event_id") * 2654435761L), lit(1000)) / 1000.0)
      .withColumn("event_type", expr(typeExpr))
      .withColumn("user_id", pmod(hash(col("event_id") + 7), lit(100)).cast("long") + 1)
      .withColumn("value", round(pmod(hash(col("event_id") + 13), lit(500)) / 100.0, 2))
      .withColumn("ts", timestamp_micros(lit(startEpochUs) + col("event_id") * intervalUs))
      .withColumn("props", concat(lit("{\"k\": "), pmod(col("event_id"), lit(5)), lit("}")))
      .select("event_id", "user_id", "event_type", "value", "ts", "props")

  /** Deterministic batch of `n` events at a fixed cadence. */
  def batch(spark: SparkSession, n: Long,
            startEpochUs: Long = 1704067200000000L, // 2024-01-01T00:00Z
            intervalMs: Long = 500): DataFrame =
    shape(spark.range(n).select(col("id").as("event_id")), startEpochUs, intervalMs * 1000L)

  /** Live stream at `eventsPerSecond`, same row shape. Cadence computed
    * in MICROseconds — integer millisecond division would collapse to 0
    * (identical timestamps) above 1000 events/s. */
  def stream(spark: SparkSession, eventsPerSecond: Int): DataFrame =
    shape(
      spark.readStream.format("rate")
        .option("rowsPerSecond", eventsPerSecond).load()
        .select(col("value").as("event_id")),
      startEpochUs = 1704067200000000L,
      intervalUs = math.max(1L, 1000000L / math.max(1, eventsPerSecond)))
}
