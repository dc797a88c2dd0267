package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with scale-oriented defaults.
  *
  * Tuned for the driver's local[32] harness but with settings chosen to
  * transfer to a multi-executor cluster: AQE on (runtime shuffle-partition
  * coalescing + skew-join splitting), modest broadcast threshold (dims in
  * this star schema are tiny), and partition sizing that keeps scan tasks
  * balanced at larger scale factors.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // TypedImperativeAggregate / collect_set run on ObjectHashAggregate,
      // whose default sort-based fallback triggers at just 128 distinct
      // keys in the hash map — turning one-shuffle aggregations into
      // full sorts on any real key cardinality. Raise it; the map spills
      // nothing here (values are bounded by design where it matters).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // events.parquet carries INT64 TIMESTAMP(NANOS); Spark reads it as
      // long when this legacy flag is on — Tables.events normalizes back
      // to TimestampType. Harmless for µs/ms files.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark still DEFAULTS timestamp writes to deprecated INT96, which
      // carries no parquet statistics — killing both row-group skipping
      // on ts predicates and TxTable's commit-time stats harvest.
      // TIMESTAMP_MICROS is the modern INT64 encoding every engine
      // (DuckDB included) reads, with full min/max stats.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
