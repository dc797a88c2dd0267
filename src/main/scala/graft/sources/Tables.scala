package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed access to the driver-generated star schema
  * (`/root/testdata/sf*` — see TESTDATA.md).
  *
  * Mirrors the reference's loader layer (reference
  * `init/mysql_loader.py:354-369` reads raw files with explicit schema
  * handling); here the storage is already columnar Parquet so the loader
  * degenerates to schema-checked scans. All readers go through
  * `spark.read.parquet` so Catalyst gets predicate pushdown, column
  * pruning and partition pruning on every downstream query.
  */
final case class Tables(spark: SparkSession, dir: String) {

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Dimensions (small → broadcast-joinable).
  def region: DataFrame   = load("region")
  def nation: DataFrame   = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame     = load("part")

  // Facts (large at scale; every join keyed on their distribution keys).
  def orders: DataFrame   = load("orders")
  def lineitem: DataFrame = load("lineitem")

  /** Event stream table, normalized so downstream code always sees `ts`
    * as a plain µs TimestampType regardless of how the generator wrote
    * the file. Observed formats across testdata generations:
    *   - INT64 TIMESTAMP(NANOS)  → Spark reads LongType (`nanosAsLong`)
    *   - TIMESTAMP(MICROS, adjustedToUTC=false) → TimestampNTZType
    *   - TIMESTAMP(MICROS, adjustedToUTC=true)  → TimestampType
    * The NTZ→TZ cast is exact: the session timezone is pinned to UTC at
    * session build, so wall-clock micros map 1:1 onto epoch micros.
    */
  def events: DataFrame = {
    val raw = load("events")
    raw.schema("ts").dataType match {
      case LongType =>
        // Exact integer ns→µs: `/` would promote to double and epoch-ns
        // (~8e17) exceeds double's 2^53 exact range, giving ±1µs errors.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected ts type: $other")
    }
  }

  // LLM-pipeline tables. The driver's files are single-row-group parquet,
  // which Spark cannot split — without a repartition every downstream
  // per-document kernel (shingling, minhash, simhash, dot products) runs
  // in ONE task. The hash repartition costs one tiny shuffle and buys
  // full-cluster parallelism; at real scale this is the ingest bucketing
  // you'd apply anyway so signature jobs scale with cores, not files.
  def documents: DataFrame  = load("documents").repartition(col("doc_id"))
  def embeddings: DataFrame = load("embeddings").repartition(col("vec_id"))
}
