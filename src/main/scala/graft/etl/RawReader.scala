package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL ingest with explicit schema, validation, and keyed dedup —
  * the reference's loader semantics (SURVEY.md §2.1 S1/S3/S4, §2.2 P10;
  * reference init/mysql_loader.py:354-369, 432-456) as one declarative
  * pipeline.
  *
  * Schema is ALWAYS explicit (never inferSchema — a second pass over
  * 100 TB of JSONL just to guess types). Corrupt lines land in a
  * `_corrupt` column instead of killing the job (PERMISSIVE mode);
  * validation splits rather than drops, so rejects stay auditable —
  * the loader's printed skip-counters, as data.
  */
object RawReader {

  final case class Ingested(valid: DataFrame, rejected: DataFrame, private[etl] val raw: DataFrame) {
    /** Release the one-parse cache once both sides are written. */
    def done(): Unit = raw.unpersist()
  }

  /** Read + validate + dedup in one pass description.
    *
    * @param required columns that must be non-null (P10 row validation)
    * @param key      dedup key — first writer wins in input order is NOT
    *                 reproducible under parallelism, so the winner is the
    *                 min of `orderCol` (deterministic; SURVEY.md §7.4.2)
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                required: Seq[String], key: String, orderCol: String): Ingested = {
    // Persisted: (a) Spark refuses corrupt-column-only queries on raw
    // JSON (the parser would have nothing to parse INTO), and (b) the
    // valid/rejected split would otherwise parse the files twice. One
    // parse, spilled to disk if the ingest unit exceeds memory; callers
    // unpersist via Ingested.done() after materializing both sides.
    val raw = spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    split(raw, required, key, orderCol)
  }

  /** CSV twin of [[readJsonl]] — same explicit-schema / corrupt-capture /
    * validation-split / keyed-dedup pipeline over delimited files
    * (header expected; PERMISSIVE malformed-line capture). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              required: Seq[String], key: String, orderCol: String): Ingested = {
    val raw = spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", "true")
      .csv(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    split(raw, required, key, orderCol)
  }

  /** Shared corrupt/invalid/valid split + dedup (see [[readJsonl]] docs). */
  private def split(raw: DataFrame, required: Seq[String],
                    key: String, orderCol: String): Ingested = {
    val parsed = raw.filter(col("_corrupt").isNull).drop("_corrupt")
    val corrupt = raw.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("line"), lit("corrupt_record").as("reason"))
    // foldLeft: an empty `required` list means "no validation", not an
    // empty-reduce crash.
    val requiredPred = required.map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val invalid = parsed.filter(!requiredPred)
      .select(to_json(struct(col("*"))).as("line"), lit("missing_required").as("reason"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(orderCol).asc)
    val valid = parsed.filter(requiredPred)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    Ingested(valid, corrupt.unionByName(invalid), raw)
  }
}
