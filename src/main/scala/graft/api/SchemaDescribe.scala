package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-flavored schema analytics (SURVEY.md §2.10): the reference
  * samples 100 documents and recursively renders a type tree
  * (webapp/mongodb_routes.py:895-981) because Mongo has no schema.
  * Parquet does — so this traverses `df.schema` METADATA (no data scan)
  * for the structure, and computes exact null-density per column for the
  * field-statistics endpoint (webapp/mongodb_routes.py:742-826), which
  * the reference approximated by sampling.
  */
object SchemaDescribe {

  /** Recursive type tree: one row per field path, depth-first. */
  def describe(spark: SparkSession, df: DataFrame): DataFrame = {
    def walk(prefix: String, dt: DataType, nullable: Boolean, depth: Int): Seq[(String, String, Boolean, Int)] =
      dt match {
        case st: StructType =>
          (prefix, "struct", nullable, depth) +: st.fields.toSeq.flatMap(f =>
            walk(s"$prefix.${f.name}", f.dataType, f.nullable, depth + 1))
        case ArrayType(et, containsNull) =>
          (prefix, "array", nullable, depth) +: walk(s"$prefix[]", et, containsNull, depth + 1)
        case MapType(_, vt, valueContainsNull) =>
          (prefix, "map", nullable, depth) +: walk(s"$prefix{}", vt, valueContainsNull, depth + 1)
        case other => Seq((prefix, other.simpleString, nullable, depth))
      }
    import spark.implicits._
    df.schema.fields.toSeq
      .flatMap(f => walk(f.name, f.dataType, f.nullable, 0))
      .toDF("path", "type", "nullable", "depth")
  }

  /** Field statistics: exact per-column null density + approximate
    * distinct counts for top-level columns, in ONE scan (the reference
    * sampled 100 docs to bound cost; a columnar aggregate is exact and
    * cheaper). */
  def fieldStats(df: DataFrame): DataFrame = {
    val aggs = df.schema.fields.toSeq.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"__nn_${f.name}"),
        approx_count_distinct(col(f.name)).as(s"__dc_${f.name}"))
    } :+ count(lit(1)).as("__total")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val totalCnt = r.getAs[Long]("__total")
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields.toSeq.map { f =>
      val nn = r.getAs[Long](s"__nn_${f.name}")
      (f.name, f.dataType.simpleString, totalCnt, nn, totalCnt - nn,
        r.getAs[Long](s"__dc_${f.name}"))
    }.toDF("field", "type", "total_rows", "non_null", "nulls", "approx_distinct")
  }
}
