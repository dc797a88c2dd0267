package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-family libraries under
  * `graft.queries`; each [[QueryDef]] carries its own DuckDB oracle SQL.
  */
object SparkEntry {

  /** All registered query definitions. */
  def allDefs: Seq[QueryDef] =
    graft.queries.Warehouse.defs ++
      graft.queries.GraphQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.EmbeddingQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.WindowQueries.defs ++
      graft.queries.SketchQueries.defs ++
      graft.queries.PQQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { d =>
      d.name -> ((spark: SparkSession, dir: String) => d.build(Tables(spark, dir)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
