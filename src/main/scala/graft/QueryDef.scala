package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Tables

/** One verifiable query: a Spark DataFrame builder plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows-only check.
  *
  * Determinism contract: every query's output is fully deterministic —
  * unique ORDER BY before any LIMIT, exact-decimal aggregation for
  * doubles (see [[graft.functions.Exact]]), and column names identical
  * between the Spark plan and the oracle SQL.
  */
final case class QueryDef(
    name: String,
    build: Tables => DataFrame,
    oracle: Option[String] = None)
