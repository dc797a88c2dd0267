package graft.sources

import org.apache.spark.sql.SparkSession

/** Per-file (min, max) column ranges read from parquet FOOTERS — no
  * data pages touched: the same per-file stats a transactional format
  * (Delta/Iceberg) keeps in its commit log, read from the files
  * themselves since plain parquet has no log. Used by the pruned merge
  * (EventStore.mergeSummaryPruned) to decide which files a delta
  * actually touches.
  *
  * `None` when a file carries no usable stats — zero row groups (Spark
  * writes a schema-only file for an empty DataFrame), a missing column
  * chunk, or absent/all-null statistics — and callers must treat the
  * file as a conservative HIT (rewrite it) rather than crash: stats are
  * an optimization, never a correctness dependency.
  *
  * Strict per-block: ONE stat-less row group makes the whole file's
  * range unknown (a partial range would under-cover and wrongly carry a
  * file that holds delta keys in the stat-less block).
  *
  * For string (BINARY/UTF8) columns the returned values are BOUNDS, not
  * necessarily exact extrema: parquet-mr may truncate binary stats, but
  * truncation preserves bound direction (a truncated min is a prefix,
  * hence ≤ the true min; a truncated max gets its last byte bumped,
  * hence ≥ the true max) — so intersection tests may over-hit, never
  * under-hit.
  */
object ParquetFooterStats {

  /** (min, max) of an INT64 column across all row groups. */
  def longRange(spark: SparkSession, file: java.nio.file.Path,
                column: String): Option[(Long, Long)] =
    longRanges(spark.sessionState.newHadoopConf(), file, Seq(column)).get(column)

  /** (min, max) for several columns with ONE footer open (the write-time
    * stats harvest [[TxTable]] runs per commit — per-column opens would
    * multiply the footer I/O by the column count). Only columns whose
    * parquet primitive is INT64 and whose every row group carries
    * non-null stats appear in the result (INT96 timestamps and
    * stat-less blocks are skipped, not crashed on — absent means
    * "conservative hit" to every consumer). */
  def longRanges(conf: org.apache.hadoop.conf.Configuration,
                 file: java.nio.file.Path,
                 columns: Seq[String]): Map[String, (Long, Long)] = {
    if (columns.isEmpty) return Map.empty
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.toArray
        .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData])
      if (blocks.isEmpty) return Map.empty
      columns.flatMap { c =>
        val perBlock = blocks.map { b =>
          b.getColumns.toArray
            .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
            .find(m => m.getPath.toDotString == c &&
              m.getPrimitiveType.getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
            .map(_.getStatistics)
            .collect { case s if s != null && !s.isEmpty && s.hasNonNullValue => s }
        }
        if (perBlock.exists(_.isEmpty)) None
        else {
          val stats = perBlock.map(_.get)
          Some(c -> (
            stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue()).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue()).max))
        }
      }.toMap
    } finally r.close()
  }

}
