package graft.etl

import org.apache.spark.sql.DataFrame

/** Physical-layout writers (SURVEY.md §4: the reference's secondary
  * indexes map to partitioning + bucketing in Spark). These are the two
  * layout decisions that matter at 100 TB:
  *
  *  - **Date-partitioned facts**: `fact/year=1997/...` directories give
  *    Catalyst partition PRUNING — a year-bounded query never lists,
  *    let alone reads, other years (the reference's `dim_time` index).
  *  - **Bucketed co-location**: both sides of a recurring join bucketed
  *    on the join key with the same bucket count join with NO exchange —
  *    the shuffle is paid once at write time instead of per query (the
  *    reference's point-lookup indexes on business_id/user_id).
  */
object Layout {

  /** Write a fact partitioned by a derived year column. */
  def writePartitionedByYear(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("part_year", org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col(dateCol)))
      .write.mode("overwrite")
      .partitionBy("part_year")
      .parquet(path)

  /** Save as a bucketed (+ in-bucket sorted) table in the session
    * catalog. Both sides of a co-located join must use the same
    * `buckets` count and key. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
