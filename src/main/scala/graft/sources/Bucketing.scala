package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffled, co-located storage for the
  * repeated fact↔fact joins a warehouse runs every hour.
  *
  * A 100 TB `lineitem` ⋈ `orders` on the order key shuffles BOTH sides
  * on every query. Writing each side bucketed (hash-partitioned into the
  * same bucket count, sorted within buckets) pays that shuffle ONCE at
  * load time; every subsequent join with matching keys reads co-located
  * buckets and sort-merges with NO exchange on either side —
  * `BucketingPlanAuditSpec` asserts the exchange-free plan. This is the
  * same load-then-query trade the reference makes with its MySQL primary
  * keys (init/mysql_loader.py builds keyed tables once, every dashboard
  * query reuses the layout); Spark's equivalent is the bucket spec in
  * the table catalog.
  *
  * Bucket-count choice at scale: buckets are the unit of read
  * parallelism AND the file fan-out per writing task — pick
  * `totalSize / targetFileSize` rounded to a power of two (e.g. 100 TB /
  * 512 MB ≈ 200 k is too many files per writer, so bucket on the
  * COARSEST join-relevant key set and let AQE coalesce small reads).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Both sides
    * of a co-located join must use the SAME `buckets` count and key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket specs Catalyst plans a sort-merge join whose children are
    * bare bucket scans — zero Exchange.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
