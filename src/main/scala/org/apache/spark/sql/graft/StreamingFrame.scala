package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{DataFrame, SparkSession}

/** Bridge to `SparkSession.internalCreateDataFrame(_, _, isStreaming =
  * true)` — `private[sql]`, so reachable only from inside the
  * `org.apache.spark.sql` package tree (the same access pattern every
  * external DSv1 streaming connector uses, Delta's included: a v1
  * `Source.getBatch` must return a frame MARKED streaming or
  * `MicroBatchExecution` rejects it, and no public API sets the flag).
  * The returned frame executes the input's physical plan as its RDD, so
  * the batch keeps its pushdown/pruning; downstream ops simply can't
  * push FURTHER into it — the boundary every streaming source has. */
object StreamingFrame {
  def mark(spark: SparkSession, df: DataFrame): DataFrame =
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)

  /** The sink-side inverse: a v1 `Sink.addBatch` receives a frame
    * MARKED streaming (batch-DF writers refuse it with "queries with
    * streaming sources must be executed with writeStream"); re-wrapping
    * its already-planned physical RDD as a batch frame lets the sink
    * reuse the ordinary write path — Delta's DeltaSink executes the
    * incoming plan the same way. */
  def unmark(spark: SparkSession, df: DataFrame): DataFrame =
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
}
