package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession, Dataset => ClassicDataset}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** InternalRow-level pin / lineage cut — the `private[sql]` doorway
  * `Dataset.localCheckpoint` uses internally, exposed with the RDD
  * handle kept in OUR hands (the public Dataset variant hides the
  * persisted RDD inside a LogicalRDD with no release path — the trap
  * Stages.scala documents).
  *
  * Why not `df.rdd.localCheckpoint()` (the previous idiom everywhere):
  * `df.rdd` deserializes every UnsafeRow into an external `Row` —
  * a per-field `CatalystTypeConverters` walk, ruinous for array columns
  * like shingle sets — and every DOWNSTREAM read of the checkpoint pays
  * the inverse conversion back to InternalRow through
  * `spark.createDataFrame(rdd, schema)`'s row encoder. Checkpointing
  * `queryExecution.toRdd` stores the UnsafeRows themselves (one compact
  * byte buffer per row) and serves them back zero-copy; only the
  * defensive `copy()` remains (operators reuse row buffers, so rows
  * must be copied before being stored).
  */
object InternalCheckpoint {

  private def exec(df: DataFrame) =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution

  /** Pin ONE evaluation of `df` as a local checkpoint at the internal
    * row level. Returns the frame serving the pinned rows plus the RDD
    * handle that owns the blocks (unpersist it when done). Lazy like
    * `rdd.localCheckpoint()`: blocks materialize at the first action. */
  def pin(spark: SparkSession, df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val rdd = exec(df).toRdd.map(_.copy()).localCheckpoint()
    (spark.asInstanceOf[ClassicSparkSession].internalCreateDataFrame(rdd, df.schema),
      rdd)
  }

  /** Lineage cut WITHOUT a checkpoint: wrap `df`'s physical RDD as a
    * LogicalRDD so later actions re-analyze one leaf instead of the
    * whole upstream plan. Data still flows from whatever backs `df`
    * (typically its persisted cache) — the caller keeps that cache
    * alive and releases it; nothing new is stored here. */
  def wrap(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[ClassicSparkSession].internalCreateDataFrame(
      exec(df).toRdd.map(_.copy()), df.schema)
}
