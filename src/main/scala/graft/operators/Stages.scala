package graft.operators

import java.nio.file.{Files, Path, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped stage registry: the ONE place in-session staging state
  * (materialized pair frames, built index directories) lives, keyed by a
  * STABLE session identifier and droppable.
  *
  * Why this exists: the query families stage expensive results once per
  * (session, dataset) — verified near-dup pairs, IVF-PQ index dirs — so
  * downstream queries consume a built artifact instead of re-mining
  * (the production shape: at 100 TB these are parquet staging tables /
  * FAISS index files with explicit lifecycle). The first cut keyed them
  * on `System.identityHashCode(session)`, which (a) can alias a NEW
  * session after the old one is GC'd — handing it a stale frame whose
  * checkpoint blocks no longer exist, an unrecoverable failure because
  * lineage was truncated — and (b) had no release path, so repeated
  * build/teardown cycles leaked RDD blocks and temp directories for the
  * JVM's lifetime. This registry fixes both: `sessionUUID` keys (unique
  * per session object, never reused) and `drop(session)` / `dropAll()`
  * releasing blocks and directories, wired into Bench/Verify teardown.
  */
object Stages {

  private final case class Key(session: String, name: String)

  /** Staged frames: the served frame plus the checkpointed RDD handle
    * that owns its blocks (the drop path needs the RDD — a localCheckpoint
    * survives `catalog.clearCache` precisely because its blocks are NOT
    * cacheManager entries, so only this handle can release them). */
  private val frames = TrieMap.empty[Key, (DataFrame, RDD[_])]

  /** Staged directories (built index files), deleted on drop. */
  private val dirs = TrieMap.empty[Key, Path]

  // Backstop for processes that never call drop (shared test JVMs, a
  // crashed harness): stage directories must not outlive the JVM.
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    try dirs.values.foreach(deleteRec) catch { case _: Throwable => () }))

  /** Stable per-session-object identifier: `sessionUUID` is assigned at
    * session construction and never reused, unlike an identity hash
    * which the JVM may recycle after GC. */
  private def sid(spark: SparkSession): String =
    // `sessionUUID` is public in bytecode but `private[sql]` to the
    // Scala compiler, hence the reflective call; the fallback key
    // (appId + identity hash) is strictly better than identity hash
    // alone because the appId changes with the context.
    try spark.getClass.getMethod("sessionUUID").invoke(spark).asInstanceOf[String]
    catch { case _: Throwable =>
      spark.sparkContext.applicationId + ":" + System.identityHashCode(spark)
    }

  /** Materialize `build` ONCE per (session, `name`) as a lineage-cut
    * in-session staging table and serve the cached frame thereafter.
    * The plan is evaluated eagerly, checkpointed at RDD level (blocks
    * survive `catalog.clearCache`, exactly like the parquet staging
    * table this becomes at 100 TB), and registered for [[drop]].
    *
    * `build` receives a buffer for intermediate persist handles: they
    * are unpersisted as soon as the stage is materialized (they must
    * stay cached THROUGH materialization — the pipeline reads them —
    * but not a moment longer). */
  def frame(spark: SparkSession, name: String)
           (build: scala.collection.mutable.ArrayBuffer[DataFrame] => DataFrame): DataFrame =
    frames.getOrElseUpdate(Key(sid(spark), name), {
      val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val df = build(caches)
      // InternalRow-level checkpoint (not Dataset.localCheckpoint): the
      // Dataset variant hides the persisted RDD inside a LogicalRDD
      // private to Spark, leaving no public handle to unpersist — the
      // pin keeps the owner of the blocks in OUR hands and serves the
      // stored UnsafeRows back without a Row round-trip.
      val (out, rdd) =
        org.apache.spark.sql.graft.InternalCheckpoint.pin(spark, df)
      rdd.count() // eager: truncate lineage NOW, while inputs are cached
      caches.foreach(_.unpersist())
      (out, rdd)
    })._1

  /** Build a stage DIRECTORY once per (session, `name`): a fresh temp
    * dir handed to `build`, then served until dropped. */
  def tempDir(spark: SparkSession, name: String)(build: String => Unit): String =
    dirs.getOrElseUpdate(Key(sid(spark), name), {
      val d = Files.createTempDirectory("graft_stage_")
      build(d.toString)
      d
    }).toString

  /** A NEVER-memoized stage directory: registered for cleanup like
    * [[tempDir]] (under a unique name) but rebuilt on every call — for
    * lifecycle queries whose bench number must include the build. */
  def freshDir(spark: SparkSession, name: String): String = {
    val d = Files.createTempDirectory("graft_stage_")
    dirs.put(Key(sid(spark), name + "#" + java.util.UUID.randomUUID()), d)
    d.toString
  }

  /** Release everything staged by `spark`: unpersist checkpoint blocks,
    * delete built directories, forget the entries. */
  def drop(spark: SparkSession): Unit = dropWhere(_.session == sid(spark))

  /** Release every stage in the JVM (test/process teardown). */
  def dropAll(): Unit = dropWhere(_ => true)

  private def dropWhere(p: Key => Boolean): Unit = {
    frames.keys.filter(p).foreach { k =>
      frames.remove(k).foreach { case (_, rdd) =>
        try rdd.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
    dirs.keys.filter(p).foreach { k =>
      dirs.remove(k).foreach(deleteRec)
    }
  }

  /** Registered entries for a session (exposed for the lifecycle spec). */
  private[graft] def liveCounts(spark: SparkSession): (Int, Int) = {
    val s = sid(spark)
    (frames.keys.count(_.session == s), dirs.keys.count(_.session == s))
  }

  // One recursive-delete implementation repo-wide: TxTable owns it
  // (stream-closing, deepest-first).
  private def deleteRec(p: Path): Unit = graft.sources.TxTable.deleteRec(p)
}
