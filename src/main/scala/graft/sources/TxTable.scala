package graft.sources

import java.nio.file.{Files, FileAlreadyExistsException, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** TxTable: a minimal manifest-log table format over plain parquet —
  * the Delta/Iceberg commit-log pattern reduced to exactly what this
  * engine needs to reproduce the reference's TRANSACTIONAL semantics.
  * The reference gets atomicity and isolation for free from InnoDB
  * (`ON DUPLICATE KEY UPDATE` runs inside a transaction,
  * reference init/mysql_loader.py:1044-1057); the engine's parquet
  * stores had single-writer atomicity (EventStore.swapIn's
  * write-tmp-then-move) but no reader snapshot pinning and no
  * concurrent-writer safety. This closes that gap without any table-
  * format jar:
  *
  * Layout: `dir/data/<uuid>/part-*.parquet` — one immutable data
  * directory per commit — and `dir/_log/v<zero-padded>.commit` — a JSON
  * manifest (schema DDL + the data directories visible at that
  * version). A version EXISTS iff its commit file does.
  *
  * Guarantees (single filesystem with atomic create-exclusive — local
  * POSIX here; object stores need a conditional-put, which is exactly
  * what Delta requires of its log store too):
  *  - **Atomic commits.** Data directories are fully written BEFORE the
  *    commit file is created with `Files.createFile` (create-exclusive).
  *    A crash in between leaves orphan data invisible to every reader;
  *    [[vacuum]] reclaims it.
  *  - **Snapshot isolation.** [[read]] resolves the file list once; the
  *    returned frame scans those literal paths forever after,
  *    regardless of later commits (old versions' files are never
  *    touched except by [[vacuum]]) — a reader mid-query never sees a
  *    torn or shifting table.
  *  - **Serialized writers.** The next version number is CLAIMED by the
  *    atomic create: of two concurrent committers exactly one wins;
  *    the loser's data is cleaned up and [[ConcurrentCommitException]]
  *    thrown. [[merge]] wraps the optimistic retry loop (read snapshot
  *    → transform → commit-if-unchanged), which is the transactional
  *    upsert — MySQL's `ON DUPLICATE KEY UPDATE` replayed at table
  *    granularity with optimistic instead of lock-based concurrency.
  */
object TxTable {

  final case class Snapshot(version: Long, schemaDdl: String, dirs: Seq[String])

  final class ConcurrentCommitException(version: Long)
    extends RuntimeException(
      s"version $version was committed concurrently; re-read and retry")

  private def logDir(dir: String) = Paths.get(dir, "_log")
  private def commitFile(dir: String, v: Long): Path =
    logDir(dir).resolve(f"v$v%016d.commit")

  /** Create an empty table (version 0, no data files). */
  def init(spark: SparkSession, dir: String, schema: StructType): Unit = {
    Files.createDirectories(logDir(dir))
    Files.createDirectories(Paths.get(dir, "data"))
    writeCommit(commitFile(dir, 0L), schema.toDDL, Seq.empty)
  }

  /** Latest committed snapshot. A just-claimed version's manifest is
    * moved into place an instant after the claim (see [[writeCommit]]);
    * a reader landing inside that window spins briefly — the only
    * alternative primitive, rename-without-replace, is NOT atomic-
    * exclusive on POSIX (rename(2) silently replaces), so the claim
    * must stay a create-exclusive. */
  def snapshot(dir: String): Snapshot = {
    val latest = Files.list(logDir(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".commit"))
      .map(n => n.stripPrefix("v").stripSuffix(".commit").toLong)
      .max
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    var attempt = 0
    while (true) {
      val json = Files.readString(commitFile(dir, latest))
      try {
        val m = org.json4s.jackson.JsonMethods.parse(json)
        return Snapshot(latest,
          (m \ "schema").extract[String],
          (m \ "dirs").extract[Seq[String]])
      } catch { case e: Throwable =>
        attempt += 1
        if (attempt > 100) throw new IllegalStateException(
          s"commit v$latest unreadable after ${attempt} attempts", e)
        Thread.sleep(10)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The table AT `snap`: scans the snapshot's literal paths, immune to
    * later commits (snapshot isolation by construction). */
  def read(spark: SparkSession, dir: String, snap: Snapshot): DataFrame = {
    val schema = StructType.fromDDL(snap.schemaDdl)
    if (snap.dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(snap.dirs.map(d => s"$dir/data/$d"): _*)
  }

  /** The table at its latest version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, snapshot(dir))

  /** Commit `df` as version `expected.version + 1`, REPLACING the table
    * contents (pass `keepExisting = true` for an append). Throws
    * [[ConcurrentCommitException]] — after cleaning up its data — if
    * another writer claimed the version first. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             expected: Snapshot, keepExisting: Boolean = false): Snapshot = {
    val u = UUID.randomUUID().toString
    df.write.parquet(s"$dir/data/$u")
    val dirs = (if (keepExisting) expected.dirs else Seq.empty) :+ u
    val next = expected.version + 1
    try writeCommit(commitFile(dir, next), df.schema.toDDL, dirs)
    catch { case _: FileAlreadyExistsException =>
      deleteRec(Paths.get(dir, "data", u)) // lost the race: our data never became visible
      throw new ConcurrentCommitException(next)
    }
    Snapshot(next, df.schema.toDDL, dirs)
  }

  def append(spark: SparkSession, dir: String, df: DataFrame): Snapshot =
    retrying(dir)(s => commit(spark, dir, df, s, keepExisting = true))

  def overwrite(spark: SparkSession, dir: String, df: DataFrame): Snapshot =
    retrying(dir)(s => commit(spark, dir, df, s))

  /** Optimistic read-modify-write: `transform` sees a CONSISTENT
    * snapshot; the result commits only if that snapshot is still
    * current, else the loop re-reads and re-applies — the upsert/merge
    * transaction (`ON DUPLICATE KEY UPDATE`'s semantics with optimistic
    * concurrency). `transform` must be a pure function of its input. */
  def merge(spark: SparkSession, dir: String)
           (transform: DataFrame => DataFrame): Snapshot =
    retrying(dir) { s =>
      // Materialize BEFORE committing: the transform may read the very
      // files the commit supersedes, and a lazy plan evaluated after a
      // concurrent vacuum could lose them (same reason EventStore
      // checkpoints batches before store mutation).
      commit(spark, dir, transform(read(spark, dir, s)).localCheckpoint(), s)
    }

  private def retrying(dir: String)(body: Snapshot => Snapshot): Snapshot = {
    while (true) {
      try return body(snapshot(dir))
      catch { case _: ConcurrentCommitException => () } // re-read, retry
    }
    throw new IllegalStateException("unreachable")
  }

  /** Delete data directories not referenced by the newest `keepLast`
    * manifests (and drop older manifests): reclaims crash orphans and
    * superseded versions. Readers pinned to vacuumed versions fail on
    * next scan — the documented time-travel limit, as in Delta. */
  def vacuum(dir: String, keepLast: Int = 1): Unit = {
    val versions = Files.list(logDir(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".commit"))
      .map(n => n.stripPrefix("v").stripSuffix(".commit").toLong)
      .toSeq.sorted
    val keep = versions.takeRight(keepLast)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val live = keep.flatMap { v =>
      (org.json4s.jackson.JsonMethods.parse(Files.readString(commitFile(dir, v)))
        \ "dirs").extract[Seq[String]]
    }.toSet
    Files.list(Paths.get(dir, "data")).iterator().asScala
      .filter(p => !live.contains(p.getFileName.toString))
      .foreach(deleteRec)
    versions.dropRight(keepLast).foreach(v => Files.delete(commitFile(dir, v)))
  }

  private def writeCommit(path: Path, schemaDdl: String, dirs: Seq[String]): Unit = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val json = org.json4s.jackson.Serialization.write(
      Map("schema" -> schemaDdl, "dirs" -> dirs))
    // create-exclusive claims the version; write content after. Readers
    // tolerate the (microscopic) window by re-reading an empty/partial
    // commit's predecessor? No — keep it simple and correct: write to a
    // temp name, then ATOMIC_MOVE onto the claimed file, so a reader
    // never observes a half-written manifest.
    Files.createFile(path) // atomic claim; throws if the version exists
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
