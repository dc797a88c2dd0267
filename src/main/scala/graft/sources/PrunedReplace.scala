package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generalized stats-pruned keyed REPLACE over a [[TxTable]] — the
  * execution shape of Delta's `MERGE INTO` at scale, factored out of
  * the summary-specific merge (EventStore.mergeSummaryPruned) so every
  * keyed derived table gets it: only the files whose manifest key
  * range intersects the touched keys are read and rewritten; every
  * other file carries into the new version byte-identical (a metadata
  * entry on a transactional format; a file copy here). Planning reads
  * ONE in-memory manifest ([[TxTable.dataFiles]]) — no footer opens
  * except the pre-stats fallback.
  *
  * At 100 TB the replaced key set of an incremental maintenance step
  * is delta-bounded (thousands) while the table holds millions of
  * range-clustered files — the hit set is proportional to the keys,
  * not the table, which is the difference between an hourly ingest
  * rewriting gigabytes and one rewriting the world.
  */
object PrunedReplace {

  /** Commit `(table where keyCol ∉ removeKeys) ∪ upserts` as one new
    * version. `removeKeys` must be driver-bounded (delta-scale — the
    * caller guards and falls back to a full rewrite above its bound);
    * files without usable stats rewrite conservatively. Single-writer,
    * like every pruned maintenance path here ([[TxTable.merge]] is the
    * contention-safe full-rewrite variant) — and the single-writer
    * assumption is ENFORCED, not trusted: the commit claims exactly the
    * version after the planning snapshot, so a commit racing in between
    * surfaces as [[TxTable.ConcurrentCommitException]] instead of being
    * silently dropped from the replacing manifest (a lost update).
    * Returns (rewrittenFiles, totalFiles).
    */
  /** A fully-staged (not yet visible) replace: everything is on disk —
    * rewritten rows and byte-identical carries in one staged dir —
    * and [[commit]] is a single atomic manifest claim. Multi-table
    * maintenance stages ALL its tables first and then claims
    * back-to-back, keeping the crash window to the claims themselves
    * instead of spanning the job pipeline.
    *
    * `expected` pins the planning snapshot the staged contents derive
    * from — [[commit]] fails loudly past it (see object doc);
    * `carriedStats` remaps the prior manifest's per-file stats onto the
    * carried files' staged names, so commit-time footer harvesting
    * touches only freshly WRITTEN files (stats are computed once, at
    * first write, and ride the manifest thereafter — carried files
    * whose prior version recorded none stay conservative hits until a
    * compaction rewrites them). */
  final case class Staged(dir: String, uuid: String,
                          schema: StructType,
                          rewrittenFiles: Long, totalFiles: Long,
                          expected: TxTable.Snapshot,
                          carriedStats: Map[String, Map[String, (Long, Long)]] = Map.empty) {
    def commit(): Unit = {
      TxTable.commitStagedFrom(dir, uuid, schema, expected,
        knownStats = carriedStats,
        harvestExclude = _.startsWith("carry-"))
      ()
    }
  }

  def replaceKeys(spark: SparkSession, dir: String, keyCol: String,
                  removeKeys: Array[Long], upserts: DataFrame): (Long, Long) =
    replaceWith(spark, dir, keyCol, removeKeys)(_ => upserts)

  def replaceWith(spark: SparkSession, dir: String, keyCol: String,
                  removeKeys: Array[Long])
                 (upsertsFor: DataFrame => DataFrame): (Long, Long) = {
    val st = stageReplaceWith(spark, dir, keyCol, removeKeys)(upsertsFor)
    st.commit()
    (st.rewrittenFiles, st.totalFiles)
  }

  /** [[replaceKeys]] with the replacement rows DERIVED from the hit
    * files' rows: `upsertsFor` receives exactly the rows of the files
    * being rewritten (never the whole table — the pruning applies to
    * the derivation read too) and returns the rows that replace the
    * removed keys. This is the arithmetic-merge hook: an upsert that
    * must combine old and new values per key reads only hit rows.
    * This staged form materializes everything without committing.
    */
  def stageReplaceWith(spark: SparkSession, dir: String, keyCol: String,
                       removeKeys: Array[Long])
                      (upsertsFor: DataFrame => DataFrame): Staged = {
    val snap = TxTable.snapshot(dir)
    val keys = removeKeys.distinct.sorted
    val files = TxTable.dataFiles(dir, snap)
    // Per file: manifest stats, the key range that decided the hit test
    // (manifest first, footer as the pre-stats fallback — a fallback
    // read is kept and remapped below, upgrading pre-stats files into
    // the manifest for free), and the hit verdict.
    val annotated = files.map { case (f, st) =>
      val keyRange = st.get(keyCol).orElse(ParquetFooterStats.longRange(spark, f, keyCol))
      val isHit = keys.nonEmpty && (keyRange match {
        case Some((lo, hi)) =>
          // any removed key in [lo, hi]? (keys sorted — binary search)
          val i = java.util.Arrays.binarySearch(keys, lo)
          val from = if (i >= 0) i else -i - 1
          from < keys.length && keys(from) <= hi
        case None => true // no usable stats → conservative rewrite
      })
      (f, st, keyRange, isHit)
    }
    val hit = annotated.filter(_._4).map(a => (a._1, a._2))
    val carry = annotated.filterNot(_._4).map(a => (a._1, a._2 ++ a._3.map(keyCol -> _)))
    val schema = StructType.fromDDL(snap.schemaDdl)
    val hitRows =
      if (hit.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).parquet(hit.map(_._1.toString): _*)
    val rewritten =
      if (hit.isEmpty) upsertsFor(hitRows)
      else {
        val keysDf = spark.createDataset(keys.toSeq)(
          org.apache.spark.sql.Encoders.scalaLong).toDF(keyCol)
        hitRows.join(broadcast(keysDf), Seq(keyCol), "left_anti")
          .unionByName(upsertsFor(hitRows))
      }
    // Stage: rewritten rows + byte-identical carries become one
    // invisible data dir; the caller's commit() is the single atomic
    // manifest claim. Carried files KEEP their prior manifest stats
    // under their staged names — commit harvests footers only for the
    // freshly written part files.
    val u = TxTable.stage(dir, rewritten)
    val staged = Paths.get(TxTable.stagedPath(dir, u))
    val carriedStats = carry.zipWithIndex.flatMap { case ((f, st), i) =>
      val name = s"carry-$i-${f.getFileName}"
      Files.copy(f, staged.resolve(name), StandardCopyOption.COPY_ATTRIBUTES)
      if (st.isEmpty) None else Some(s"$u/$name" -> st)
    }.toMap
    Staged(dir, u, rewritten.schema, hit.size.toLong, files.size.toLong,
      snap, carriedStats)
  }
}
