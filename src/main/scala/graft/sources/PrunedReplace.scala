package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generalized stats-pruned keyed REPLACE over a [[TxTable]] — the
  * execution shape of Delta's `MERGE INTO` at scale, factored out of
  * the summary-specific merge (EventStore.mergeSummaryPruned) so every
  * keyed derived table gets it: only the files whose manifest key
  * range intersects the touched keys are read and rewritten; every
  * other file carries into the new version BY REFERENCE — the commit
  * keeps its dir and lists the superseded files as removed
  * ([[TxTable.Snapshot.excludes]], Delta's add/remove-file actions) —
  * so a replace's I/O is O(rewritten files), never an O(table) copy.
  * Planning reads ONE in-memory manifest ([[TxTable.dataFiles]]) — no
  * footer opens except the pre-stats fallback.
  *
  * Keys may be LONG or STRING (the reference's natural keys are
  * VARCHAR — star_schema.sql:28-29 — so a business_id-keyed derived
  * table prunes exactly like a numeric one). String bounds live in the
  * manifest's `sstats` block and compare in parquet's unsigned-UTF-8
  * byte order ([[ParquetFooterStats.Utf8Ordering]]); truncated binary
  * stats are valid bounds, so pruning may over-hit, never under-hit.
  *
  * At 100 TB the replaced key set of an incremental maintenance step
  * is delta-bounded (thousands) while the table holds millions of
  * range-clustered files — the hit set is proportional to the keys,
  * not the table, which is the difference between an hourly ingest
  * rewriting gigabytes and one rewriting the world.
  *
  * Single-writer, like every pruned maintenance path here
  * ([[TxTable.merge]] is the contention-safe full-rewrite variant) —
  * and the single-writer assumption is ENFORCED, not trusted: the
  * commit claims exactly the version after the planning snapshot, so a
  * commit racing in between surfaces as
  * [[TxTable.ConcurrentCommitException]] instead of being silently
  * dropped from the replacing manifest (a lost update).
  */
object PrunedReplace {

  /** A fully-staged (not yet visible) replace: the REWRITTEN rows are
    * on disk in one staged dir, untouched files stay exactly where
    * they are (carried BY REFERENCE — the commit's manifest keeps their
    * dirs and lists the superseded files in `removeFiles`, Delta's
    * add/remove-file commit), and [[commit]] is a single atomic
    * manifest claim. Multi-table maintenance stages ALL its tables
    * first and then claims back-to-back, keeping the crash window to
    * the claims themselves instead of spanning the job pipeline.
    *
    * `expected` pins the planning snapshot the staged contents derive
    * from — [[commit]] fails loudly past it (see object doc);
    * `upgradedStats`/`upgradedSStats` are footer-fallback ranges read
    * during planning for carried files the manifest had no stats for,
    * merged in under their ORIGINAL file keys (pre-stats files upgrade
    * into the manifest for free; commit-time footer harvesting touches
    * only freshly written files). `carryDirs = false` is the
    * whole-table replace (the staged dir IS the table — the over-bound
    * fallback's shape). */
  final case class Staged(dir: String, uuid: String,
                          schema: StructType,
                          rewrittenFiles: Long, totalFiles: Long,
                          expected: TxTable.Snapshot,
                          removeFiles: Map[String, Seq[String]] = Map.empty,
                          upgradedStats: Map[String, Map[String, (Long, Long)]] = Map.empty,
                          upgradedSStats: Map[String, Map[String, (String, String)]] = Map.empty,
                          carryDirs: Boolean = false,
                          stagedBlooms: Map[String, Seq[String]] = Map.empty) {
    /** `dkeysOverride`: replace (rather than carry) the committed
      * version's tombstone block — TxTable.foldDeletes clears a folded
      * column's entry in the SAME claim that makes its deletes
      * physical (two commits would leave a window where the mask is
      * gone but the rows are back).
      *
      * `rewriteOnly`: mark the commit as LAYOUT-ONLY in the manifest —
      * its staged dir holds only rows already visible at `expected`
      * (a fold/compaction), never new or changed data, so the change
      * feed can skip it instead of failing the append-only check. A
      * caller whose staged rows CHANGE data (any real upsert) must
      * leave this false: a lying marker silently corrupts every
      * downstream feed consumer. */
    def commit(dkeysOverride: Option[Map[String, Seq[String]]] = None,
               rewriteOnly: Boolean = false): Unit = {
      TxTable.commitStagedFrom(dir, uuid, schema, expected,
        knownStats = upgradedStats, knownSStats = upgradedSStats,
        carryDirs = carryDirs, removeFiles = removeFiles,
        knownBlooms = stagedBlooms, dkeysOverride = dkeysOverride,
        rewriteOnly = rewriteOnly)
      ()
    }
  }

  /** Commit `(table where keyCol ∉ removeKeys) ∪ upserts` as one new
    * version. `removeKeys` must be driver-bounded (delta-scale — the
    * caller guards and falls back to a full rewrite above its bound);
    * files without usable stats rewrite conservatively. Returns
    * (rewrittenFiles, totalFiles). */
  def replaceKeys(spark: SparkSession, dir: String, keyCol: String,
                  removeKeys: Array[Long], upserts: DataFrame): (Long, Long) =
    replaceWith(spark, dir, keyCol, removeKeys)(_ => upserts)

  /** [[replaceKeys]] on a STRING key column. */
  def replaceStringKeys(spark: SparkSession, dir: String, keyCol: String,
                        removeKeys: Array[String], upserts: DataFrame): (Long, Long) = {
    val st = stageReplaceWithStringKeys(spark, dir, keyCol, removeKeys)(_ => upserts)
    st.commit()
    (st.rewrittenFiles, st.totalFiles)
  }

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
                      (upsertsFor: DataFrame => DataFrame): Staged =
    stageImpl[Long](spark, dir, keyCol, removeKeys,
      new Keyed[Long] {
        val ord = Ordering.Long
        def manifestRange(l: Map[String, (Long, Long)],
                          s: Map[String, (String, String)]) = l.get(keyCol)
        def footerRange(f: Path) = ParquetFooterStats.longRange(spark, f, keyCol)
        def remap(l: Map[String, (Long, Long)], s: Map[String, (String, String)],
                  kr: Option[(Long, Long)]) = (l ++ kr.map(keyCol -> _), s)
        def keysDf(keys: Seq[Long]) = spark.createDataset(keys)(
          org.apache.spark.sql.Encoders.scalaLong).toDF(keyCol)
        def mightContain(bf: org.apache.spark.util.sketch.BloomFilter, k: Long) =
          bf.mightContainLong(k)
      })(upsertsFor)

  /** [[stageReplaceWith]] on a STRING key column: hit tests run against
    * the manifest's `sstats` bounds in UTF-8 byte order. */
  def stageReplaceWithStringKeys(spark: SparkSession, dir: String, keyCol: String,
                                 removeKeys: Array[String])
                                (upsertsFor: DataFrame => DataFrame): Staged =
    stageImpl[String](spark, dir, keyCol, removeKeys,
      new Keyed[String] {
        val ord = ParquetFooterStats.Utf8Ordering
        def manifestRange(l: Map[String, (Long, Long)],
                          s: Map[String, (String, String)]) = s.get(keyCol)
        def footerRange(f: Path) = ParquetFooterStats.stringRange(spark, f, keyCol)
        def remap(l: Map[String, (Long, Long)], s: Map[String, (String, String)],
                  kr: Option[(String, String)]) = (l, s ++ kr.map(keyCol -> _))
        def keysDf(keys: Seq[String]) = spark.createDataset(keys)(
          org.apache.spark.sql.Encoders.STRING).toDF(keyCol)
        def mightContain(bf: org.apache.spark.util.sketch.BloomFilter, k: String) =
          bf.mightContainString(k)
      })(upsertsFor)

  /** Key-type plumbing for [[stageImpl]]: where the key's bounds live
    * in the manifest, how to read them from a footer, how a fallback
    * range is remapped back into carried stats, and how the removed
    * keys become a broadcastable frame. */
  private trait Keyed[K] {
    def ord: Ordering[K]
    def manifestRange(l: Map[String, (Long, Long)],
                      s: Map[String, (String, String)]): Option[(K, K)]
    def footerRange(f: Path): Option[(K, K)]
    def remap(l: Map[String, (Long, Long)], s: Map[String, (String, String)],
              kr: Option[(K, K)]): (Map[String, (Long, Long)], Map[String, (String, String)])
    def keysDf(keys: Seq[K]): DataFrame
    def mightContain(bf: org.apache.spark.util.sketch.BloomFilter, k: K): Boolean
  }

  private def stageImpl[K: scala.reflect.ClassTag](
      spark: SparkSession, dir: String, keyCol: String,
      removeKeys: Array[K], ko: Keyed[K])
     (upsertsFor: DataFrame => DataFrame): Staged = {
    val snap = TxTable.snapshot(dir)
    val keys = removeKeys.distinct.sorted(ko.ord)
    // ONE directory enumeration pairing long and string bounds per file
    // (two listings zipped positionally could misalign under a
    // concurrent vacuum — a file tested against another's bounds).
    val files = TxTable.dataFilesAll(dir, snap)
    // Per-dir BLOOM refinement of the key set: a key the dir's filter
    // rejects has no row in ANY of that dir's files (no false
    // negatives), so a range overlap with it cannot be a real hit —
    // this is what saves interleaved-but-absent keys (fresh natural
    // keys landing inside existing ranges) from rewriting files for
    // nothing. Partial coverage composes: dirs without a filter keep
    // the full key set. Driver-cheap — |keys| probes per covered dir,
    // and keys are driver-bounded by the operator's contract.
    val dirKeys: Map[String, Array[K]] = snap.dirs.flatMap { d =>
      TxTable.dirBloom(dir, snap, d, keyCol).map { bf =>
        d -> keys.filter(k => ko.mightContain(bf, k)) // stays sorted
      }
    }.toMap
    // Per file: manifest stats, the key range that decided the hit test
    // (manifest first, footer as the pre-stats fallback — a fallback
    // read is kept and remapped below, upgrading pre-stats files into
    // the manifest for free), and the hit verdict.
    val annotated = files.map { case (f, lst, sst) =>
      val fKeys = dirKeys.getOrElse(f.getParent.getFileName.toString, keys)
      val keyRange = ko.manifestRange(lst, sst).orElse(ko.footerRange(f))
      val isHit = fKeys.nonEmpty && (keyRange match {
        case Some((lo, hi)) =>
          // any removed key in [lo, hi]? (keys sorted — binary search)
          val from = TxTable.lowerBound(fKeys, lo, ko.ord)
          from < fKeys.length && ko.ord.lteq(fKeys(from), hi)
        case None => true // no usable stats → conservative rewrite
      })
      (f, lst, sst, keyRange, isHit)
    }
    val hit = annotated.filter(_._5)
    val carry = annotated.filterNot(_._5)
      .map(a => (a._1, ko.remap(a._2, a._3, a._4)))
    val schema = StructType.fromDDL(snap.schemaDdl)
    // Tombstone mask on the hit rows: without it a derive-from-old
    // upsert (mergeSummary's arithmetic) would fold a LOGICALLY DELETED
    // row's values back into its key — resurrection through the merge.
    // Applying it here also physically drops masked rows from every
    // file this replace rewrites anyway (a free partial fold; the
    // commit still carries `dkeys` for the files it didn't touch, and
    // re-masking absent rows is a no-op).
    val hitRows =
      if (hit.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else TxTable.applyDeletes(
        spark.read.schema(schema).parquet(hit.map(_._1.toString): _*), snap)
    val rewritten0 =
      if (hit.isEmpty) upsertsFor(hitRows)
      else hitRows.join(broadcast(ko.keysDf(keys.toSeq)), Seq(keyCol), "left_anti")
        .unionByName(upsertsFor(hitRows))
    // File-count AND clustering stability: the rewrite REPLACES
    // hit.size files, so write about that many — range-clustered on
    // the key. Without this the frame's final-stage partitioning
    // (union of scan splits + shuffle partitions) writes
    // O(spark.sql.shuffle.partitions) shards per replace and a long
    // append stream fragments the table linearly; and a naive coalesce
    // would mix inserts into rewritten files, WIDENING their key
    // ranges so every future replace over-hits. The range shuffle is
    // delta-bounded by the operator's contract (hit rows + upserts),
    // keeps fresh files' ranges tight and disjoint, and the
    // within-partition sort gives their row groups monotone stats —
    // each replace REPAIRS clustering decay instead of compounding it.
    // (+1: inserts beyond the hit ranges get their own tail file.)
    // Restore the table's declared column ORDER before staging: the
    // anti-join above moves keyCol to the first position, and the
    // staged frame's schema becomes the committed DDL — without this
    // select, every replace whose key isn't already first silently
    // reorders the table's columns (reads stay correct — parquet is
    // name-resolved — but the logical schema must not drift under
    // layout maintenance).
    val rewritten = rewritten0
      .select(schema.fieldNames.map(col(_)): _*)
      .repartitionByRange(hit.size + 1, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    // Stage ONLY the rewritten rows; untouched files never move — the
    // commit's manifest keeps their dirs and lists the hit files as
    // removed (carry by REFERENCE: O(rewritten) I/O per replace, where
    // a physical carry is an O(table) copy — at scale, the difference
    // between a merge and a migration). Footer-fallback ranges read
    // during planning for stats-less CARRIED files upgrade into the
    // manifest under their original keys.
    val u = TxTable.stage(dir, rewritten)
    // The fresh dir gets its own Bloom filters when the table registers
    // bloom columns — WITHOUT this, every replace would shrink bloom
    // coverage (carried dirs keep theirs, the new dir has none) and the
    // refinement above plus any all-dirs absence proof would decay to
    // conservative fallbacks after the first replace. One pass over the
    // rewritten rows only — delta-bounded, like the stage write itself.
    val stagedBlooms = {
      val cols = snap.bloomCols.filter(rewritten.schema.fieldNames.contains(_))
      if (cols.isEmpty) Map.empty[String, Seq[String]]
      else {
        val df = spark.read.schema(rewritten.schema)
          .parquet(TxTable.stagedPath(dir, u))
        val n = TxTable.stagedRowCount(dir, u) // footer counts: no count job
        if (n > TxTable.MaxBloomItems) Map.empty[String, Seq[String]]
        else {
          cols.foreach { c =>
            // stat.bloomFilter NPEs on an empty frame; an empty dir's
            // filter is the empty filter (proves every key absent).
            TxTable.preBloom(dir, u, c,
              if (n == 0L)
                org.apache.spark.util.sketch.BloomFilter.create(1L, TxTable.BloomFpp)
              else df.stat.bloomFilter(c, n, TxTable.BloomFpp))
          }
          Map(u -> cols)
        }
      }
    }
    val fileKey = (f: Path) => (f.getParent.getFileName.toString, f.getFileName.toString)
    val removeFiles = hit.map(h => fileKey(h._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val upgraded = carry.map { case (f, stats) => (fileKey(f), stats) }
    Staged(dir, u, rewritten.schema, hit.size.toLong,
      (hit.size + carry.size).toLong, snap,
      removeFiles,
      upgraded.collect { case ((d, n), (lst, _)) if lst.nonEmpty => s"$d/$n" -> lst }.toMap,
      upgraded.collect { case ((d, n), (_, sst)) if sst.nonEmpty => s"$d/$n" -> sst }.toMap,
      carryDirs = true, stagedBlooms = stagedBlooms)
  }
}
