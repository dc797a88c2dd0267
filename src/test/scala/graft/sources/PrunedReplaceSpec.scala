package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generalized stats-pruned keyed replace: result semantics
  * (remove ∪ upsert), file-level pruning from manifest stats, and
  * BY-REFERENCE carry of untouched files (manifest add/remove-file
  * entries — a replace's I/O is O(rewritten), never an O(table) copy).
  */
class PrunedReplaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_prep").toString

  /** A table of k → v, range-clustered into `files` files. */
  private def seed(dir: String, n: Int, files: Int): Unit = {
    val df = (1 to n).map(i => (i.toLong, i.toLong * 10)).toDF("k", "v")
      .repartitionByRange(files, col("k")).sortWithinPartitions(col("k"))
    TxTable.init(spark, dir, df.schema)
    TxTable.overwrite(spark, dir, df)
    ()
  }

  private def rows(dir: String): Seq[(Long, Long)] =
    TxTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("replaceKeys = (table minus keys) union upserts, pruned to hit files") {
    val dir = tmp()
    seed(dir, 400, 8) // 8 files of 50 contiguous keys each
    // Replace keys 3 and 7 (both in file 1) with new values, insert 901.
    val up = Seq((3L, 333L), (901L, 901L)).toDF("k", "v")
    val (rewritten, total) = PrunedReplace.replaceKeys(
      spark, dir, "k", Array(3L, 7L), up)
    assert(total == 8L, s"expected 8 files, saw $total")
    assert(rewritten == 1L, s"keys 3,7 live in ONE range file, rewrote $rewritten")
    val got = rows(dir)
    val expect = ((1 to 400).filterNot(i => i == 3 || i == 7)
      .map(i => (i.toLong, i.toLong * 10)) ++ Seq((3L, 333L), (901L, 901L)))
      .sorted
    assert(got == expect)
  }

  test("randomized replaces agree with the reference semantics") {
    val rnd = new scala.util.Random(42)
    val dir = tmp()
    val n = 300
    seed(dir, n, 6)
    // Reference model: a driver-side map, mutated alongside the table.
    val model = scala.collection.mutable.Map((1 to n).map(i => i.toLong -> i.toLong * 10): _*)
    (1 to 5).foreach { _ =>
      val removes = Array.fill(rnd.nextInt(20))(rnd.nextInt(n * 2).toLong + 1)
      val upserts = (1 to rnd.nextInt(10)).map { _ =>
        val k = rnd.nextInt(n * 2).toLong + 1
        (k, rnd.nextLong(1000000))
      }
      // Upserted keys must be in the removed set or brand new (the
      // operator's contract: upserts REPLACE removed keys / insert).
      val allRemoves = (removes ++ upserts.map(_._1).filter(model.contains)).distinct
      PrunedReplace.replaceKeys(spark, dir, "k", allRemoves,
        upserts.toDF("k", "v"))
      allRemoves.foreach(model.remove)
      upserts.foreach { case (k, v) => model(k) = v } // last write wins
      val got = rows(dir).toMap
      // Duplicate upsert keys in one batch: table keeps both rows; the
      // model keeps the last — compare key sets and single-key values.
      assert(got.keySet == model.keySet,
        s"key divergence: extra=${got.keySet -- model.keySet} missing=${model.keySet -- got.keySet}")
    }
  }

  test("a pre-stats manifest falls back to footer pruning, exactly") {
    val dir = tmp()
    seed(dir, 100, 4)
    // Strip the stats blocks from every manifest: the on-disk shape
    // of a log written before stats existed.
    assert(LogSurgery.stripStats(dir), "test setup: no stats to strip")
    // The footer FALLBACK now prunes (ranges still exist in the files
    // themselves): keys 3,7 live in one of four range files.
    val (rewritten, total) = PrunedReplace.replaceKeys(
      spark, dir, "k", Array(3L, 7L), Seq((3L, 33L)).toDF("k", "v"))
    assert(total == 4L && rewritten == 1L,
      s"footer fallback should prune to 1/4 files, got $rewritten/$total")
    val got = rows(dir)
    val expect = ((1 to 100).filterNot(i => i == 3 || i == 7)
      .map(i => (i.toLong, i.toLong * 10)) :+ (3L, 33L)).sorted
    assert(got == expect)
  }

  test("untouched files carry BY REFERENCE; empty keys touch nothing") {
    val dir = tmp()
    seed(dir, 400, 8)
    def livePaths() = TxTable.dataFiles(dir, TxTable.snapshot(dir)).map(_._1).toSet
    val before = livePaths()
    PrunedReplace.replaceKeys(spark, dir, "k", Array(1L), Seq((1L, -1L)).toDF("k", "v"))
    val after = livePaths()
    // 7 of 8 old files survive AT THEIR ORIGINAL PATHS — the carry is a
    // manifest entry, not a copy (O(rewritten) I/O per replace).
    assert(before.intersect(after).size == 7,
      s"carried files must not move: ${before.size} -> ${after.size}, " +
        s"kept ${before.intersect(after).size}")
    // The superseded file is excluded in the manifest, not yet deleted
    // (vacuum's job), and the new version reads correctly around it.
    val snap = TxTable.snapshot(dir)
    assert(snap.excludes.values.flatten.size == 1,
      s"one hit file must be excluded: ${snap.excludes}")
    // Pure insert (no keys): zero rewrites; every current file carries.
    val (rw, _) = PrunedReplace.replaceKeys(
      spark, dir, "k", Array.empty, Seq((902L, 2L)).toDF("k", "v"))
    assert(rw == 0L, s"pure insert rewrote $rw files")
    assert(rows(dir).contains((902L, 2L)))
  }

  test("carried files keep manifest stats; commit harvests only fresh files") {
    val dir = tmp()
    seed(dir, 400, 8)
    val statsBefore = TxTable.snapshot(dir).stats
    PrunedReplace.replaceKeys(spark, dir, "k", Array(3L), Seq((3L, 33L)).toDF("k", "v"))
    val snap = TxTable.snapshot(dir)
    // Carried files keep their ORIGINAL stats entries verbatim (the
    // excluded hit file's entry is dropped as dead weight).
    val keptVerbatim = snap.stats.toSet.intersect(statsBefore.toSet)
    assert(keptVerbatim.size == 7,
      s"7 carried files must keep their stats entries, saw ${keptVerbatim.size}")
    // The carried stats must still prune: a second replace on a key
    // living in one carried file rewrites exactly one file.
    val (rw2, tot2) = PrunedReplace.replaceKeys(
      spark, dir, "k", Array(399L), Seq((399L, 9L)).toDF("k", "v"))
    assert(tot2 >= 8L && rw2 == 1L,
      s"carried stats should prune to 1/$tot2 files, got $rw2")
    // And a pre-stats footer FALLBACK read upgrades carried files into
    // the manifest: strip stats, replace once, and the next manifest
    // has key ranges again (for free, from the fallback's footer reads).
    assert(LogSurgery.stripStats(dir), "test setup: no stats to strip")
    PrunedReplace.replaceKeys(spark, dir, "k", Array(5L), Seq((5L, 55L)).toDF("k", "v"))
    val upgraded = TxTable.snapshot(dir)
    assert(upgraded.stats.count(_._2.contains("k")) >=
      TxTable.dataFiles(dir, upgraded).size - 2,
      s"footer-fallback ranges must re-enter the manifest for carries " +
        s"(${upgraded.stats.size} stats entries for " +
        s"${TxTable.dataFiles(dir, upgraded).size} live files)")
  }

  test("string-keyed replace prunes 1-of-N files via manifest sstats") {
    val dir = tmp()
    // VARCHAR natural keys (the reference's business_id shape):
    // range-clustered so each file covers a contiguous key interval.
    val df = (1 to 400).map(i => (f"id_$i%04d", i.toLong)).toDF("bk", "v")
      .repartitionByRange(8, col("bk")).sortWithinPartitions(col("bk"))
    TxTable.init(spark, dir, df.schema)
    TxTable.overwrite(spark, dir, df)
    assert(TxTable.snapshot(dir).sstats.values.exists(_.contains("bk")),
      "commit must harvest string column bounds into the manifest")
    val up = Seq(("id_0003", 333L), ("id_9999", 1L)).toDF("bk", "v")
    val (rw, tot) = PrunedReplace.replaceStringKeys(
      spark, dir, "bk", Array("id_0003", "id_0007"), up)
    assert(tot == 8L && rw == 1L,
      s"string keys 0003,0007 live in ONE range file, rewrote $rw/$tot")
    val got = TxTable.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val expect = ((1 to 400).filterNot(i => i == 3 || i == 7)
      .map(i => (f"id_$i%04d", i.toLong)) ++ Seq(("id_0003", 333L), ("id_9999", 1L)))
      .sorted
    assert(got == expect)
    // Carried string bounds ride the manifest (no footer re-harvest):
    // a SECOND replace on a carried file's key prunes to that file —
    // plus at most the one fresh file the id_9999 tail insert widened
    // (the balanced range split can't isolate a far outlier; the
    // over-hit rewrite re-clusters it, so the cost is bounded and
    // self-healing, never compounding). Carried entries stay under
    // their original keys — 7 untouched files, by reference.
    val carried = TxTable.dataFilesString(dir, TxTable.snapshot(dir))
      .count { case (_, st) => st.contains("bk") }
    assert(carried >= 8, s"carried+fresh string stats: $carried")
    val (rw2, _) = PrunedReplace.replaceStringKeys(
      spark, dir, "bk", Array("id_0399"), Seq(("id_0399", 9L)).toDF("bk", "v"))
    assert(rw2 <= 2L, s"carried sstats should prune, rewrote $rw2")
  }

  test("Utf8Ordering agrees with parquet's unsigned binary comparator") {
    // The manifest's string bounds are produced under parquet's stats
    // order; every driver-side hit test compares against them with
    // Utf8Ordering. If the two ever disagreed, pruning could skip a
    // file that holds a removed key (silent row loss).
    val samples = Seq("", "a", "ab", "é", "", "￿", "😀", "𝒜", "ب",
      "z￿", "😀a", "a😀", "😀￿")
    val pc = org.apache.parquet.schema.PrimitiveComparator
      .UNSIGNED_LEXICOGRAPHICAL_BINARY_COMPARATOR
    for (a <- samples; b <- samples) {
      val p = pc.compare(
        org.apache.parquet.io.api.Binary.fromString(a),
        org.apache.parquet.io.api.Binary.fromString(b))
      assert(Integer.signum(p) ==
        Integer.signum(ParquetFooterStats.Utf8Ordering.compare(a, b)),
        s"order disagreement on (${a.codePoints().toArray.toSeq}, ${b.codePoints().toArray.toSeq})")
    }
    // And Java's UTF-16 String order genuinely disagrees on these
    // samples — the reason the dedicated ordering exists at all.
    assert(samples.flatMap(a => samples.map(b => (a, b))).exists { case (a, b) =>
      Integer.signum(a.compareTo(b)) !=
        Integer.signum(ParquetFooterStats.Utf8Ordering.compare(a, b))
    }, "sample set no longer exercises the UTF-16/UTF-8 divergence")
  }

  test("string replaces with non-BMP keys never lose rows") {
    val rnd = new scala.util.Random(7)
    val dir = tmp()
    // Keys drawn from the characters where UTF-16 and UTF-8 orders
    // diverge: supplementary (surrogate-pair) code points sort ABOVE
    // ￿ in byte order but BELOW  in UTF-16.
    val alphabet = Vector("a", "z", "é", "", "￿", "😀", "𝒜", "ب")
    def randKey() = (1 to 3).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    val keys0 = (1 to 200).map(_ => randKey()).distinct
    val df = keys0.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
      .repartitionByRange(6, col("k")).sortWithinPartitions(col("k"))
    TxTable.init(spark, dir, df.schema)
    TxTable.overwrite(spark, dir, df)
    val model = scala.collection.mutable.Map(
      keys0.zipWithIndex.map { case (k, i) => k -> i.toLong }: _*)
    (1 to 5).foreach { _ =>
      val removes = (1 to 10).map { _ =>
        if (rnd.nextBoolean() && model.nonEmpty) model.keys.toSeq(rnd.nextInt(model.size))
        else randKey()
      }.distinct
      val upserts = removes.take(4).map(k => (k, rnd.nextLong(1000)))
      val allRemoves = (removes ++ upserts.map(_._1)).distinct.toArray
      PrunedReplace.replaceStringKeys(spark, dir, "k", allRemoves,
        upserts.toDF("k", "v"))
      allRemoves.foreach(model.remove)
      upserts.foreach { case (k, v) => model(k) = v }
      val got = TxTable.read(spark, dir).collect().map(_.getString(0)).toSet
      assert(got == model.keySet,
        s"extra=${got -- model.keySet} missing=${model.keySet -- got}")
    }
  }

  test("bloom refinement: interleaved-but-absent keys rewrite nothing") {
    val dir = tmp()
    // EVEN keys only, range-clustered, with a key Bloom registered.
    val df = (1 to 400).map(i => (i.toLong * 2, i.toLong)).toDF("k", "v")
      .repartitionByRange(8, col("k")).sortWithinPartitions(col("k"))
    TxTable.init(spark, dir, df.schema, bloomCols = Seq("k"))
    TxTable.overwrite(spark, dir, df)
    // ODD keys: inside every file's [min, max] yet absent from the
    // table — range pruning ALONE would rewrite their covering files;
    // the per-dir Bloom proves them out (the fresh-natural-keys-in-
    // range growth case).
    val odd = Array(3L, 101L, 399L, 601L)
    val (rw, tot) = PrunedReplace.replaceKeys(spark, dir, "k", odd,
      odd.toSeq.map(k => (k, -1L)).toDF("k", "v"))
    assert(tot == 8L && rw == 0L,
      s"bloom should prove interleaved keys absent, rewrote $rw/$tot")
    assert(TxTable.read(spark, dir).count() == 404) // 400 + 4 pure inserts
    // Coverage SURVIVES the replace (the staged dir blooms itself), so
    // a second replace still refines: one present key = one file, the
    // absent one proven out.
    val s2 = TxTable.snapshot(dir)
    assert(s2.dirs.forall(d => s2.blooms.getOrElse(d, Nil).contains("k")),
      s"bloom coverage decayed after replace: ${s2.blooms.keySet} vs ${s2.dirs}")
    val (rw2, _) = PrunedReplace.replaceKeys(spark, dir, "k", Array(200L, 7L),
      Seq((200L, 0L)).toDF("k", "v"))
    assert(rw2 == 1L,
      s"present key 200 is one file, absent key 7 bloom-proven: rewrote $rw2")
  }

  test("vacuum reclaims an excluded file once no kept manifest includes it") {
    val dir = tmp()
    seed(dir, 400, 8)
    PrunedReplace.replaceKeys(spark, dir, "k", Array(3L), Seq((3L, 33L)).toDF("k", "v"))
    val snap = TxTable.snapshot(dir)
    val (exDir, exNames) = snap.excludes.head
    val excludedFile = java.nio.file.Paths
      .get(TxTable.stagedPath(dir, exDir)).resolve(exNames.head)
    assert(Files.exists(excludedFile), "excluded file stays on disk until vacuum")
    // keepLast=2 retains the pre-replace manifest, which still INCLUDES
    // the file — a pinned reader of that version needs it.
    TxTable.vacuum(dir, keepLast = 2, orphanRetentionMs = 0L)
    assert(Files.exists(excludedFile),
      "a file included by any kept manifest must survive vacuum")
    // keepLast=1: every kept manifest excludes it → reclaimed, and the
    // live table reads correctly around the hole.
    TxTable.vacuum(dir, keepLast = 1, orphanRetentionMs = 0L)
    assert(!Files.exists(excludedFile),
      "a file excluded by every kept manifest must be reclaimed")
    assert(rows(dir).toMap.apply(3L) == 33L)
    assert(rows(dir).size == 400) // key 3 replaced in place, nothing lost
  }

  test("a replace breaks incremental reads over its range, loudly") {
    val dir = tmp()
    seed(dir, 100, 4)
    val v0 = TxTable.snapshot(dir).version
    PrunedReplace.replaceKeys(spark, dir, "k", Array(3L), Seq((3L, 33L)).toDF("k", "v"))
    // The replaced range removed rows from a surviving dir (manifest
    // exclusion): row-level change attribution is gone, and a change
    // reader must be told — not silently handed the fresh dir's rows
    // as if they were pure appends.
    val e = intercept[IllegalArgumentException] {
      TxTable.readChanges(spark, dir, v0)
    }
    assert(e.getMessage.contains("not append-only"), e.getMessage)
  }

  test("randomized replace/append/vacuum/restore chains match the model") {
    // The excludes machinery under COMPOSITION: replaces remove files
    // from surviving dirs, appends add dirs, vacuum reclaims dead
    // files, restore re-exposes old versions — any interleaving must
    // read back exactly the model. (The focused tests above pin each
    // mechanism; this pins their product.)
    val rnd = new scala.util.Random(1234)
    val dir = tmp()
    val n = 200
    seed(dir, n, 6)
    val model = scala.collection.mutable.Map(
      (1 to n).map(i => i.toLong -> i.toLong * 10): _*)
    var restorable: Option[(Long, Map[Long, Long])] = None
    (1 to 12).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // keyed replace (updates + inserts)
          val removes = Array.fill(rnd.nextInt(8) + 1)(rnd.nextInt(n * 2).toLong + 1)
          val upserts = removes.take(3).map(k => (k, rnd.nextLong(100000)))
          val all = (removes ++ upserts.map(_._1)).distinct
          PrunedReplace.replaceKeys(spark, dir, "k", all, upserts.toSeq.toDF("k", "v"))
          all.foreach(model.remove)
          upserts.foreach { case (k, v) => model(k) = v }
        case 1 => // append a fresh-key batch
          val base = 10000L * step
          val batch = (0 until rnd.nextInt(5) + 1).map(i => (base + i, base + i))
          TxTable.append(spark, dir, batch.toDF("k", "v"))
          batch.foreach { case (k, v) => model(k) = v }
        case 2 => // vacuum to the newest version only
          TxTable.vacuum(dir, keepLast = 1, orphanRetentionMs = 0L)
          restorable = None // older manifests gone: restore targets die
        case 3 => // mark now, maybe restore a previously marked version
          restorable match {
            case Some((v, snapModel)) if rnd.nextBoolean() =>
              TxTable.restore(spark, dir, v)
              model.clear(); snapModel.foreach { case (k, vv) => model(k) = vv }
              restorable = None
            case _ =>
              restorable = Some((TxTable.snapshot(dir).version, model.toMap))
          }
      }
      val got = rows(dir).toMap
      assert(got == model.toMap,
        s"step $step diverged: extra=${got.keySet -- model.keySet} " +
          s"missing=${model.keySet -- got.keySet} " +
          s"changed=${got.keySet.intersect(model.keySet).filter(k => got(k) != model(k))}")
    }
  }

  test("a commit racing a staged replace surfaces, never silently vanishes") {
    import spark.implicits._
    val dir = tmp()
    seed(dir, 100, 4)
    val st = PrunedReplace.stageReplaceWith(spark, dir, "k", Array(3L))(
      _ => Seq((3L, 33L)).toDF("k", "v"))
    // A writer lands between planning and claim (violating the
    // documented single-writer assumption): the staged commit must
    // throw — retrying would re-claim from the NEW snapshot while its
    // manifest still lists only the planning snapshot's dirs, silently
    // dropping the racer's data.
    TxTable.append(spark, dir, Seq((500L, 5000L)).toDF("k", "v"))
    intercept[TxTable.ConcurrentCommitException] { st.commit() }
    // The racer's append survives; the replace never became visible —
    // and its staged dir was reclaimed on the spot.
    val got = rows(dir).toMap
    assert(got(3L) == 30L && got(500L) == 5000L)
    assert(!Files.isDirectory(
      java.nio.file.Paths.get(TxTable.stagedPath(dir, st.uuid))),
      "losing staged dir must be cleaned up")
  }
}
