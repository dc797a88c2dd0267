package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The RE-ADMISSION twin of [[DedupErasureRecallSpec]]: extends the
  * r14 erasure-window characterization to histories where erased
  * documents COME BACK (the round-15 collision-fold + residue-strip
  * path), as an exact model backing the `q_dedup_readmit` oracle:
  *
  *   after any interleaving of build / deleteDocsDeferred / re-add /
  *   fresh-delta appends, the served pairs are EXACTLY the pairs a
  *   driver mine over the LIVE corpus produces when each shingle's
  *   document frequency counts every APPENDED INSTANCE — a doc
  *   appended, erased, and re-added contributes its shingles twice
  *   (the un-OPTIMIZEd inverted index keeps the erased instance's df
  *   as the documented-conservative over-count; the residue strip
  *   removes only the stale POSTING, never the count).
  *
  * Instance-counted df can only sit AT or ABOVE the live corpus's df,
  * so as in the erasure window the only losable pairs are those whose
  * every shared shingle is live-rare but instance-hot; precision stays
  * exact (the verify join reads true live content). Auto-compaction is
  * disabled in these histories: the scheduled OPTIMIZE legitimately
  * drops a fully-erased shingle's row (re-deriving membership against
  * the docs ledger), so a later re-add revives it at a LOWER df — a
  * strictly more permissive candidacy the pre-OPTIMIZE model this spec
  * pins does not include (q_dedup_readmit's single-pass lifecycle
  * never hits that window: its re-add lands before any fold runs with
  * the slice still erased).
  */
class DedupReadmitModelSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 3
  private val NoAutoCompact = Int.MaxValue

  private def df(rows: Seq[(Long, Seq[String])]): DataFrame =
    rows.toDF("doc_id", "shs")

  private def tmp(): String =
    Files.createTempDirectory("graft_dedup_readmit").toString

  private def pairSet(d: DataFrame): Set[(Long, Long)] =
    d.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Driver-side reference mine over the LIVE docs with an explicit
    * (instance-counted) df map — the pipeline's definition in plain
    * Scala, independent of the code under test. */
  private def modelPairs(live: Seq[(Long, Seq[String])],
                         dfW: Map[String, Int]): Set[(Long, Long)] = {
    val byDoc = live.map { case (i, s) => i -> s.toSet }.toMap
    val cands = live
      .flatMap { case (i, shs) => shs.filter(g => dfW.getOrElse(g, 0) <= Cap).map(_ -> i) }
      .groupBy(_._1).values.flatMap { xs =>
        val ids = xs.map(_._2).sorted
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
    cands.filter { case (a, b) =>
      val (sa, sb) = (byDoc(a), byDoc(b))
      val c = (sa & sb).size.toDouble
      math.round(c / (sa.size + sb.size - c) * 1e6) / 1e6 >= 0.5
    }
  }

  test("constructed: a re-added pair serves again; its doubled witnesses count twice") {
    //  - 1,2 share {a1,a2} (carriers 1,2): erase 1, re-add 1 → the pair
    //    was physically dropped by the collision fold and must be
    //    RE-MINED — instance df 3 (1's two appends + 2), still rare.
    //  - 5,6 share {w1,b1}, each also carried by one filler (9 / 10):
    //    live df 3 = Cap (rare in a live rebuild), instance df 4 > Cap
    //    after 5's re-add — BOTH witnesses instance-hot, so the model
    //    excludes the pair while a live rebuild would serve it. The
    //    index must agree with the MODEL: the pair was stored at
    //    build, dropped physically at 5's collision fold, and the
    //    re-mine sees both merged groups past the cap.
    val base: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a1", "a2"),
      2L -> Seq("a1", "a2"),
      5L -> Seq("w1", "b1"),
      6L -> Seq("w1", "b1"),
      9L -> Seq("w1", "f1"),
      10L -> Seq("b1", "f2"))
    val dir = tmp()
    DedupIndex.build(spark, df(base), dir, Cap)
    assert(pairSet(DedupIndex.pairs(spark, dir)) == Set((1L, 2L), (5L, 6L)),
      "setup: both pairs mined at build")
    DedupIndex.deleteDocsDeferred(dir, Seq(1L, 5L))
    DedupIndex.append(spark, df(base.filter(d => d._1 == 1L || d._1 == 5L)),
      dir, Cap, autoCompactSegments = NoAutoCompact)
    val dfW = (base ++ base.filter(d => d._1 == 1L || d._1 == 5L))
      .flatMap(_._2).groupBy(identity).map { case (g, xs) => g -> xs.size }
    val expected = modelPairs(base, dfW)
    val liveRebuild = modelPairs(base,
      base.flatMap(_._2).groupBy(identity).map { case (g, xs) => g -> xs.size })
    assert(expected == Set((1L, 2L)) && liveRebuild((5L, 6L)),
      s"model self-check: $expected / $liveRebuild") // the distinguishing shape
    assert(pairSet(DedupIndex.pairs(spark, dir)) == expected,
      "index != instance-df model")
    spark.sharedState.cacheManager.clearCache()
  }

  test("randomized erase/re-add/delta histories match the instance-df model across seeds") {
    for (seed <- Seq(31L, 32L, 33L)) {
      val rnd = new scala.util.Random(seed)
      val hotPool = (1 to 3).map(i => s"hot_$i")
      var id = 0L
      def nextId(): Long = { id += 1; id }
      val clusters = (1 to 10).map { c =>
        ((1 to 4).map(j => s"s${seed}_${c}_$j"),
          (1 to (1 + rnd.nextInt(3))).map(_ => nextId()))
      }
      def mkDoc(): (Long, Seq[String]) = {
        val sig = clusters(rnd.nextInt(clusters.size))._1
        nextId() -> (sig :+ hotPool(rnd.nextInt(hotPool.size)))
      }
      val base = clusters.flatMap { case (sig, ids) =>
        ids.map(i => i -> (sig :+ hotPool(rnd.nextInt(hotPool.size))))
      }
      val dir = tmp()
      DedupIndex.build(spark, df(base), dir, Cap)

      // Tracked truth: content per id (fixed — re-adds restore the same
      // doc), instance-counted df, and the live set.
      val content = scala.collection.mutable.Map.empty[Long, Seq[String]]
      base.foreach { case (i, shs) => content(i) = shs }
      val dfW = scala.collection.mutable.Map.empty[String, Int]
      base.foreach(_._2.foreach(g => dfW(g) = dfW.getOrElse(g, 0) + 1))
      var live = base.map(_._1).toSet
      var erased = Set.empty[Long]

      // 4 rounds: erase a live slice, re-add an erased slice (the
      // collision path), append fresh docs — 5 appends total, under
      // the auto-compaction threshold by construction and explicitly
      // disabled anyway (see scaladoc).
      (1 to 4).foreach { _ =>
        val toErase = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(3))
        if (toErase.nonEmpty) {
          DedupIndex.deleteDocsDeferred(dir, toErase)
          live --= toErase; erased ++= toErase
        }
        val toReadd = rnd.shuffle(erased.toSeq).take(rnd.nextInt(3))
        if (toReadd.nonEmpty) {
          val docs = toReadd.map(i => i -> content(i))
          DedupIndex.append(spark, df(docs), dir, Cap,
            autoCompactSegments = NoAutoCompact)
          docs.foreach(_._2.foreach(g => dfW(g) = dfW.getOrElse(g, 0) + 1))
          live ++= toReadd; erased --= toReadd
        }
        val fresh = (1 to (1 + rnd.nextInt(2))).map(_ => mkDoc())
        DedupIndex.append(spark, df(fresh), dir, Cap,
          autoCompactSegments = NoAutoCompact)
        fresh.foreach { case (i, shs) =>
          content(i) = shs
          shs.foreach(g => dfW(g) = dfW.getOrElse(g, 0) + 1)
          live += i
        }
      }
      val served = pairSet(DedupIndex.pairs(spark, dir))
      val expected = modelPairs(live.toSeq.sorted.map(i => i -> content(i)), dfW.toMap)
      assert(served == expected,
        s"seed=$seed: served != instance-df live mine ($served vs $expected)")
      // Precision never degrades: everything served is in the live
      // rebuild (true-df mine over the live corpus).
      val liveDf = live.toSeq.flatMap(content(_)).groupBy(identity)
        .map { case (g, xs) => g -> xs.size }
      assert(served.subsetOf(modelPairs(live.toSeq.sorted.map(i => i -> content(i)), liveDf)),
        s"seed=$seed: a false pair appeared")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
