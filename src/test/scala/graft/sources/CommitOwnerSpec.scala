package graft.sources

import java.nio.file.{Files, FileAlreadyExistsException, Path}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** The [[TxTable.CommitOwner]] seam: every commit claim — init,
  * append, overwrite, staged commit — must route through the installed
  * owner (an object-store port swaps the primitive, not the format),
  * and the claim loop's two conflict outcomes (dead-claim walk vs real
  * competing commit) must be driven purely by what the owner throws
  * plus the on-disk state, so a conditional-put owner inherits them
  * unchanged.
  */
class CommitOwnerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_owner").toString
  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  /** Run `body` with `owner` installed, always restoring the default. */
  private def withOwner[T](owner: TxTable.CommitOwner)(body: => T): T = {
    val prev = TxTable.setCommitOwner(owner)
    try body finally TxTable.setCommitOwner(prev)
  }

  test("every commit path claims through the installed owner") {
    val claims = new AtomicInteger(0)
    val counting = new TxTable.CommitOwner {
      override def claim(path: Path, content: String): Unit = {
        claims.incrementAndGet()
        TxTable.LocalFsCommitOwner.claim(path, content)
      }
    }
    val dir = tmp()
    withOwner(counting) {
      TxTable.init(spark, dir, schema) // v0
      TxTable.append(spark, dir, Seq((1L, 10L)).toDF("k", "v")) // v1
      TxTable.overwrite(spark, dir, Seq((2L, 20L)).toDF("k", "v")) // v2
      val u = TxTable.stage(dir, Seq((3L, 30L)).toDF("k", "v"))
      TxTable.commitStaged(spark, dir, u, schema, keepExisting = true) // v3
    }
    assert(TxTable.snapshot(dir).version == 3L)
    assert(claims.get() == 4,
      s"expected 4 claims (v0..v3) through the owner, saw ${claims.get()}")
    assert(TxTable.read(spark, dir).count() == 2)
  }

  test("owner-reported conflict on a REAL commit surfaces ConcurrentCommitException") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    // An owner that loses one race: before our first claim, a competing
    // writer lands the SAME version (non-empty manifest), so the
    // delegate throws create-exclusive — exactly what a conditional-put
    // owner reports on a lost race.
    val raced = new AtomicInteger(0)
    val losing = new TxTable.CommitOwner {
      override def claim(path: Path, content: String): Unit = {
        if (raced.getAndIncrement() == 0)
          // The "other" writer wins — with ITS OWN (different) manifest
          // content: byte-identical content would correctly resolve as
          // this writer's own landed claim (the ambiguous-ack path).
          TxTable.LocalFsCommitOwner.claim(path,
            content.replaceFirst("\\{", "{\"competitor\":true,"))
        TxTable.LocalFsCommitOwner.claim(path, content)
      }
    }
    // Pin the planning snapshot (the non-retrying commit): the raced
    // claim must surface as ConcurrentCommitException — retrying
    // wrappers like append() absorb it into a re-plan, which is their
    // contract, not this test's.
    val pinned = TxTable.snapshot(dir)
    withOwner(losing) {
      intercept[TxTable.ConcurrentCommitException] {
        TxTable.commit(spark, dir, Seq((1L, 1L)).toDF("k", "v"),
          pinned, keepExisting = true)
      }
    }
    // The competing commit (the one that won) is the live version.
    assert(TxTable.snapshot(dir).version == 1L)
  }

  test("dead EMPTY claim files are walked past, not treated as competitors") {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    // A crashed pre-link-era writer left an empty claim at the next
    // version: the owner throws create-exclusive, the loop sees size 0
    // and claims the version after it.
    val deadAt = new AtomicInteger(0)
    val overDead = new TxTable.CommitOwner {
      override def claim(path: Path, content: String): Unit = {
        if (deadAt.getAndIncrement() == 0) Files.createFile(path) // dead claim
        TxTable.LocalFsCommitOwner.claim(path, content)
      }
    }
    withOwner(overDead) {
      TxTable.append(spark, dir, Seq((7L, 70L)).toDF("k", "v"))
    }
    assert(TxTable.snapshot(dir).version == 2L,
      "append should have skipped the dead v1 claim and landed at v2")
    assert(TxTable.read(spark, dir).count() == 1)
  }

  test("a conditional-put owner (no link(2)) drives the full lifecycle") {
    // The portability claim made executable: an owner with object-store
    // semantics — an atomic compare-and-set keyed by path, no hard
    // links, no POSIX rename — runs init/append/merge/retention and
    // REAL two-writer contention. If any TxTable path secretly relied
    // on link(2) beyond the seam, this owner would miss it.
    val puts = new java.util.concurrent.ConcurrentHashMap[Path, String]()
    val condPut = new TxTable.CommitOwner {
      override def claim(path: Path, content: String): Unit = {
        // S3 If-None-Match:* / GCS ifGenerationMatch:0 shape: atomic
        // create-if-absent on the store's key space, then the file
        // becomes visible (here: materialized for the reader side,
        // which lists/reads through the ordinary filesystem).
        if (puts.putIfAbsent(path, content) != null)
          throw new FileAlreadyExistsException(path.toString)
        if (Files.exists(path)) { // a dead pre-link-era claim may sit here
          puts.remove(path)
          throw new FileAlreadyExistsException(path.toString)
        }
        val tmp = path.resolveSibling(path.getFileName.toString + ".put")
        Files.writeString(tmp, content)
        Files.move(tmp, path,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    val dir = tmp()
    withOwner(condPut) {
      TxTable.init(spark, dir, schema)
      TxTable.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
      TxTable.merge(spark, dir) { t =>
        t.withColumn("v", org.apache.spark.sql.functions.col("v") + 1L)
      }
      TxTable.deleteKeysDeferred(dir, "k", Seq(2L))
      // Two writers race appends through the conditional put: both must
      // land (the optimistic retry re-claims), exactly once each.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val futures = (0 until 2).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = {
              TxTable.append(spark, dir, Seq((10L + i, 100L)).toDF("k", "v"))
              ()
            }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
    }
    val out = TxTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 11L), (10L, 100L), (11L, 100L)),
      s"conditional-put lifecycle produced $out")
    assert(puts.size >= 5, "claims did not route through the owner")
  }

  test("two OS processes contend on one log: one winner per version, serializable history") {
    // The in-JVM races above share a memory model; the 100 TB
    // mutual-exclusion claim rests on SEPARATE writers. This forks a
    // real second JVM (no Spark needed for metadata commits) and races
    // it against this process: both issue tombstone commits through
    // link(2), the OS-level create-exclusive primitive.
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    val perWriter = 30
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    val child = new ProcessBuilder(
      javaBin, "-cp", sys.props("java.class.path"),
      "graft.sources.CommitRaceChild", dir, "2", perWriter.toString)
      .redirectErrorStream(true).start()
    // Parent writer races the child with its own key prefix.
    (1 to perWriter).foreach { i =>
      TxTable.deleteKeysDeferred(dir, "k", Seq(1000000L + i))
    }
    val out = new String(child.getInputStream.readAllBytes())
    assert(child.waitFor() == 0 && out.contains("child-done"),
      s"child writer failed:\n$out")
    val snap = TxTable.snapshot(dir)
    // No lost update: every key from both writers is in the final mask.
    val want = ((1 to perWriter).map(i => (1000000L + i).toString) ++
      (1 to perWriter).map(i => (2000000L + i).toString)).toSet
    assert(snap.dkeys.getOrElse("k", Nil).toSet == want,
      s"lost tombstones: ${want -- snap.dkeys.getOrElse("k", Nil).toSet}")
    // One winner per version, no torn or duplicated commits: exactly
    // init + one commit per logical write, every manifest readable.
    assert(snap.version == 2L * perWriter,
      s"history has ${snap.version} versions for ${2 * perWriter} writes")
    assert(TxTable.versions(dir).size == 2 * perWriter + 1,
      "dead or torn claim files in a two-process race")
    // Serializable: each version's state is its predecessor plus exactly
    // one key — replayable at every point of the history.
    (1L to snap.version).foreach { v =>
      assert(TxTable.snapshotAt(dir, v).dkeys.getOrElse("k", Nil).size == v,
        s"v$v does not extend v${v - 1} by exactly one tombstone")
    }
  }

  test("eventual visibility: a claim that lands but materializes late never corrupts") {
    // Object-store shape: the conditional put SUCCEEDS in the store's
    // key space immediately, but the file a reader lists/reads appears
    // after a delay. Competing writers that cannot see the in-flight
    // commit must spin on ConcurrentCommitException (liveness) rather
    // than double-claim or clobber (safety).
    val puts = new java.util.concurrent.ConcurrentHashMap[Path, String]()
    val delayed = new TxTable.CommitOwner {
      override def claim(path: Path, content: String): Unit = {
        if (puts.putIfAbsent(path, content) != null)
          throw new FileAlreadyExistsException(path.toString)
        Thread.sleep(20) // visibility lag between claim and listing
        val tmp = path.resolveSibling(path.getFileName.toString + ".put")
        Files.writeString(tmp, content)
        Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    val dir = tmp()
    withOwner(delayed) {
      TxTable.init(spark, dir, schema)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      try {
        val fs = (0 until 3).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit =
              (1 to 5).foreach(j =>
                TxTable.deleteKeysDeferred(dir, "k", Seq(i * 100L + j)))
          })
        }
        fs.foreach(_.get())
      } finally pool.shutdown()
    }
    val snap = TxTable.snapshot(dir)
    assert(snap.dkeys("k").size == 15, s"lost writes: ${snap.dkeys}")
    assert(snap.version == 15L, s"duplicated or dead claims: v${snap.version}")
  }

  test("ambiguous ack: a store that lands the put but reports conflict is our own success") {
    // S3-style at-least-once retry: the put LANDS, the response is
    // lost, the store's retry answers EEXISTS. claimFrom must
    // recognize the published content as its own claim — treating it
    // as a lost race would delete the data directory the now-live
    // manifest references.
    val lieOnce = new AtomicInteger(0)
    val lying = new TxTable.CommitOwner {
      override def claim(path: Path, content: String): Unit = {
        TxTable.LocalFsCommitOwner.claim(path, content)
        if (path.getFileName.toString.endsWith(".commit") &&
            lieOnce.getAndIncrement() == 0)
          throw new FileAlreadyExistsException(path.toString) // lost ack
      }
    }
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    val filesBefore = {
      val st = Files.list(java.nio.file.Paths.get(dir, "data"))
      try st.count() finally st.close()
    }
    withOwner(lying) {
      TxTable.append(spark, dir, Seq((1L, 10L)).toDF("k", "v"))
    }
    // The append landed EXACTLY once, and its data dir survived (the
    // old behavior deleted it on the spurious conflict, leaving a live
    // manifest pointing at vanished files).
    assert(TxTable.snapshot(dir).version == 1L)
    assert(TxTable.read(spark, dir).collect().map(_.getLong(0)).toSeq == Seq(1L),
      "ambiguous ack lost the committed data")
    val filesAfter = {
      val st = Files.list(java.nio.file.Paths.get(dir, "data"))
      try st.count() finally st.close()
    }
    assert(filesAfter == filesBefore + 1)
  }

  test("local owner publishes all-or-nothing: claimed file is complete at first sight") {
    // The contract a swap-in owner must match: after claim() returns the
    // file exists with the full content; a second claim of the same path
    // throws FileAlreadyExistsException and leaves the original intact.
    val root = Files.createTempDirectory("graft_owner_prim")
    val p = root.resolve("v1.commit")
    TxTable.LocalFsCommitOwner.claim(p, "payload-one")
    assert(Files.readString(p) == "payload-one")
    intercept[FileAlreadyExistsException] {
      TxTable.LocalFsCommitOwner.claim(p, "payload-two")
    }
    assert(Files.readString(p) == "payload-one", "lost claim mutated the commit")
    // No temp debris left either way.
    val leftovers = Files.list(root).iterator()
    var names = List.empty[String]
    while (leftovers.hasNext) names ::= leftovers.next().getFileName.toString
    assert(names == List("v1.commit"), s"unexpected files: $names")
  }
}
