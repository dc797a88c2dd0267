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
          TxTable.LocalFsCommitOwner.claim(path, content) // the "other" writer wins
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
