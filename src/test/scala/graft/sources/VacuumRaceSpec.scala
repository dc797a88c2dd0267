package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Cross-process MAINTENANCE races. CommitOwnerSpec proves the claim's
  * mutual exclusion across two JVMs; the other half of the multi-writer
  * story is retention racing live work: one process trimming/vacuuming/
  * compacting a log while another appends, tombstones, and reads. The
  * retention-checkpoint retry (`snapshot`/`resolveAt` re-listing after
  * a vanished manifest) was only exercised in-JVM before this spec. */
class VacuumRaceSpec extends SparkSpec {
  import spark.implicits._

  test("one process trims+vacuums+compacts while another appends and reads") {
    val dir = Files.createTempDirectory("graft_vacrace").toString
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    TxTable.init(spark, dir, schema)

    // 70 iterations (was 40): under full-suite session state a parent
    // maintenance round can take whole seconds, and one observed run
    // finished the child before the parent's third round — the
    // "race window never opened" assert below fired as designed. More
    // child work widens the overlap on both sides without weakening
    // any assertion.
    val perChild = 70
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    // Replicate this test JVM's own flags (JDK-17 --add-opens etc.):
    // the child builds a full SparkSession, which needs them.
    import scala.jdk.CollectionConverters._
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
          a.startsWith("-D"))
    val child = new ProcessBuilder(
      (Seq(javaBin) ++ inherited ++ Seq("-Xmx2g", "-cp",
        sys.props("java.class.path"),
        "graft.sources.VacuumRaceChild", dir, perChild.toString)).asJava)
      .redirectErrorStream(true).start()

    // Parent maintenance loop, as long as the child lives: log trim
    // (retires tail manifests under the child's replays), vacuum
    // (replayAll + file reclamation racing the child's commits), a
    // compaction attempt (racing commits surface as
    // ConcurrentCommitException — maintenance skips, never clobbers),
    // and its own snapshot/read (the vanished-manifest retry path).
    // keepLast is comfortably above the child's resolve-to-scan window
    // so a pinned reader never falls outside retention (the documented
    // vacuum limit this spec is NOT about).
    var maintenanceRounds = 0
    var compactions = 0
    while (child.isAlive) {
      TxTable.trimLog(dir, keepLast = 10)
      TxTable.vacuum(dir, keepLast = 10)
      val snap = TxTable.snapshot(dir)
      if (snap.dirs.size > 4) {
        try {
          TxTable.compactDirs(spark, dir, snap,
            TxTable.levelZeroDirs(dir, snap))()
          compactions += 1
        } catch {
          case _: TxTable.ConcurrentCommitException => () // racing child: skip
          case _: IllegalArgumentException => () // fold set emptied under us
        }
      }
      // Parent read through the same churn: resolution must never error
      // (trim's retention checkpoint always lands before drops).
      TxTable.read(spark, dir).count()
      // timestampAsOf resolution while the child commits and vacuums:
      // its mtime walk tolerates manifests either side retires.
      TxTable.versionAtTime(dir, System.currentTimeMillis())
      maintenanceRounds += 1
      Thread.sleep(10) // don't hammer the FS while the child's JVM boots
    }
    val out = new String(child.getInputStream.readAllBytes())
    assert(child.waitFor() == 0 && out.contains("child-done"),
      s"child writer/reader failed under concurrent maintenance:\n$out")
    assert(maintenanceRounds >= 3,
      s"parent only ran $maintenanceRounds maintenance rounds — the race " +
        "window never opened; slow the child or raise its iteration count")

    // Final convergence: exactly the child's surviving keys, no
    // resurrection of its tombstoned ones, no duplicates from any
    // compaction/vacuum interleaving.
    val ks = TxTable.read(spark, dir).select("k").collect()
      .map(_.getLong(0)).toSeq
    val want = (1 to perChild).map(_.toLong).filterNot(_ % 5 == 0)
    assert(ks.sorted == want.sorted,
      s"diverged after maintenance races: missing=${want.diff(ks).take(5)} " +
        s"extra=${ks.diff(want).take(5)}")
    // The log really was trimmed while the child ran (the races were
    // exercised, not skipped): far fewer manifests than the ~84 commits
    // the child issued. A final trim pins the exact bound — the live
    // bound would race the child's last few commits landing after the
    // parent's final maintenance round.
    TxTable.trimLog(dir, keepLast = 10)
    val kept = TxTable.versions(dir).size
    assert(kept <= 10,
      s"trimLog never took effect ($kept manifests kept)")
  }

  test("identity guard CROSS-PROCESS: a table deleted+re-created by another JVM refuses the dead lifetime's checkpoint") {
    // The in-JVM identity-guard spec (TxTableSpec) stages the
    // delete+re-create in the same process; here lifetime B is built by
    // a CHILD JVM while THIS process holds lifetime A's deferred
    // checkpoint in flight — the write must verify the init-stamped
    // `_identity` against what another OS process left at the path.
    val dir = Files.createTempDirectory("graft_identrace").toString + "/t"
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    val gate = new java.util.concurrent.CountDownLatch(1)
    val interval = TxTable.CheckpointInterval
    TxTable.checkpointGateForTest = Some(gate)
    try {
      TxTable.init(spark, dir, schema)
      (1 to interval).foreach(i =>
        TxTable.append(spark, dir, Seq((i.toLong, i.toLong)).toDF("k", "v").coalesce(1)))
      // Lifetime A's periodic checkpoint for v<interval> is queued,
      // held by the gate. The CHILD now kills and re-creates the table,
      // replaying lifetime B to the same version number.
      val javaBin = java.nio.file.Paths
        .get(sys.props("java.home"), "bin", "java").toString
      import scala.jdk.CollectionConverters._
      val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.filter(a =>
          a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
            a.startsWith("-D"))
      val child = new ProcessBuilder(
        (Seq(javaBin) ++ inherited ++ Seq("-Xmx2g", "-cp",
          sys.props("java.class.path"),
          "graft.sources.IdentityRaceChild", dir, interval.toString)).asJava)
        .redirectErrorStream(true).start()
      val out = new String(child.getInputStream.readAllBytes())
      assert(child.waitFor() == 0 && out.contains("reinit-done"),
        s"child re-init failed:\n$out")
      // Release the in-flight write and drain the queue: the identity
      // check (enqueue-time uuid vs the file the child stamped) must
      // refuse to land A's state in B's log.
      TxTable.checkpointGateForTest = None
      gate.countDown()
      TxTable.flushCheckpoints()
      TxTable.clearSnapshotCache() // parent cache still holds lifetime A
      val ks = TxTable.read(spark, dir).select("k").collect()
        .map(_.getLong(0)).toSet
      assert(ks == (1 to interval).map(100L + _).toSet,
        s"cold resolve served a dead lifetime's state: $ks")
      assert(!Files.exists(java.nio.file.Paths
          .get(dir, "_log", f"v${interval.toLong}%016d.checkpoint")),
        "the dead lifetime's deferred checkpoint landed in the new log " +
          "(cross-process identity guard failed)")
    } finally {
      TxTable.checkpointGateForTest = None
      gate.countDown()
    }
  }
}
