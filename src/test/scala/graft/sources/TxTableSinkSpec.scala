package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

/** The exactly-once streaming SINK (`writeStream.format("graft-txtable")`)
  * and the writer-transaction watermarks underneath it: an (appId,
  * batchId) recorded atomically WITH the batch's data turns a
  * crash-replayed micro-batch into a manifest-detected no-op — Delta's
  * SetTransaction/idempotent-sink mechanism on the engine's own log. */
class TxTableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_txsink").toString
  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  private def init(): String = {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    dir
  }

  test("appendIfNew: replayed batch is a no-op, newer batch lands") {
    val dir = init()
    val (s1, a1) = TxTable.appendIfNew(spark, dir,
      Seq((1L, 10L)).toDF("k", "v"), "writer", 0L)
    assert(a1 && s1.txns == Map("writer" -> 0L))
    // Same batch replayed (crash between commit and checkpoint): no-op.
    val (s2, a2) = TxTable.appendIfNew(spark, dir,
      Seq((1L, 10L)).toDF("k", "v"), "writer", 0L)
    assert(!a2 && s2.version == s1.version)
    // An OLDER batch id (late replay) is also refused.
    val (_, a3) = TxTable.appendIfNew(spark, dir,
      Seq((9L, 90L)).toDF("k", "v"), "writer", -1L)
    assert(!a3)
    val (s4, a4) = TxTable.appendIfNew(spark, dir,
      Seq((2L, 20L)).toDF("k", "v"), "writer", 1L)
    assert(a4 && s4.txns("writer") == 1L)
    assert(TxTable.read(spark, dir).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
  }

  test("mergeIfNew: replayed batch is a no-op, newer batch folds once") {
    val s = spark
    import s.implicits._
    val dir = init()
    TxTable.overwrite(spark, dir, Seq((1L, 10L)).toDF("k", "v"))
    def fold(add: Long, batchId: Long) =
      TxTable.mergeIfNew(spark, dir, "folder", batchId) { cur =>
        cur.union(Seq((1L, add)).toDF("k", "v"))
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("v"))
      }
    assert(fold(5L, 0L)._2, "first batch refused")
    assert(!fold(5L, 0L)._2, "replayed batch re-applied") // crash-replay shape
    assert(fold(7L, 1L)._2)
    assert(!fold(7L, 0L)._2, "older batch re-applied")
    val v = TxTable.read(spark, dir).collect().map(_.getLong(1)).toSeq
    assert(v == Seq(22L), s"double-applied merge: $v") // 10+5+7, each once
  }

  test("watermarks are per-writer and survive unrelated commits") {
    val dir = init()
    TxTable.appendIfNew(spark, dir, Seq((1L, 10L)).toDF("k", "v"), "a", 5L)
    // A different writer's batch 5 is NOT deduped by writer a's watermark.
    val (_, applied) = TxTable.appendIfNew(spark, dir,
      Seq((2L, 20L)).toDF("k", "v"), "b", 5L)
    assert(applied)
    // Plain appends / merges / staged commits carry the registry forward.
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v"))
    TxTable.merge(spark, dir)(df => df)
    val u = TxTable.stage(dir, Seq((4L, 40L)).toDF("k", "v"))
    TxTable.commitStaged(spark, dir, u, schema, keepExisting = true)
    assert(TxTable.txnVersion(dir, "a").contains(5L))
    assert(TxTable.txnVersion(dir, "b").contains(5L))
    assert(TxTable.txnVersion(dir, "absent").isEmpty)
  }

  test("restore rolls the watermark back with the data") {
    val dir = init()
    val (before, _) = TxTable.appendIfNew(spark, dir,
      Seq((1L, 10L)).toDF("k", "v"), "w", 0L)
    TxTable.appendIfNew(spark, dir, Seq((2L, 20L)).toDF("k", "v"), "w", 1L)
    TxTable.restore(spark, dir, before.version) // batch 1's rows are gone
    assert(TxTable.txnVersion(dir, "w").contains(0L),
      "watermark must follow the restored state or the replay below is lost")
    val (_, applied) = TxTable.appendIfNew(spark, dir,
      Seq((2L, 20L)).toDF("k", "v"), "w", 1L)
    assert(applied, "post-restore replay of the removed batch must land")
    assert(TxTable.read(spark, dir).count() == 2)
  }

  test("racing idempotent writers: distinct appIds all land, a duplicated appId lands once") {
    val dir = init()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      // Four writers race their first batch: the optimistic retry loop
      // serializes the claims, every watermark lands.
      val distinct = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until 4).map { i =>
          scala.concurrent.Future(TxTable.appendIfNew(spark, dir,
            Seq((i.toLong, i.toLong)).toDF("k", "v"), s"w$i", 0L))
        }),
        scala.concurrent.duration.Duration(120, "s"))
      assert(distinct.forall(_._2))
      assert(TxTable.read(spark, dir).count() == 4)
      (0 until 4).foreach(i =>
        assert(TxTable.txnVersion(dir, s"w$i").contains(0L)))
      // The SAME (appId, batchId) raced from two threads — a zombie
      // retry racing its own replacement: exactly one commit may land
      // (the loser's retry re-reads the manifest and sees the
      // watermark).
      val dupes = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until 2).map { _ =>
          scala.concurrent.Future(TxTable.appendIfNew(spark, dir,
            Seq((99L, 99L)).toDF("k", "v"), "zombie", 0L))
        }),
        scala.concurrent.duration.Duration(120, "s"))
      assert(dupes.count(_._2) == 1,
        s"exactly one of the racing duplicates may apply: $dupes")
      assert(TxTable.read(spark, dir).filter("k = 99").count() == 1)
    } finally pool.shutdown()
  }

  test("sink end-to-end: append mode, auto-init, restart without duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp() + "/sunk" // does not exist: first batch inits it
    val ckpt = tmp()
    val mem = MemoryStream[(Long, Long)]
    def run(): Unit = {
      val q = mem.toDF().toDF("k", "v").writeStream
        .format("graft-txtable")
        .option("checkpointLocation", ckpt)
        .start(dir)
      q.processAllAvailable()
      q.stop()
    }
    mem.addData((1L, 10L), (2L, 20L))
    run()
    assert(TxTable.read(spark, dir).count() == 2)
    mem.addData((3L, 30L))
    run() // restart from the same checkpoint: only the new batch lands
    val got = TxTable.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"restart duplicated or lost rows: $got")
  }

  test("sink log retention: a long batch stream keeps _log bounded, data intact") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp() + "/sunk"
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .format("graft-txtable")
      .option("checkpointLocation", tmp())
      .option("logRetainCommits", "5")
      .start(dir)
    (1L to 12L).foreach { i => mem.addData((i, i * 10)); q.processAllAvailable() }
    q.stop()
    // One commit per batch (+init), trimmed to the newest 5 as it ran.
    assert(TxTable.versions(dir).size <= 5,
      s"log not trimmed: ${TxTable.versions(dir).size} manifests")
    // Trimming is log-only: every batch's rows are still in the table.
    assert(TxTable.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 12L), "trim lost data")
  }

  test("sink replay guard: same txnAppId refuses an already-landed batch id") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = init()
    def runOnce(data: (Long, Long)): Unit = {
      // A FRESH checkpoint each run restarts batch ids at 0 — exactly
      // the shape of a replayed batch from the table's point of view.
      val mem = MemoryStream[(Long, Long)]
      mem.addData(data)
      val q = mem.toDF().toDF("k", "v").writeStream
        .format("graft-txtable")
        .option("txnAppId", "pinned-writer")
        .option("checkpointLocation", tmp())
        .start(dir)
      q.processAllAvailable()
      q.stop()
    }
    runOnce((1L, 10L))
    runOnce((2L, 20L)) // same appId, batch 0 again → watermark refuses it
    val got = TxTable.read(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"replayed batch id must not land twice: $got")
  }

  test("sink complete mode: each batch replaces the table") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp() + "/agg"
    val mem = MemoryStream[(String, Long)]
    val counts = mem.toDF().toDF("key", "n")
      .groupBy($"key").count()
    val q = counts.writeStream
      .format("graft-txtable")
      .outputMode("complete")
      .option("checkpointLocation", tmp())
      .start(dir)
    mem.addData(("x", 1L), ("x", 2L), ("y", 3L))
    q.processAllAvailable()
    mem.addData(("x", 4L))
    q.processAllAvailable()
    q.stop()
    val got = TxTable.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq(("x", 3L), ("y", 1L)),
      s"complete mode must hold ONLY the latest aggregate state: $got")
  }

  test("sink rejects update mode and partitionBy") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("k", "v")
    val e1 = intercept[Exception] {
      df.groupBy($"k").count().writeStream.format("graft-txtable")
        .outputMode("update").option("checkpointLocation", tmp())
        .start(tmp() + "/u")
    }
    assert(e1.getMessage.contains("Append and Complete"))
    val e2 = intercept[Exception] {
      df.writeStream.format("graft-txtable").partitionBy("k")
        .option("checkpointLocation", tmp()).start(tmp() + "/p")
    }
    assert(e2.getMessage.contains("not hive-partitioned"))
  }

  test("table-to-table: graft-txtable source through graft-txtable sink") {
    val silver = init()
    val gold = tmp() + "/gold"
    TxTable.append(spark, silver, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val q = spark.readStream.format("graft-txtable").load(silver)
      .selectExpr("k", "v * 2 AS v2")
      .writeStream.format("graft-txtable")
      .option("checkpointLocation", tmp())
      .start(gold)
    q.processAllAvailable()
    TxTable.append(spark, silver, Seq((3L, 30L)).toDF("k", "v"))
    q.processAllAvailable()
    q.stop()
    val got = TxTable.read(spark, gold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 20L), (2L, 40L), (3L, 60L)),
      s"log-to-log pipeline diverged: $got")
  }
}
