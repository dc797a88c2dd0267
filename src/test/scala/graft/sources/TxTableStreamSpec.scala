package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming a TxTable's commit log (`format("graft-txtable")`): the
  * Delta-source shape on the engine's own manifest log — snapshot-first
  * delivery, exact increments, commit-count pacing, a persisted `latest`
  * base across restarts, and loud failure on a rewritten range. */
class TxTableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_txstream").toString
  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  private def seeded(): String = {
    val dir = tmp()
    TxTable.init(spark, dir, schema)
    TxTable.overwrite(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    dir
  }

  test("earliest: full snapshot first, then exactly the appended commits") {
    val dir = seeded()
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-txtable").load(dir)
      .writeStream.option("checkpointLocation", tmp())
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0), r.getLong(1))); ()
      }.start()
    q.processAllAvailable()
    assert(got.sorted.toSeq == Seq((1L, 10L), (2L, 20L)), s"snapshot batch: $got")
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v"))
    TxTable.append(spark, dir, Seq((4L, 40L)).toDF("k", "v"))
    q.processAllAvailable()
    q.stop()
    assert(got.sorted.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)),
      s"increments duplicated or lost: $got")
  }

  test("maxCommitsPerTrigger paces batches by commit count") {
    val dir = seeded()
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v"))
    TxTable.append(spark, dir, Seq((4L, 40L)).toDF("k", "v"))
    var batches = 0
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-txtable")
      .option("maxCommitsPerTrigger", "1").load(dir)
      .writeStream.option("checkpointLocation", tmp())
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches += 1; got ++= b.collect().map(_.getLong(0)); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    // 4 real versions (init, seed, 2 appends) → 4 paced batches: the
    // v0 snapshot (empty), the seed commit, then one per append.
    assert(batches == 4, s"pacing off: $batches batches")
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L), s"rows: $got")
  }

  test("paced restart: recovered checkpoint never re-offers a lower offset") {
    // Regression: `offered` resets on restart; with pacing enabled the
    // first post-restart getOffset used to return a target BELOW the
    // recovered offset, which the engine logged as a new batch and
    // asked to read backwards ((4, 1] → crash) — and would otherwise
    // re-deliver commits. A restart with nothing new must deliver
    // nothing; later commits exactly once.
    val dir = seeded()
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v"))
    TxTable.append(spark, dir, Seq((4L, 40L)).toDF("k", "v"))
    val ckpt = tmp()
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-txtable")
        .option("maxCommitsPerTrigger", "1").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.collect().map(_.getLong(0)); ()
        }.start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L), s"first run: $got")
    run() // restart, nothing new: nothing may land (and nothing may crash)
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L), s"restart re-delivered: $got")
    TxTable.append(spark, dir, Seq((5L, 50L)).toDF("k", "v"))
    run()
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"post-restart: $got")
  }

  test("latest: streams only post-start commits; base survives restart") {
    val dir = seeded() // the seed rows must NEVER appear
    val ckpt = tmp()
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-txtable")
        .option("startingVersion", "latest").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.collect().map(_.getLong(0)); ()
        }.start()
      q.processAllAvailable()
      q.stop()
    }
    run() // resolves and persists the base (nothing to deliver yet)
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("k", "v"))
    run()
    // A restart must NOT re-resolve "latest" to now (that would drop
    // commits landed while the query was down).
    TxTable.append(spark, dir, Seq((4L, 40L)).toDF("k", "v"))
    run()
    assert(got.sorted.toSeq == Seq(3L, 4L),
      s"latest-mode delivered wrong rows: $got")
  }

  test("a schema change mid-stream fails loudly with restart guidance") {
    val dir = seeded()
    val q = spark.readStream.format("graft-txtable").load(dir)
      .writeStream.option("checkpointLocation", tmp())
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    q.processAllAvailable()
    // An additive append widens the table; the running query pinned the
    // old schema at start — it must fail restartable, not silently
    // project the new column away.
    TxTable.append(spark, dir, Seq((3L, 30L, "t")).toDF("k", "v", "tag"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(10000)
    }
    assert(e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("schema mid-stream"),
      s"wrong failure: ${e.getCause}")
  }

  test("a rewrite inside the streamed range fails the stream loudly") {
    val dir = seeded()
    val q = spark.readStream.format("graft-txtable").load(dir)
      .writeStream.option("checkpointLocation", tmp())
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    q.processAllAvailable()
    TxTable.overwrite(spark, dir, Seq((9L, 90L)).toDF("k", "v")) // compaction-shaped
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(10000)
    }
    assert(e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("not append-only"),
      s"wrong failure: ${e.getCause}")
  }
}
