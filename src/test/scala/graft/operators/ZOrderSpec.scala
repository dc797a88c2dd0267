package graft.operators

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Z-order as a compaction layout: after a Morton fold, manifest stats
  * prune files on BOTH clustering keys; the (a, b) range sort it
  * replaces prunes only on `a` when the keys are independent. Contents
  * must round-trip exactly — layout maintenance, not a data change.
  */
class ZOrderSpec extends SparkSpec {

  private val N = 64 // 64×64 grid, keys independent by construction

  private def grid(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (0 until N * N).map(i => (i / N.toLong, i % N.toLong, i.toLong))
      .toDF("a", "b", "payload")
      .repartition(4) // arbitrary incoming layout
  }

  private def foldWith(layout: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val df = grid(spark)
    TxTable.init(spark, d, StructType.fromDDL(df.schema.toDDL))
    TxTable.append(spark, d, df)
    val snap = TxTable.snapshot(d)
    TxTable.compactDirs(spark, d, snap, snap.dirs)(layout)
    d
  }

  test("Morton fold prunes files on both keys; range fold only on the first") {
    val caches = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val zDir = foldWith(ZOrder.clusterTracked(16, col("a"), col("b"), caches))
    caches.foreach(_.unpersist(blocking = false))
    val rDir = foldWith(
      _.repartitionByRange(16, col("a"), col("b"))
        .sortWithinPartitions(col("a"), col("b")))

    def files(d: String) = TxTable.dataFiles(d, TxTable.snapshot(d))
    def hits(d: String, k: String, v: Long) =
      TxTable.lookupFiles(d, TxTable.snapshot(d), k, Seq(v)).size

    assert(files(zDir).size == 16 && files(rDir).size == 16)
    // Z layout: every file is a small (a, b) rectangle — both probes
    // skip most files.
    assert(hits(zDir, "a", 5L) < 16, "z fold: a-probe did not prune")
    assert(hits(zDir, "b", 7L) < 16, "z fold: b-probe did not prune")
    // Range layout: a-slabs prune on a, but each slab spans b's whole
    // domain — the b-probe anti-scans every file. This asymmetry is
    // what the Morton layout removes.
    assert(hits(rDir, "a", 5L) < 16, "range fold: a-probe did not prune")
    assert(hits(rDir, "b", 7L) == 16,
      "range fold unexpectedly pruned on b — grid keys should be independent")
    // Layout maintenance only: contents identical across layouts and
    // equal to the input grid.
    def rows(d: String) = TxTable.read(spark, d)
      .orderBy("payload").collect().toSeq.map(_.toSeq)
    assert(rows(zDir) === rows(rDir))
    assert(rows(zDir).size == N * N)
  }

  test("string-keyed z-order: rank space makes the layout type-agnostic") {
    // ntile ranks order ANY comparable column, so z-order works for
    // string keys with no extra machinery — sstats bounds prune the
    // same way manifest long stats do.
    import spark.implicits._
    val df = (0 until N * N)
      .map(i => (f"doc_${i / N}%04d", (i % N).toLong, i.toLong))
      .toDF("doc_id", "sz", "payload")
      .repartition(4)
    val d = java.nio.file.Files.createTempDirectory("graft_zorder_s").toString
    TxTable.init(spark, d, StructType.fromDDL(df.schema.toDDL))
    TxTable.append(spark, d, df)
    val snap0 = TxTable.snapshot(d)
    val caches = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    TxTable.compactDirs(spark, d, snap0, snap0.dirs)(
      ZOrder.clusterTracked(16, col("doc_id"), col("sz"), caches))
    caches.foreach(_.unpersist(blocking = false))
    val snap = TxTable.snapshot(d)
    val all = TxTable.dataFiles(d, snap).size
    assert(all == 16)
    assert(TxTable.lookupStringFiles(d, snap, "doc_id", Seq("doc_0005")).size < all,
      "string-key probe did not prune after the z fold")
    assert(TxTable.lookupFiles(d, snap, "sz", Seq(7L)).size < all,
      "long-key probe did not prune after the z fold")
    assert(TxTable.read(spark, d).count() == (N * N).toLong)
  }

  test("zvalue round-trips: even/odd bit lanes recover both inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (da, db) = (0L, 0L)
      (0 until 32).foreach { i =>
        da |= ((z >> (2 * i)) & 1L) << i
        db |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(da == a && db == b, s"Morton code $z does not round-trip ($a, $b)")
    }
  }

  test("zvalue interleaves rank bits (Morton spot checks)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
        (0xFFFFL, 0L), (0L, 0xFFFFL))
      .toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 1L, 2L, 3L,
      // a=2 (0b10) even bits -> 0b100; b=3 (0b11) odd bits -> 0b1010 -> 14
      14L,
      0x55555555L, 0xAAAAAAAAL))
  }
}
