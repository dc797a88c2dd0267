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
